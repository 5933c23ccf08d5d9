package graft.engine

/** Generator for the cross-codec BSON golden frames
  * (`bindings/go/graftclient/`-shared `bson_golden.jsonl`): one fixture
  * per element type the wire uses, each committed as the EXACT bytes
  * `engine/Bson.scala` emits. [[BsonSpec]] pins the Scala codec to these
  * frames on every sbt run; `bindings/go/bson_golden_test.go` pins the
  * Go codec to the same file whenever a Go toolchain exists (round-7
  * verdict item 6: the Go codec needs executable verification that
  * doesn't wait for a toolchain to appear in the test container).
  *
  * Multi-key fixtures use ≤ 4 keys on purpose: Scala's Map1..Map4
  * preserve insertion order, so the Scala-emitted frame is
  * deterministic. (Go map iteration is randomized, so the Go side
  * re-encodes only the single-key fixtures byte-exactly and checks
  * multi-key fixtures by decode + canonical re-encode roundtrip.)
  *
  * Regenerate with:
  *   sbt "Test/runMain graft.engine.BsonGoldenGen"
  * — the generator writes `bindings/go/bson_golden.jsonl` DIRECTLY
  * (stdout redirection would capture sbt's [info]/[success] log lines
  * into the golden file and corrupt it, caught only later when
  * BsonSpec fails to parse).
  */
object BsonGoldenGen {
  /** name → document; the shared truth both codecs must reproduce. */
  val fixtures: Seq[(String, Map[String, Any])] = Seq(
    "spec_hello" -> Map("hello" -> "world"),
    "utf8_string" -> Map("s" -> "naïve ✓"),
    "i32_min" -> Map("i" -> Int.MinValue),
    "i32_plain" -> Map("k" -> 1986),
    "i64_max" -> Map("l" -> Long.MaxValue),
    "i64_neg" -> Map("l" -> -5000000000L),
    "dbl_neg_half" -> Map("d" -> -0.5),
    "dbl_pi" -> Map("d" -> 3.141592653589793),
    "bool_true" -> Map("b" -> true),
    "bool_false" -> Map("b" -> false),
    "null_elem" -> Map("n" -> null),
    "arr_mixed" -> Map("a" ->
      Seq[Any](1, 2.5, "x", true, null, Long.MaxValue)),
    "ts_pair" -> Map("t" -> Seq[Any](7L, 123L)),
    "subdoc" -> Map("m" -> Map[String, Any]("k" -> Seq[Any](1, 2))),
    "empty_doc" -> Map.empty[String, Any],
    // a real wire frame shape: cmd-id, op, sql, args (4 keys = Map4,
    // insertion-ordered in Scala)
    "wire_insert" -> Map[String, Any]("0" -> 5, "1" -> "run",
      "2" -> "insert into t values(?, ?)", "3" -> Seq[Any](42, "x")))

  def hex(bytes: Array[Byte]): String = bytes.map(b => f"$b%02x").mkString

  def main(args: Array[String]): Unit = {
    val lines = fixtures.map { case (name, doc) =>
      s"""{"name":"$name","hex":"${hex(Bson.encode(doc))}"}"""
    }
    val out = java.nio.file.Paths.get("bindings/go/bson_golden.jsonl")
    java.nio.file.Files.writeString(out,
      lines.mkString("", "\n", "\n"))
    println(s"[bson-golden] wrote ${lines.length} frames to $out")
  }
}
