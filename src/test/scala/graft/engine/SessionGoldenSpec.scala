package graft.engine

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.file.{Files, Paths}
import scala.util.control.NonFatal

/** Byte-pinned SESSION transcripts (round-8 verdict item 6): the
  * codec-level `bson_golden.jsonl` pins single documents; this pins a
  * WHOLE scripted client↔server session — every request frame the
  * client emits and every response frame the server answers, in order,
  * as hex — so the Go client's framing is verifiable against real
  * server bytes wherever a toolchain exists, without ever needing one
  * in this container.
  *
  * Three parties share the transcript:
  *  - [[SessionGoldenGen]] records it from the REAL production path —
  *    [[NetClient]] (BSON mode) through a frame-splitting proxy into a
  *    live [[GraftServer]] on a fresh engine — and writes
  *    `bindings/go/session_golden.jsonl`;
  *  - [[SessionGoldenSpec]] re-records the same script on every sbt
  *    run and asserts both directions byte-match the committed file
  *    (Scala client framing AND server responses cannot drift
  *    silently);
  *  - `bindings/go/session_golden_test.go` replays the server side of
  *    the file against the Go client (its canonical sorted-key frames
  *    must equal the recorded NetClient requests byte-for-byte, and it
  *    must decode the recorded responses into the right values).
  *
  * Determinism contract (why this CAN be byte-pinned): tickets count
  * from 1 per connection; prepared ids are per-connection list indices
  * (Server.scala `prepared`), so a fresh engine + fresh connection
  * replays identically; [[Bson.encode]] writes document keys in
  * CANONICAL SORTED ORDER (round-11 verdict item 5 — previously only
  * the ≤4-key forms were deterministic via Map1..Map4 insertion
  * order, which kept the 5-key chunked form out of the script; now
  * the chunked "5"-protocol frames pin too, both the 5-key request
  * and the multi-frame streamed response); BSON doubles/longs are
  * bit-exact; no login, so no server randomness; idleTimeoutMs=0, so
  * no heartbeat frames interleave. The TVF steps (t9-t12) pin the
  * newer wire surface: a table-function call with server-side WHERE +
  * projection, prepared and placeholder-bound.
  */
object SessionGolden {
  val GoldenPath = "bindings/go/session_golden.jsonl"

  /** One frame-splitting pump: reads LE-length frames from `in`,
    * records each body, forwards it unchanged.
    */
  private def pump(in: DataInputStream, out: DataOutputStream,
      dir: String, record: (String, Array[Byte]) => Unit): Thread = {
    val t = new Thread(() => {
      try {
        while (true) {
          val body = Wire.readFrame(in)
          record(dir, body)
          Wire.writeFrame(out, body)
        }
      } catch { case NonFatal(_) => () /* session closed */ }
    }, s"session-golden-pump-$dir")
    t.setDaemon(true)
    t.start()
    t
  }

  /** Runs the scripted session through proxy → server and returns the
    * ordered (dir, bodyHex) transcript plus the select's rows.
    */
  def recordSession(): (Seq[(String, String)], Seq[Seq[Any]]) = {
    val spark = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-session-golden").toString
    val engine = new Engine(spark, wh)
    val server = new GraftServer(engine, port = 0)
    val listener = new ServerSocket(0)
    val transcript = scala.collection.mutable.Buffer[(String, String)]()
    def record(dir: String, body: Array[Byte]): Unit =
      transcript.synchronized {
        transcript += dir -> body.map(b => f"$b%02x").mkString
      }
    val acceptor = new Thread(() => {
      try {
        val cli = listener.accept()
        cli.setTcpNoDelay(true)
        val srv = new Socket("127.0.0.1", server.boundPort)
        srv.setTcpNoDelay(true)
        pump(new DataInputStream(cli.getInputStream),
          new DataOutputStream(srv.getOutputStream), "c2s", record)
        pump(new DataInputStream(srv.getInputStream),
          new DataOutputStream(cli.getOutputStream), "s2c", record)
      } catch { case NonFatal(_) => () }
    }, "session-golden-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    val client = new NetClient("127.0.0.1", listener.getLocalPort,
      protocol = "bson")
    try {
      val rows = script(client)
      (transcript.synchronized(transcript.toSeq), rows)
    } finally {
      client.close()
      server.stop()
      try listener.close() catch { case NonFatal(_) => }
    }
  }

  /** The scripted session — MUST stay in lockstep with the Go replay
    * (`session_golden_test.go` runs the same calls in the same order,
    * so tickets and prepared ids line up frame-for-frame).
    */
  def script(c: NetClient): Seq[Seq[Any]] = {
    c.execute("create database gold")                              // t1
    c.use("gold")                                                  // t2
    c.execute("create table gold.t(sec int, tm timestamp, " +
      "px double, note text, primary key(sec, tm))")               // t3
    val pid = c.prepare("insert into gold.t values(?, ?, ?, ?)")   // t4
    c.batchInsert(pid, Seq(                                        // t5
      Seq(1, java.time.Instant.ofEpochSecond(10L, 500L), 2.5, "b"),
      Seq(1, java.time.Instant.ofEpochSecond(20L, 0L), 3.5, "c"),
      Seq(2, java.time.Instant.ofEpochSecond(10L, 0L), 9.0, "d")))
    val rows = c.execute("select * from gold.t where sec=?", Seq(1)) // t6
    c.listTables()                                                 // t7
    c.schema("t") // unqualified: the used db scopes it            // t8
    // TVF surface: create a docs table, call a table function with
    // server-side WHERE + projection, prepared + placeholder-bound
    c.execute("create table gold.docs(id int, txt text, " +
      "primary key(id))")                                          // t9
    val dpid = c.prepare("insert into gold.docs values(?, ?)")     // t10
    c.batchInsert(dpid, Seq(                                       // t11
      Seq(1, (1 to 20).map(i => s"w$i").mkString(" ")),
      Seq(2, (1 to 20).map(i => s"w$i").mkString(" ") + " wx"),
      Seq(3, "alpha beta gamma delta epsilon zeta eta theta")))
    val comp = c.execute("select id from dedup_components" +
      "('gold.docs', 'id', 'txt', ?) where comp = 1",
      Seq(0.5))                                                    // t12
    require(comp == Seq(Seq(1), Seq(2)),
      s"TVF select drifted: $comp")
    // chunked "5"-protocol: 5-key request doc (canonical key order)
    // + the streamed multi-frame response, 3 rows in 2-row chunks
    val chunked = c.executeChunked("select * from gold.t where sec>=?",
      Seq(1), chunkRows = 2)                                       // t13
    require(chunked.length == 3,
      s"chunked select drifted: $chunked")
    rows
  }

  def readGolden(): Seq[(String, String)] = {
    val txt = new String(Files.readAllBytes(Paths.get(GoldenPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    txt.linesIterator.filter(_.trim.nonEmpty).map { line =>
      val dir = """"dir":"([a-z0-9]+)"""".r
        .findFirstMatchIn(line).get.group(1)
      val hex = """"hex":"([0-9a-f]*)"""".r
        .findFirstMatchIn(line).get.group(1)
      dir -> hex
    }.toSeq
  }
}

/** Generator: record the session and write the golden file directly
  * (the BsonGoldenGen discipline — never via stdout redirection).
  * Regenerate with:
  *   sbt "Test/runMain graft.engine.SessionGoldenGen"
  */
object SessionGoldenGen {
  def main(args: Array[String]): Unit = {
    val (transcript, rows) = SessionGolden.recordSession()
    require(rows.length == 2, s"script select returned ${rows.length} rows")
    val lines = transcript.zipWithIndex.map { case ((dir, hex), i) =>
      s"""{"seq":$i,"dir":"$dir","hex":"$hex"}"""
    }
    Files.writeString(Paths.get(SessionGolden.GoldenPath),
      lines.mkString("", "\n", "\n"))
    println(s"[session-golden] wrote ${lines.length} frames to " +
      SessionGolden.GoldenPath)
  }
}

/** Every sbt run re-records the scripted session through the REAL
  * client, proxy and server and holds both directions to the committed
  * bytes — the Scala half of the cross-SDK session pinning.
  */
class SessionGoldenSpec extends AnyFunSuite {
  test("scripted session replays the committed transcript byte-for-byte") {
    val want = SessionGolden.readGolden()
    assert(want.nonEmpty, "golden transcript missing or empty")
    val (got, rows) = SessionGolden.recordSession()
    // the script's observable result stays pinned too
    assert(rows == Seq(
      Seq(1, java.time.Instant.ofEpochSecond(10L, 500L), 2.5, "b"),
      Seq(1, java.time.Instant.ofEpochSecond(20L, 0L), 3.5, "c")))
    assert(got.length == want.length,
      s"frame count drifted: got ${got.length}, want ${want.length}\n" +
        s"got:  $got\nwant: $want")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"frame $i drifted: got $g want $w")
    }
  }
}
