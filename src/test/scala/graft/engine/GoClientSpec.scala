package graft.engine

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets

/** Cross-language wire conformance #3: the stdlib-only Go client
  * (bindings/go/graftclient.go, mirroring the reference
  * client/opentick.go API shape) is built with the system Go
  * toolchain and driven as a subprocess against a live
  * [[GraftServer]] — DDL, prepared batch insert with ns timestamps,
  * selects, SplitRange scatter-gather, chunked SELECT streaming, meta
  * commands, error strings, and idle heartbeat servicing — once per
  * wire codec: BSON (the reference default, via the stdlib-only codec
  * in bindings/go/bson.go) and the negotiated JSON mode. Cancels
  * (does not fail) on machines without `go`, like [[CppClientSpec]]
  * does without g++.
  */
class GoClientSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def goBin: Option[String] =
    (Seq("/usr/bin/go", "/usr/local/bin/go", "/usr/local/go/bin/go") ++
      sys.env.get("GOROOT").map(_ + "/bin/go"))
      .find(p => Files.isExecutable(Paths.get(p)))

  private val driver =
    """package main
      |
      |import (
      |	"fmt"
      |	"os"
      |	"strconv"
      |	"time"
      |
      |	"graftdriver/graftclient"
      |)
      |
      |func die(err error) {
      |	if err != nil {
      |		fmt.Println("FATAL=" + err.Error())
      |		os.Exit(1)
      |	}
      |}
      |
      |func main() {
      |	port, _ := strconv.Atoi(os.Args[2])
      |	c, err := graftclient.ConnectProto(os.Args[1], port, "", os.Args[3])
      |	die(err)
      |	_, err = c.Execute("create database godb")
      |	die(err)
      |	die(c.Use("godb"))
      |	_, err = c.Execute("create table godb.t(sec int, tm timestamp," +
      |		" px double, note text, primary key(sec, tm))")
      |	die(err)
      |	die(c.BatchInsert("insert into godb.t values(?, ?, ?, ?)",
      |		[][]interface{}{
      |			{int64(1), [2]int64{7, 123}, 1.5, "a"},
      |			{int64(1), time.Unix(7, 456000).UTC(), 2.5, "b"},
      |			{int64(2), [2]int64{9, 0}, 9.0, "c"},
      |		}))
      |	rows, err := c.Execute("select * from godb.t where sec=1")
      |	die(err)
      |	fmt.Printf("N1=%d\n", len(rows))
      |	px, err := c.Execute("select px from godb.t where sec=1 and tm=?",
      |		[2]int64{7, 123})
      |	die(err)
      |	fmt.Printf("PX=%v\n", px[0][0])
      |	tm, err := c.Execute("select tm, note from godb.t where sec=1")
      |	die(err)
      |	for _, r := range tm {
      |		t := r[0].(time.Time)
      |		fmt.Printf("TM=%d.%d:%v\n", t.Unix(), t.Nanosecond(), r[1])
      |	}
      |	dbs, err := c.ListDatabases()
      |	die(err)
      |	has := false
      |	for _, db := range dbs {
      |		has = has || db == "godb"
      |	}
      |	fmt.Printf("HASDB=%v\n", has)
      |	sch, err := c.Schema("t")
      |	die(err)
      |	fmt.Print("KEYS=")
      |	for _, k := range sch.Keys {
      |		fmt.Printf("%s,%s;", k[0], k[1])
      |	}
      |	fmt.Println()
      |	if _, err := c.Execute("select * from godb.nope"); err != nil {
      |		fmt.Println("ERR=" + err.Error())
      |	} else {
      |		fmt.Println("NO-ERROR")
      |	}
      |	// idle past the server heartbeat interval: queued 'H' probes must
      |	// be consumed and acked before the next reply
      |	time.Sleep(700 * time.Millisecond)
      |	n2, err := c.Execute("select * from godb.t where sec=2")
      |	die(err)
      |	fmt.Printf("N2=%d\n", len(n2))
      |	// scatter-gather over SplitRange with junction dedup
      |	_, err = c.Execute("create table godb.r(k int, v double," +
      |		" primary key(k))")
      |	die(err)
      |	var batch [][]interface{}
      |	for i := 0; i < 12; i++ {
      |		batch = append(batch, []interface{}{int64(i), float64(i) * 0.5})
      |	}
      |	die(c.BatchInsert("insert into godb.r values(?, ?)", batch))
      |	parts := graftclient.SplitRange(0, 11, 3)
      |	merged, err := c.ExecuteRanges(
      |		"select k from godb.r where k>=? and k<=?", parts)
      |	die(err)
      |	fmt.Printf("RANGES=%d:%v..%v\n", len(merged), merged[0][0],
      |		merged[len(merged)-1][0])
      |	// chunked SELECT: 12 rows in 5-row frames reassemble in order
      |	ch, err := c.ExecuteChunked(
      |		"select k from godb.r where k>=? and k<=?",
      |		[]interface{}{int64(0), int64(11)}, 5)
      |	die(err)
      |	fmt.Printf("CHUNK=%d:%v..%v\n", len(ch), ch[0][0], ch[len(ch)-1][0])
      |	fmt.Println("DONE")
      |}
      |""".stripMargin

  private def roundTrip(protocol: String): Unit = {
    assume(goBin.nonEmpty, "go toolchain not installed on this machine")
    val wh = Files.createTempDirectory("graft-go-wh").toString
    val engine = new Engine(spark, wh)
    val server = new GraftServer(engine, port = 0, idleTimeoutMs = 200)
    val dir = Files.createTempDirectory("graft-go")
    try {
      Files.writeString(dir.resolve("go.mod"),
        "module graftdriver\n\ngo 1.21\n")
      Files.writeString(dir.resolve("main.go"), driver)
      val pkg = Files.createDirectory(dir.resolve("graftclient"))
      Files.copy(
        Paths.get("bindings/go/graftclient.go").toAbsolutePath,
        pkg.resolve("graftclient.go"))
      Files.copy(
        Paths.get("bindings/go/bson.go").toAbsolutePath,
        pkg.resolve("bson.go"))
      val out = runGo(dir, goBin.get, "127.0.0.1",
        server.boundPort.toString, protocol)
      val lines = out.linesIterator.toSeq
      assert(lines.contains("N1=2"), out)
      assert(lines.contains("PX=1.5"), out)
      assert(lines.contains("TM=7.123:a"), out)
      assert(lines.contains("TM=7.456000:b"), out)
      assert(lines.contains("HASDB=true"), out)
      assert(lines.contains("KEYS=sec,Int;tm,Timestamp;"), out)
      assert(lines.exists(_.startsWith("ERR=")), out)
      assert(!lines.contains("NO-ERROR"), out)
      assert(lines.contains("N2=1"), out)
      assert(lines.contains("RANGES=12:0..11"), out)
      assert(lines.contains("CHUNK=12:0..11"), out)
      assert(lines.contains("DONE"), out)
    } finally {
      server.stop()
    }
  }

  test("Go client round-trips DDL, batch insert, ns timestamps, ranges, chunks (bson — the reference default)") {
    roundTrip("bson")
  }

  test("Go BSON codec passes the committed cross-codec golden frames") {
    // the same bson_golden.jsonl that BsonSpec pins the Scala codec to
    // on every sbt run (so the frames are always verified on at least
    // one side); with a toolchain present, `go test` holds the Go codec
    // to the identical bytes
    assume(goBin.nonEmpty, "go toolchain not installed on this machine")
    val dir = Files.createTempDirectory("graft-go-golden")
    Files.writeString(dir.resolve("go.mod"),
      "module graftclient\n\ngo 1.21\n")
    Seq("graftclient.go", "bson.go", "bson_golden_test.go",
        "bson_golden.jsonl").foreach { f =>
      Files.copy(Paths.get(s"bindings/go/$f").toAbsolutePath,
        dir.resolve(f))
    }
    val pb = new ProcessBuilder(goBin.get, "test", ".")
    pb.directory(dir.toFile).redirectErrorStream(true)
    pb.environment().put("GOFLAGS", "-mod=mod")
    pb.environment().put("GOPROXY", "off")
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      StandardCharsets.UTF_8)
    assert(p.waitFor() == 0, s"go test failed:\n$out")
  }

  test("Go client round-trips the same surface in the negotiated json mode") {
    roundTrip("json")
  }

  private def runGo(dir: Path, go: String, args: String*): String = {
    val pb = new ProcessBuilder((Seq(go, "run", ".") ++ args): _*)
    pb.directory(dir.toFile).redirectErrorStream(true)
    // hermetic offline build: stdlib only, no module downloads
    pb.environment().put("GOFLAGS", "-mod=mod")
    pb.environment().put("GOPROXY", "off")
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      StandardCharsets.UTF_8)
    assert(p.waitFor() == 0, s"go run failed:\n$out")
    out
  }
}
