package graft.engine

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.time.Instant
import java.nio.file.Files

/** SplitRange goldens from reference server_test.go:12-31 and the
  * response-cache staleness semantics from server_test.go:161-183.
  */
class ClientSpec extends AnyFunSuite {
  test("splitRange int goldens (server_test.go:21-25)") {
    val c2 = Client.splitRange(100L, 1000L, 11)
    assert(c2(10)._1 == 100 + (1000 - 100) / 11 * 10)
    assert(c2(0)._2 == 100 + (1000 - 100) / 11)
    assert(c2(5)._1 == 100 + (1000 - 100) / 11 * 5)
    assert(c2(5)._2 == 100 + (1000 - 100) / 11 * 6)
    assert(c2(10)._2 == 1000) // last part absorbs the remainder
  }

  test("splitRange double goldens (server_test.go:26-30)") {
    val c3 = Client.splitRange(100.0, 1000.0, 11)
    assert(c3(10)._1 == 100.0 + (1000.0 - 100.0) / 11 * 10)
    assert(c3(0)._2 == 100.0 + (1000.0 - 100.0) / 11)
    assert(c3(5)._1 == 100.0 + (1000.0 - 100.0) / 11 * 5)
    assert(c3(5)._2 == 100.0 + (1000.0 - 100.0) / 11 * 6)
  }

  test("splitRange time goldens (server_test.go:13-20)") {
    val a = Instant.parse("1984-11-03T13:00:00Z")
    val b = Instant.parse("2018-11-10T18:00:00.000000001Z")
    val c = Client.splitRange(a, b, 10)
    val d = java.time.Duration.between(a, b).toNanos / 10
    assert(c(0)._1 == a)
    assert(c(0)._2 == a.plusNanos(d))
    assert(c(9)._1 == a.plusNanos(d * 9))
    assert(c(9)._2 == b)
  }

  test("scatter-gather ranges merge + boundary dedup == single scan") {
    val spark = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-cl-wh").toString
    val e = new Engine(spark, wh)
    e.execute("create database cl")
    e.execute("create table cl.t(sec int, tm timestamp, v double, primary key(sec, tm))")
    e.batchInsert("insert into cl.t values(?, ?, ?)",
      (0 until 200).map(i => Seq[Any](1, i.toLong, i * 0.5)))
    val single = e.execute(
      "select * from cl.t where sec=1 and tm>=? and tm<=?",
      Seq(0L, 199L)).collect().toSet
    val parts = Client.splitRange(0L, 199L, 7)
    val merged = Client.executeRanges(e,
      "select * from cl.t where sec=1 and tm>=? and tm<=?",
      parts.map { case (lo, hi) => (lo: Any, hi: Any) }).collect().toSet
    assert(merged == single)
  }

  test("response cache: hit within TTL, stale tolerated (server_test.go:161-183)") {
    val spark = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-rc-wh").toString
    val e = new Engine(spark, wh)
    e.execute("create database rc")
    e.execute("create table rc.t(a int, v double, primary key(a))")
    e.execute("insert into rc.t values(1, 1.5)")
    val r1 = e.executeCached("select * from rc.t where a=1", ttlMs = 60000)
    assert(r1.collect().head.getDouble(1) == 1.5)
    // mutate under the cache: stale read within TTL is accepted behavior
    e.execute("insert into rc.t values(1, 9.5)")
    val r2 = e.executeCached("select * from rc.t where a=1", ttlMs = 60000)
    assert(r2.collect().head.getDouble(1) == 1.5)
    // expired → fresh
    val r3 = e.executeCached("select * from rc.t where a=1", ttlMs = 0)
    assert(r3.collect().head.getDouble(1) == 9.5)
  }
}
