package graft.engine

import graft.SparkTestSession
import graft.operators.Adj
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Ported adj goldens from reference adj_test.go:10-77 — factor tables
  * and adjusted result sets, forward and backward, point and range,
  * forward/reverse order, exact float64 values.
  */
class AdjSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val engine = {
    val wh = Files.createTempDirectory("graft-adj-wh").toString
    val e = new Engine(spark, wh)
    e.execute("create database test")
    e
  }

  private lazy val init: Unit = {
    engine.execute("insert into test._adj_ values(1, 1, 0.25, 4)")
    engine.execute("insert into test._adj_ values(1, 3, 0.5, 2)")
    engine.execute("insert into test._adj_ values(1, 5, 0.2, 5)")
    engine.execute("create table test.bar(a int, b timestamp, c double, d double, vol double, primary key(a, b))")
    for ((b, v) <- Seq(100 -> 1.0, 99 -> 1.5, 5 -> 1.0, 4 -> 1.0, 3 -> 1.0,
        2 -> 1.0, 0 -> 1.0))
      engine.execute(s"insert into test.bar values(1, $b, $v, $v, $v)")
  }

  private def q(sql: String): Seq[(Long, Double, Double, Double)] = {
    init
    engine.execute(sql).collect().toSeq.map { r =>
      (r.getTimestamp(0).toInstant.getEpochSecond, r.getDouble(1),
        r.getDouble(2), r.getDouble(3))
    }
  }

  test("factor table golden (adj_test.go:20)") {
    init
    val f = Adj.factors(engine.execute("select * from test._adj_"))(1)
    val got = f.map(x => (x.tm / 1000000, x.px, x.vol, x.pxB, x.volB)).toSeq
    assert(got == Seq(
      (1L, 0.025, 40.0, 4.0, 0.25),
      (3L, 0.1, 10.0, 8.0, 0.125),
      (5L, 0.2, 5.0, 40.0, 0.025)))
  }

  test("forward adj point gets (adj_test.go:37-48)") {
    assert(q("select b, adj(c), adj(d), adj(vol) from test.bar where a=1 and b=100") ==
      Seq((100L, 1.0, 1.0, 1.0)))
    assert(q("select b, adj(c), adj(d), adj(vol) from test.bar where a=1 and b=5") ==
      Seq((5L, 1.0, 1.0, 1.0)))
    assert(q("select b, adj(c), adj(d), adj(vol) from test.bar where a=1 and b=4") ==
      Seq((4L, 0.2, 0.2, 5.0)))
    assert(q("select b, adj(c), adj(d), adj(vol) from test.bar where a=1 and b=3") ==
      Seq((3L, 0.2, 0.2, 5.0)))
    assert(q("select b, adj(c), adj(d), adj(vol) from test.bar where a=1 and b=2") ==
      Seq((2L, 0.1, 0.1, 10.0)))
    assert(q("select b, adj(c), adj(d), adj(vol) from test.bar where a=1 and b=0") ==
      Seq((0L, 0.025, 0.025, 40.0)))
  }

  test("forward adj range scans incl. reverse (adj_test.go:49-56)") {
    assert(q("select b, adj(c), adj(d), adj(vol) from test.bar where a=1") == Seq(
      (0L, 0.025, 0.025, 40.0), (2L, 0.1, 0.1, 10.0), (3L, 0.2, 0.2, 5.0),
      (4L, 0.2, 0.2, 5.0), (5L, 1.0, 1.0, 1.0), (99L, 1.5, 1.5, 1.5),
      (100L, 1.0, 1.0, 1.0)))
    assert(q("select b, adj(c), adj(d), adj(vol) from test.bar where a=1 limit -10") == Seq(
      (100L, 1.0, 1.0, 1.0), (99L, 1.5, 1.5, 1.5), (5L, 1.0, 1.0, 1.0),
      (4L, 0.2, 0.2, 5.0), (3L, 0.2, 0.2, 5.0), (2L, 0.1, 0.1, 10.0),
      (0L, 0.025, 0.025, 40.0)))
    assert(q("select b, adj(c), adj(d), adj(vol) from test.bar where a=1 limit -1") ==
      Seq((100L, 1.0, 1.0, 1.0)))
    assert(q("select b, adj(c), adj(d), adj(vol) from test.bar where a=1 limit 1") ==
      Seq((0L, 0.025, 0.025, 40.0)))
  }

  test("backward adj (adj_test.go:57-72) incl. exact float64 chain") {
    assert(q("select b, adj(c, true), adj(d, true), adj(vol, true) from test.bar where a=1 and b=0") ==
      Seq((0L, 1.0, 1.0, 1.0)))
    assert(q("select b, adj(c, true), adj(d, true), adj(vol, true) from test.bar where a=1 and b=2") ==
      Seq((2L, 4.0, 4.0, 0.25)))
    assert(q("select b, adj(c, true), adj(d, true), adj(vol, true) from test.bar where a=1 and b=3") ==
      Seq((3L, 8.0, 8.0, 0.125)))
    assert(q("select b, adj(c, true), adj(d, true), adj(vol, true) from test.bar where a=1 and b=100") ==
      Seq((100L, 40.0, 40.0, 0.025)))
    // the 0.037500000000000006 golden (adj_test.go:70)
    assert(q("select b, adj(c, true), adj(d, true), adj(vol, true) from test.bar where a=1") == Seq(
      (0L, 1.0, 1.0, 1.0), (2L, 4.0, 4.0, 0.25), (3L, 8.0, 8.0, 0.125),
      (4L, 8.0, 8.0, 0.125), (5L, 40.0, 40.0, 0.025),
      (99L, 60.0, 60.0, 0.037500000000000006), (100L, 40.0, 40.0, 0.025)))
    assert(q("select b, adj(c, true), adj(d, true), adj(vol, true) from test.bar where a=1 limit -10") == Seq(
      (100L, 40.0, 40.0, 0.025), (99L, 60.0, 60.0, 0.037500000000000006),
      (5L, 40.0, 40.0, 0.025), (4L, 8.0, 8.0, 0.125), (3L, 8.0, 8.0, 0.125),
      (2L, 4.0, 4.0, 0.25), (0L, 1.0, 1.0, 1.0)))
  }

  test("mixed forward+backward is an error (adj_test.go:74-75)") {
    init
    assert(intercept[OtError](engine.execute(
      "select b, adj(c), adj(d, true), adj(vol, true) from test.bar where a=1")).msg ==
      "Mixed backward and forward adj not allowed")
  }

  test("adj cache invalidation on _adj_ insert") {
    init
    // prime cache
    q("select b, adj(c), adj(d), adj(vol) from test.bar where a=1 and b=0")
    engine.execute("insert into test._adj_ values(1, 7, 0.5, 1)")
    // b=100 is now before the new event at t=7? No: 100 > 7, so still 1.0;
    // but b=5 picks up the new factor 0.5
    assert(q("select b, adj(c), adj(d), adj(vol) from test.bar where a=1 and b=5") ==
      Seq((5L, 0.5, 0.5, 1.0)))
    engine.execute("delete from test._adj_ where sec=1 and time=7")
    assert(q("select b, adj(c), adj(d), adj(vol) from test.bar where a=1 and b=5") ==
      Seq((5L, 1.0, 1.0, 1.0)))
  }

  test("adj constraint errors (query.go:864-875)") {
    init
    engine.execute("create table if not exists test.badadj(a text, b timestamp, c double, primary key(a, b))")
    assert(intercept[OtError](engine.execute(
      "select adj(c) from test.badadj where a='x'")).msg ==
      "The first key of the table must be int for applying adj")
    engine.execute("create table if not exists test.badadj2(a int, b int, c double, primary key(a, b))")
    assert(intercept[OtError](engine.execute(
      "select adj(c) from test.badadj2 where a=1")).msg ==
      "The last key of the table must be timestamp for applying adj")
    assert(intercept[OtError](engine.execute(
      "select adj(c, 1) from test.bar where a=1")).msg ==
      "adj only accept one optional bool params")
  }
}
