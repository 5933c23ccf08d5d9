package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val left = Seq(
    (1, 10L, "a"), (1, 20L, "b"), (1, 30L, "c"), (2, 15L, "d"))
    .toDF("k", "t", "tag")
  private lazy val right = Seq(
    (1, 10L, 100.0, 1L), (1, 10L, 101.0, 2L), (1, 25L, 200.0, 3L),
    (3, 5L, 999.0, 4L))
    .toDF("k", "rt", "v", "eid")

  test("asof backward: latest at-or-before, max tiebreak on equal times") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
        Seq("v"), rightTieBreak = Seq("eid"))
      .orderBy("k", "t").collect().toSeq
    assert(out == Seq(
      Row(1, 10L, "a", 101.0), // equal time visible; eid=2 wins over eid=1
      Row(1, 20L, "b", 101.0),
      Row(1, 30L, "c", 200.0),
      Row(2, 15L, "d", null))) // no right rows for k=2
  }

  test("asof backward strict: equal times excluded") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
        Seq("v"), rightTieBreak = Seq("eid"), strict = true)
      .orderBy("k", "t").collect().toSeq
    assert(out.head == Row(1, 10L, "a", null))
  }

  test("asof forward: earliest at-or-after, min tiebreak on equal times") {
    val out = AsOfJoin.forward(left, right, Seq("k"), "t", "rt",
        Seq("v"), rightTieBreak = Seq("eid"))
      .orderBy("k", "t").collect().toSeq
    assert(out == Seq(
      Row(1, 10L, "a", 100.0), // equal time visible; eid=1 wins (smallest)
      Row(1, 20L, "b", 200.0),
      Row(1, 30L, "c", null), // nothing after t=30
      Row(2, 15L, "d", null)))
  }

  test("asof forward strict: equal times excluded") {
    val out = AsOfJoin.forward(left, right, Seq("k"), "t", "rt",
        Seq("v"), rightTieBreak = Seq("eid"), strict = true)
      .orderBy("k", "t").collect().toSeq
    assert(out.head == Row(1, 10L, "a", 200.0))
  }

  test("ohlcv bars: open/close respect time+tiebreak order") {
    val ticks = Seq(
      (1, 0L, 1L, 10.0), (1, 5L, 2L, 30.0), (1, 9L, 3L, 20.0),
      (1, 10L, 4L, 5.0), (1, 10L, 5L, 7.0))
      .toDF("k", "ts", "eid", "px")
    val out = Resample.ohlcv(ticks, Seq("k"), "ts", "px", "eid", 10L)
      .orderBy("k", "bkt").collect().toSeq
    assert(out == Seq(
      Row(1, 0L, 10.0, 30.0, 10.0, 20.0, 3L, 60.0),
      Row(1, 1L, 5.0, 7.0, 5.0, 7.0, 2L, 12.0)))
  }

  test("vwap: exact weighted average per bucket") {
    val ticks = Seq(
      (1, 0L, 10.0, 2L), (1, 5L, 20.0, 6L), // bucket 0: (20+120)/8 = 17.5
      (1, 12L, 4.0, 1L))                    // bucket 1: 4/1
      .toDF("k", "ts", "px", "vol")
    val out = Resample.vwap(ticks, Seq("k"), "ts", "px", "vol", 10L)
      .select("k", "bkt", "sum_pv", "sum_vol", "n_events", "vwap")
      .orderBy("bkt").collect().toSeq
    assert(out == Seq(
      Row(1, 0L, 140.0, 8L, 2L, 17.5),
      Row(1, 1L, 4.0, 1L, 1L, 4.0)))
  }

  test("ewmaHalf: exact binary weights, head renormalization, depth cut") {
    val ticks = (1L to 10L).map(i => (1, i, i.toDouble)).toDF("k", "ts", "px")
    val out = Resample.ewmaHalf(ticks, Seq("k"), Seq("ts"), "px", depth = 3)
      .orderBy("ts").collect().map(_.getDouble(3))
    // head: just x1 -> 1.0; second: (2 + 1*0.5)/1.5; third+: full depth
    assert(out(0) == 1.0)
    assert(out(1) == (2.0 + 0.5) / 1.5)
    assert(out(2) == (3.0 + 2.0 * 0.5 + 1.0 * 0.25) / 1.75)
    // depth 3: row 4 ignores x1 entirely
    assert(out(3) == (4.0 + 3.0 * 0.5 + 2.0 * 0.25) / 1.75)
  }

  test("factorsDF matches driver-side factors incl. tie determinism") {
    val adjRows = Seq((1, 1000000L, 0.25, 4.0), (1, 3000000L, 0.5, 2.0),
      (1, 5000000L, 0.2, 5.0)).toDF("sec", "tm", "px", "vol")
    val got = Adj.factorsDF(spark, adjRows)
      .orderBy("sec", "idx")
      .select("tm", "px_f", "vol_f", "px_b", "vol_b")
      .collect().toSeq
    assert(got == Seq(
      Row(1000000L, 0.025, 40.0, 4.0, 0.25),
      Row(3000000L, 0.1, 10.0, 8.0, 0.125),
      Row(5000000L, 0.2, 5.0, 40.0, 0.025)))
  }
}
