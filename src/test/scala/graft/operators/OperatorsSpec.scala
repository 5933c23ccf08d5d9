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

  test("editDistancePairs: finds suffix twins, blocks all-pairs plans") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog tail"), // +5 chars
      (3L, "a completely different text with nothing shared"),
      (4L, "the quick brown fox leaps over sleepy dogs everywhere"))
      .toDF("id", "text")
    val pairs = Dedup.editDistancePairs(docs, "id", "text",
      prefixLen = 16, maxDist = 8)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // 1<->2: append " tail" = dist 5; 1<->4 shares the 16-prefix but
    // dist > 8; 3 shares no block
    assert(got == Set((1L, 2L, 5)), s"got $got")
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("lineDedup: strips corpus-common lines, preserves line order") {
    val docs = Seq(
      (1L, "HEADER\nalpha\nbeta\nFOOTER"),
      (2L, "HEADER\ngamma\nFOOTER"),
      (3L, "HEADER\ndelta\nepsilon\nzeta\nFOOTER"))
      .toDF("id", "text")
    val out = TextAnalysis.lineDedup(docs, "id", "text", minDocs = 3)
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("clean_text")).toSeq ==
      Seq("alpha\nbeta", "gamma", "delta\nepsilon\nzeta"))
    assert(out.map(_.getAs[Long]("n_removed")).toSeq == Seq(2L, 2L, 2L))
    assert(out.map(_.getAs[Long]("n_lines")).toSeq == Seq(4L, 3L, 5L))
  }

  test("rollingAutoCorr: matches direct Pearson on full frames, null before") {
    // x_t = t for one series: lag pairs (t, t-1) are perfectly linear
    // -> autocorr exactly 1 once the frame has `window` complete pairs
    val ticks = (1L to 12L).map(i => (1, i, i.toDouble)).toDF("k", "ts", "px")
    val out = Resample.rollingAutoCorr(ticks, Seq("k"), Seq("ts"), "px",
        window = 5)
      .orderBy("ts").collect()
    val corr = out.map(r => Option(r.getAs[java.lang.Double]("autocorr")))
    // rows 1..5 lack 5 complete pairs (row1 has no lag at all)
    assert(corr.take(5).forall(_.isEmpty), s"head must be null: ${corr.toSeq}")
    assert(corr.drop(5).forall(c => c.isDefined && math.abs(c.get - 1.0) < 1e-12),
      s"linear series must autocorrelate at 1: ${corr.toSeq}")
    // constant series: zero variance -> null, not NaN
    val const = (1L to 8L).map(i => (1, i, 7.0)).toDF("k", "ts", "px")
    val cc = Resample.rollingAutoCorr(const, Seq("k"), Seq("ts"), "px", 3)
      .collect().map(r => Option(r.getAs[java.lang.Double]("autocorr")))
    assert(cc.forall(_.isEmpty))
  }

  test("concurrency: sweep line matches brute-force overlap counting") {
    // intervals per key: [0,10) [5,15) [5,8) [20,30) -> peak 3 at t=5..8
    val iv = Seq((1, 0L, 10L, 1L), (1, 5L, 15L, 2L), (1, 5L, 8L, 3L),
      (1, 20L, 30L, 4L)).toDF("k", "t0", "t1", "eid")
    val out = Resample.concurrency(iv, Seq("k"), "t0", "t1", "eid")
      .orderBy("t", "delta", "tie").collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("delta"),
        r.getAs[Long]("active")))
    // brute force: after each boundary (sorted t, ends first), recount
    val bounds = Seq((0L, 1L, 1L), (5L, 1L, 2L), (5L, 1L, 3L), (8L, -1L, 3L),
      (10L, -1L, 1L), (15L, -1L, 2L), (20L, 1L, 4L), (30L, -1L, 4L))
      .sortBy(b => (b._1, b._2, b._3))
    var acc = 0L
    val want = bounds.map { b => acc += b._2; (b._1, b._2, acc) }
    assert(out.toSeq == want, s"got ${out.toSeq}")
    assert(out.map(_._3).max == 3L, "peak concurrency must be 3")
    assert(out.last._3 == 0L, "all intervals closed at the end")
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
