package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NativeAsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val left = Seq(
    (1, 10L, "a"), (1, 20L, "b"), (1, 30L, "c"), (2, 15L, "d"))
    .toDF("k", "t", "tag")
  private lazy val right = Seq(
    (1, 10L, 100.0), (1, 25L, 200.0), (3, 5L, 999.0))
    .toDF("k", "rt", "v")

  test("native as-of matches expected rows incl. nulls and ties") {
    val out = NativeAsOf.backward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("k", "t").collect().toSeq
    assert(out == Seq(
      Row(1, 10L, "a", 100.0), // equal time visible
      Row(1, 20L, "b", 100.0),
      Row(1, 30L, "c", 200.0),
      Row(2, 15L, "d", null)))
  }

  test("strict excludes equal times") {
    val out = NativeAsOf.backward(left, right, Seq("k"), "t", "rt",
        Seq("v"), strict = true)
      .orderBy("k", "t").collect().toSeq
    assert(out.head == Row(1, 10L, "a", null))
  }

  test("plan uses the custom exec with sorted co-partitioned children") {
    val df = NativeAsOf.backward(left, right, Seq("k"), "t", "rt", Seq("v"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
  }

  test("parity with the composed union+window as-of on real events") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"), $"value".as("last_purchase"))
    val native = NativeAsOf.backward(clicks, purchases, Seq("user_id"),
        "ts", "pts", Seq("last_purchase"))
      .select("user_id", "event_id", "last_purchase")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    val composed = graft.operators.AsOfJoin.backward(clicks,
        purchases.withColumnRenamed("pts", "ts2"), Seq("user_id"),
        "ts", "ts2", Seq("last_purchase"))
      .select("user_id", "event_id", "last_purchase")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(native == composed)
  }

  test("survives pre-partitioned inputs and empty right side") {
    val emptyRight = right.filter($"k" === 999)
    val out = NativeAsOf.backward(left, emptyRight, Seq("k"), "t", "rt",
      Seq("v")).collect()
    assert(out.length == 4 && out.forall(_.isNullAt(3)))
    val repart = NativeAsOf.backward(left.repartition(7, $"k"),
      right.repartition(3, $"k"), Seq("k"), "t", "rt", Seq("v"))
      .orderBy("k", "t").collect()
    assert(repart.length == 4 && repart.head == Row(1, 10L, "a", 100.0))
  }

  test("equal-time ties resolve by tieBreak, parity with composed") {
    // three right rows at the SAME (key, time) with different payloads
    val dupRight = Seq(
      (1, 10L, 100.0, 1L), (1, 10L, 111.0, 3L), (1, 10L, 105.0, 2L),
      (1, 25L, 200.0, 9L))
      .toDF("k", "rt", "v", "rid")
    // backward: greatest rid at the tied time wins
    val bw = NativeAsOf.backward(left, dupRight, Seq("k"), "t", "rt",
        Seq("v"), tieBreak = Seq("rid"))
      .orderBy("k", "t").collect().toSeq
    assert(bw == Seq(
      Row(1, 10L, "a", 111.0),
      Row(1, 20L, "b", 111.0),
      Row(1, 30L, "c", 200.0),
      Row(2, 15L, "d", null)))
    val bwComposed = graft.operators.AsOfJoin.backward(left, dupRight,
        Seq("k"), "t", "rt", Seq("v"), rightTieBreak = Seq("rid"))
      .orderBy("k", "t").collect().toSeq
    assert(bw == bwComposed)
    // forward: smallest rid at the tied time wins
    val fw = NativeAsOf.forward(left, dupRight, Seq("k"), "t", "rt",
        Seq("v"), tieBreak = Seq("rid"))
      .orderBy("k", "t").collect().toSeq
    assert(fw.head == Row(1, 10L, "a", 100.0))
    val fwComposed = graft.operators.AsOfJoin.forward(left, dupRight,
        Seq("k"), "t", "rt", Seq("v"), rightTieBreak = Seq("rid"))
      .orderBy("k", "t").collect().toSeq
    assert(fw == fwComposed)
  }

  test("payload columns all come from the same right row (null-safe)") {
    // newest matching right row carries a NULL payload column: the join
    // must return THAT null, not an older row's non-null value
    val r2 = Seq(
      (1, 5L, Some(50.0), "old"), (1, 9L, None, "new"))
      .toDF("k", "rt", "v", "src")
    val out = graft.operators.AsOfJoin.backward(
        left.filter($"t" === 10L), r2, Seq("k"), "t", "rt",
        Seq("v", "src"), rightTieBreak = Seq("rt"))
      .collect().toSeq
    assert(out == Seq(Row(1, 10L, "a", null, "new")))
    val nat = NativeAsOf.backward(left.filter($"t" === 10L), r2, Seq("k"),
        "t", "rt", Seq("v", "src"), tieBreak = Seq("rt")).collect().toSeq
    assert(nat == out)
  }

  test("mismatched key or time types are rejected with a clear error") {
    val badRight = right.withColumn("k", $"k".cast("long"))
    val e1 = intercept[IllegalArgumentException](
      NativeAsOf.backward(left, badRight, Seq("k"), "t", "rt", Seq("v")))
    assert(e1.getMessage.contains("type mismatch"))
    val badTime = right.withColumn("rt", $"rt".cast("int"))
    val e2 = intercept[IllegalArgumentException](
      NativeAsOf.backward(left, badTime, Seq("k"), "t", "rt", Seq("v")))
    assert(e2.getMessage.contains("time type mismatch"))
  }

  test("forward direction: earliest at-or-after, parity with composed") {
    val out = NativeAsOf.forward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("k", "t").collect().toSeq
    assert(out == Seq(
      Row(1, 10L, "a", 100.0), // equal time visible
      Row(1, 20L, "b", 200.0),
      Row(1, 30L, "c", null),
      Row(2, 15L, "d", null)))
    val strictOut = NativeAsOf.forward(left, right, Seq("k"), "t", "rt",
      Seq("v"), strict = true).orderBy("k", "t").collect().toSeq
    assert(strictOut.head == Row(1, 10L, "a", 200.0))
    // parity on real events: next purchase value after each click
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"), $"value".as("next_purchase"))
    val native = NativeAsOf.forward(clicks, purchases, Seq("user_id"),
        "ts", "pts", Seq("next_purchase"))
      .select("user_id", "event_id", "next_purchase").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    val composed = graft.operators.AsOfJoin.forward(clicks,
        purchases.withColumnRenamed("pts", "ts2"), Seq("user_id"),
        "ts", "ts2", Seq("next_purchase"))
      .select("user_id", "event_id", "next_purchase").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(native == composed)
  }
}
