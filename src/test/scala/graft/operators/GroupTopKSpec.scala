package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GroupTopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic skewed data: group 0 holds half the rows (the hot
  // group a whole-group sort would straggle on)
  private lazy val rows = (1 to 2000).map { i =>
    val g = if (i % 2 == 0) 0L else (i % 7).toLong
    (g, (i * 37 % 500).toDouble, i.toLong)
  }

  test("matches the row_number window plan exactly, ties broken by key") {
    val df = rows.toDF("g", "v", "id")
    val got = GroupTopK.topKPerGroup(df, Seq("g"), "v", "id", k = 3)
      .orderBy("g", "rank").collect().map(_.toSeq)
    val w = Window.partitionBy("g")
      .orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("g"), col("rank"), col("id").as("key"),
        col("v").as("ord"))
      .orderBy("g", "rank").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("partial merge: result is partitioning-invariant") {
    val df = rows.toDF("g", "v", "id")
    val one = GroupTopK.topKPerGroup(df.repartition(1), Seq("g"), "v",
      "id", k = 5).orderBy("g", "rank").collect().map(_.toSeq)
    val many = GroupTopK.topKPerGroup(df.repartition(13), Seq("g"), "v",
      "id", k = 5).orderBy("g", "rank").collect().map(_.toSeq)
    assert(one.toSeq == many.toSeq)
  }

  test("groups smaller than k emit their whole membership, ranked") {
    val df = Seq((1L, 9.0, 1L), (1L, 7.0, 2L), (2L, 5.0, 3L))
      .toDF("g", "v", "id")
    val out = GroupTopK.topKPerGroup(df, Seq("g"), "v", "id", k = 10)
      .orderBy("g", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1, 1L), (1L, 2, 2L), (2L, 1, 3L)))
  }

  test("plan has no window sort: partial aggregation visible") {
    val df = rows.toDF("g", "v", "id")
    val plan = GroupTopK.topKPerGroup(df, Seq("g"), "v", "id", k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "top-k must not plan a Window")
    // ObjectHashAggregate/SortAggregate with partial_topkagg shows the
    // map-side combine actually engaged
    assert(plan.toLowerCase.contains("partial_topkagg"),
      s"expected a partial aggregation stage in:\n$plan")
  }
}
