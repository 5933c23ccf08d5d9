package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Hex52Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native hash equals the portable 13-nibble SQL form bit-for-bit") {
    // longs, text, empty string, unicode, md5-edge 'leading zero' cases
    val keys = ((1L to 500L).map(_.toString) ++
      Seq("", "a", "müller", "日本語", "0", "-1", " padded ")).toDF("k")
    val both = keys
      .withColumn("hex", md5(col("k")))
      .withColumn("sql_hv",
        expr(graft.operators.Sketch.hex52Sql("hex")))
      .withColumn("native_hv", Hex52(col("k")))
    assert(both.filter(col("sql_hv") =!= col("native_hv")).count() == 0,
      both.filter(col("sql_hv") =!= col("native_hv"))
        .select("k", "sql_hv", "native_hv").take(5).mkString(","))
    // range: 52 bits, never negative
    val mx = both.agg(max("native_hv"), min("native_hv")).head()
    assert(mx.getLong(1) >= 0L && mx.getLong(0) < (1L << 52))
  }

  test("codegen and interpreted paths agree; nulls propagate") {
    val df = Seq(Some("x"), None, Some("y")).toDF("k")
    val withExpr = df.select(col("k"), Hex52(col("k")).as("hv"))
    val codegen = withExpr.collect()
    // interpreted: force eval through a filter on the expression
    val interp = df.na.drop().select(col("k"), Hex52(col("k")).as("hv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- codegen if r.getString(0) != null)
      assert(r.getLong(1) == interp(r.getString(0)))
    assert(codegen.filter(_.getString(0) == null).forall(_.isNullAt(1)),
      "null input must yield null hash")
  }

  test("registered SQL surface: hex52(str)") {
    Functions.register(spark)
    val r = spark.sql("SELECT hex52('42') AS hv").head().getLong(0)
    val want = Seq("42").toDF("k").select(Hex52(col("k"))).head().getLong(0)
    assert(r == want)
  }
}
