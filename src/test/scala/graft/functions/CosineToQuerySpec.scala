package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineToQuerySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("matches the expression-composed cosine bit-for-bit") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val viaExpr = emb.select($"vec_id",
      graft.operators.Similarity.cosine($"embedding", q).as("c")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaNative = emb.select($"vec_id", CosineToQuery($"embedding", q).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaExpr == viaNative) // exact double equality, same fold order
  }

  test("codegen and interpreted paths agree") {
    val vecs = Seq((1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.6f, 0.8f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 2.0f))).toDF("id", "v")
    val q = Seq(1.0, 0.0, 0.0)
    val got = vecs.select($"id", CosineToQuery($"v", q).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 1.0)
    assert(math.abs(got(2L) - 0.6) < 1e-7)
    assert(got(3L) == 0.0)
    // interpreted path (no codegen): evaluate via a filter on the value
    val interp = CosineToQuery(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.6, 0.8, 0.0),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      q.toArray).eval(null)
    assert(math.abs(interp.asInstanceOf[Double] - 0.6) < 1e-12)
  }

  test("null vector yields null") {
    val vecs = Seq((1L, Option.empty[Array[Float]]),
      (2L, Some(Array(1.0f, 0.0f)))).toDF("id", "v")
    val got = vecs.select($"id", CosineToQuery($"v", Seq(1.0, 0.0)).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L) == null && got(2L) == 1.0)
  }

  test("registered SQL function works from spark.sql text") {
    Functions.register(spark)
    graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb_v")
    // non-constant second argument is rejected at analysis
    assertThrows[Exception](spark.sql(
      """SELECT cosine_to_query(embedding, embedding) FROM emb_v"""))
    val lit64 = (1 to 64).map(i => (i % 7) * 0.25).mkString("array(", ", ", ")")
    val r2 = spark.sql(
      s"SELECT vec_id, cosine_to_query(embedding, $lit64) AS c FROM emb_v ORDER BY c DESC LIMIT 3")
      .collect()
    assert(r2.length == 3 && r2.forall(x => !x.isNullAt(1)))
  }
}
