package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosinePairSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("matches the zip_with/aggregate fold bit-for-bit on real pairs") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").select($"vec_id", $"embedding")
    val pairs = emb.as("a").join(emb.as("b"),
      $"a.vec_id" % 10 === $"b.vec_id" % 10 &&
        $"a.vec_id" < $"b.vec_id")
    val viaFold = pairs.select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        graft.operators.Similarity.cosinePair($"a.embedding",
          $"b.embedding").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val viaNative = pairs.select($"a.vec_id".as("ia"),
        $"b.vec_id".as("ib"),
        CosinePair($"a.embedding", $"b.embedding").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(viaFold.size > 1000 && viaFold == viaNative) // exact doubles
  }

  test("nulls: null input, length mismatch, zero norm") {
    val rows = Seq(
      (1L, Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f))),
      (2L, None, Some(Array(1.0f, 0.0f))), // null side
      (3L, Some(Array(1.0f)), Some(Array(1.0f, 0.0f))), // length skew
      (4L, Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 0.0f)))) // zero norm
      .toDF("id", "a", "b")
    val got = rows.select($"id", CosinePair($"a", $"b").as("c"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
                                 else r.getDouble(1))).toMap
    assert(got(1L) == 1.0)
    assert(got(2L) == null && got(3L) == null && got(4L) == null)
  }

  test("interpreted path agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def arr(xs: Double*) =
      Literal.create(xs.toArray, ArrayType(DoubleType))
    val v = CosinePair(arr(0.6, 0.8), arr(1.0, 0.0)).eval(null)
    assert(math.abs(v.asInstanceOf[Double] - 0.6) < 1e-12)
    assert(CosinePair(arr(0.0, 0.0), arr(1.0, 0.0)).eval(null) == null)
  }

  test("registered SQL function works from spark.sql text") {
    Functions.register(spark)
    Seq((1L, Array(0.6, 0.8), Array(1.0, 0.0)))
      .toDF("id", "a", "b").createOrReplaceTempView("cp_v")
    val r = spark.sql("SELECT cosine_pair(a, b) AS c FROM cp_v")
      .head().getDouble(0)
    assert(math.abs(r - 0.6) < 1e-12)
  }
}
