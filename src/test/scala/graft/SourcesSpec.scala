package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source/sink formats beyond parquet: CSV and JSON-lines round-trips
  * with EXPLICIT schemas (schema inference reads the data twice and
  * guesses — never acceptable on a 100 TB landing zone), parquet scan
  * pushdown proof, and the file-stream source that turns a landing
  * directory into a Structured Streaming input.
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample = Seq(
    (1L, "alpha", 1.5, "2024-01-01T00:00:00Z"),
    (2L, "bravo,comma", -2.0, "2024-01-02T12:30:00Z"),
    (3L, "líne\"quote", 0.0, "2024-01-03T23:59:59Z"))
    .toDF("id", "name", "score", "ts_str")

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType), StructField("ts_str", StringType)))

  test("csv round-trip: explicit schema, quoting, header") {
    val dir = Files.createTempDirectory("graft-csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.schema == schema, "schema must be the declared one")
    assert(back.collect().map(_.toSeq).toSet ==
      sample.collect().map(_.toSeq).toSet,
      "commas and quotes must survive the round-trip")
  }

  test("jsonl round-trip: explicit schema, no inference pass") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.schema == schema)
    assert(back.collect().map(_.toSeq).toSet ==
      sample.collect().map(_.toSeq).toSet)
    // a column missing from the declared schema is simply not read —
    // projection happens at the source, not after
    val narrow = spark.read.schema(StructType(Seq(
      StructField("id", LongType)))).json(dir)
    assert(narrow.columns.toSeq == Seq("id"))
  }

  test("parquet scan: filter and projection reach the reader") {
    val dir = Files.createTempDirectory("graft-pq").toString
    sample.write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("id") > 1L).select("name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"),
      s"filter not pushed:\n${plan.take(800)}")
    assert(plan.contains("ReadSchema: struct<id:bigint,name:string>"),
      s"projection not pruned:\n${plan.take(800)}")
  }

  test("file-stream source: landing dir becomes a stream, batch parity") {
    val dir = Files.createTempDirectory("graft-land").toString
    sample.write.mode("overwrite").json(dir)
    val stream = spark.readStream.schema(schema).json(dir)
      .groupBy("name").agg(sum(col("score")).as("s"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("land_out").start()
    try {
      q.processAllAvailable()
      // a second file landing in the directory is picked up incrementally
      Seq((4L, "alpha", 2.5, "2024-01-04T00:00:00Z"))
        .toDF("id", "name", "score", "ts_str")
        .write.mode("append").json(dir)
      q.processAllAvailable()
      val got = spark.sql("SELECT name, s FROM land_out").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got("alpha") == 4.0 && got("bravo,comma") == -2.0,
        s"got $got")
    } finally q.stop()
  }
}
