package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * `events.parquet` stores its `ts` column as parquet TIMESTAMP(NANOS),
  * which Spark cannot read as TimestampType (µs). We read it with
  * `spark.sql.legacy.parquet.nanosAsLong=true` (set once per session
  * here) so `ts` surfaces as LongType epoch-nanos; use
  * [[Tables.tsMicros]] to get comparable epoch-µs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session tuning we rely on everywhere. Idempotent; cheap. */
  def configure(spark: SparkSession): SparkSession = {
    val c = spark.conf
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    c.set("spark.sql.session.timeZone", "UTC")
    // Exact decimal → parquet DECIMAL; timestamps as int64 µs so the
    // DuckDB oracle reads identical values.
    c.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    c.set("spark.sql.adaptive.enabled", "true")
    spark
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
