package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * The engine-visible contract for `events.ts` is LongType epoch-nanos,
  * regardless of how the driver happened to encode the parquet:
  *   - TIMESTAMP(NANOS)  → surfaces as LongType via
  *     `spark.sql.legacy.parquet.nanosAsLong=true` (older testdata);
  *   - TIMESTAMP_MICROS (isAdjustedToUTC=false → TIMESTAMP_NTZ) →
  *     normalized here to `unix_micros * 1000` (current testdata).
  * The session timezone is pinned to UTC so the NTZ→instant cast is
  * shift-free. Use [[Tables.tsMicros]] to get comparable epoch-µs.
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
    // time-range predicates over the derived epoch-nanos ts must still
    // prune parquet row groups (see plans.NanoTsFilterPushdown)
    org.apache.spark.sql.GraftSql.addOptimization(spark,
      graft.plans.NanoTsFilterPushdown)
    spark
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Enforce the `ts` contract (LongType epoch-nanos) whichever physical
    * encoding the parquet carries. Long passes through untouched; µs
    * timestamps (with or without zone) are widened to nanos.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        df.withColumn(
          "ts", (unix_micros(col("ts").cast(TimestampType)) * lit(1000L)).cast(LongType))
      case _ => df
    }

  /** Epoch-µs view of an epoch-nanos `ts` column (integer division). */
  def tsMicros(ts: Column): Column = (ts / lit(1000L)).cast(LongType)
}
