package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** OHLCV bar-building (resampling) over tick/event streams — the
  * north-star analytic the reference's README positions opentick for
  * (reference README.md:90-93: bar tables keyed (sec, interval, tm)).
  *
  * One aggregation (map-side partial combine, no window): first/last are
  * computed with min_by/max_by on a (time, tiebreak) struct, so the bar
  * build is a single shuffle on the group keys and scales linearly with
  * input. Note: the struct-ordered min_by buffer is not UnsafeRow-
  * mutable, so Spark plans this as SortAggregate (per-partition sort on
  * group keys) rather than HashAggregate — still one shuffle, and the
  * sort key is (series, bucket), not event time.
  */
object Resample {
  /** Tumbling-window OHLCV bars.
    *
    * @param df       input rows
    * @param keys     series identity columns (e.g. symbol / user)
    * @param timeCol  LONG event time (any unit)
    * @param valueCol DOUBLE price/value column
    * @param tieBreak unique-ish column ordering rows within equal times
    * @param width    bucket width in `timeCol` units
    */
  /** Sliding-window aggregation: each event lands in width/slide
    * overlapping buckets (exploded), then one hash aggregation per
    * (keys, bucket). Bucket b covers [b*slide, b*slide + width);
    * emitted bucket ids are the window START in `slide` units.
    */
  def slidingSum(df: DataFrame, keys: Seq[String], timeCol: String,
      valueCol: String, width: Long, slide: Long): DataFrame = {
    require(width % slide == 0, "width must be a multiple of slide")
    val k = width / slide
    // buckets b with b*slide <= t < b*slide + width ⇒
    // b in [t div slide - (k-1), t div slide]
    df.withColumn("bkt", explode(expr(
        s"sequence($timeCol div ${slide}L - ${k - 1}L, $timeCol div ${slide}L)")))
      .filter(col("bkt") >= 0)
      .groupBy((keys :+ "bkt").map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 6))).cast(DoubleType)
          .as("sum_value"))
  }

  def ohlcv(df: DataFrame, keys: Seq[String], timeCol: String,
      valueCol: String, tieBreak: String, width: Long): DataFrame = {
    val ord = struct(col(timeCol), col(tieBreak))
    df.withColumn("bkt", expr(s"$timeCol div ${width}L"))
      .groupBy((keys :+ "bkt").map(col): _*)
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 6))).cast(DoubleType)
          .as("sum_value"))
  }
}
