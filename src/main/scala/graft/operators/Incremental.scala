package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incremental-view-maintenance primitives: algebraic partial
  * aggregates stored per slice (day/partition), merged into final
  * aggregates WITHOUT rescanning raw rows. At 100 TB this is the
  * difference between an all-time metric costing one scan of
  * (slices × keys) partial rows and costing the raw corpus: partials
  * for closed slices never recompute — only the open slice does.
  * Exactness: counts/min/max are trivially mergeable; sums are
  * carried in DECIMAL so the two-level (slice, then total) addition
  * is bit-identical to a one-pass sum in any engine (decimal
  * addition is associative; double addition is not).
  */
object Incremental {
  /** Per-(keys, slice) mergeable state: n / decimal sum / min / max.
    * One map-side-combined aggregation over the raw rows of a slice.
    */
  def partialAggs(df: DataFrame, keys: Seq[String], sliceCol: String,
      valueCol: String): DataFrame =
    df.groupBy((keys :+ sliceCol).map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(18, 6))).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Fold partial states into final per-key aggregates (+ the derived
    * avg, one fixed-order double quotient). Input is the partial
    * table — (slices × keys) rows — never the raw data.
    */
  def mergeAggs(partials: DataFrame, keys: Seq[String]): DataFrame =
    partials.groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
      .withColumn("avg_v",
        col("sum_v").cast(DoubleType) / col("n").cast(DoubleType))

  /** Incremental equi-join maintenance: when batches (ΔL, ΔR) land on a
    * materialized view L ⋈ R, the view's delta is
    * ΔL ⋈ (R ∪ ΔR)  ∪  L ⋈ ΔR — the standard delta rule, with the
    * old⋈old term (the 100 TB bulk) never recomputed. Both branches are
    * plain equi-joins with the delta on one side — broadcastable when
    * the batch is — so maintenance costs O(|Δ| + matches), not a full
    * re-join. The branches are disjoint by construction (every ΔL×ΔR
    * pair lives in the first branch only), so the union needs no dedup.
    */
  def deltaJoin(leftOld: DataFrame, leftDelta: DataFrame,
      rightOld: DataFrame, rightDelta: DataFrame,
      keys: Seq[String]): DataFrame =
    leftDelta.join(rightOld.unionByName(rightDelta), keys)
      .unionByName(leftOld.join(rightDelta, keys))
}
