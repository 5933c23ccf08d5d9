package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** 2-D skyline (Pareto frontier): rows not dominated by any other row,
  * where row q dominates row p iff q.x <= p.x AND q.y >= p.y with at
  * least one inequality strict (minimize x, maximize y).
  *
  * Two-phase — the textbook distributed-skyline shape:
  *   1. LOCAL prune: each partition sorts its own rows by (x asc,
  *      y desc) and keeps a row only if its y strictly exceeds the
  *      running max over earlier rows. A locally-dominated row is
  *      globally dominated (dominance doesn't care who else exists),
  *      so this is a sound, shuffle-free pre-filter; it collapses each
  *      partition to its own frontier — O(log n) expected points for
  *      independent dims, never more than the partition.
  *      On DISTINCT points the running-max test IS dominance: after
  *      (x asc, y desc), a point is dominated iff max(y) over strictly
  *      earlier rows >= its y (the maximizer has smaller x — strict in
  *      x — or equal x and strictly larger y).
  *   2. GLOBAL pass: exact dominance anti-join over the survivors —
  *      both sides are unions of per-partition frontiers (tiny), so
  *      the broadcast nested-loop this plans is bounded by
  *      construction, not by luck of the data.
  *
  * Duplicate (x, y) rows don't dominate each other (no strict
  * inequality), so the frontier is computed on the distinct point set
  * and all of a frontier point's duplicates survive the final
  * semi-join.
  */
object Skyline {
  /** All rows of `df` on the (minimize `x`, maximize `y`) frontier. */
  def skyline2D(df: DataFrame, x: String, y: String): DataFrame = {
    val pts = df.select(col(x), col(y)).distinct()
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col(x).asc, col(y).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = pts.withColumn("__pid", spark_partition_id())
      .withColumn("__best", max(col(y)).over(w))
      .filter(col("__best").isNull || col(y) > col("__best"))
      .select(col(x), col(y))
    val q = local.select(col(x).as("__qx"), col(y).as("__qy"))
    val frontier = local.join(q,
      col("__qx") <= col(x) && col("__qy") >= col(y) &&
        (col("__qx") < col(x) || col("__qy") > col(y)),
      "left_anti")
    df.join(frontier, Seq(x, y), "left_semi")
  }
}
