package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed as-of join: for each left row, attach payload columns from
  * the latest right row at-or-before (backward) / earliest at-or-after
  * (forward) the left row's time, per join key.
  *
  * Implementation is the "merge as-of" pattern (SURVEY.md §2.6): tag and
  * union both sides, sort within key partitions by (time, side, tiebreak),
  * and propagate the nearest non-null payload with an unbounded window.
  * ONE shuffle on the key columns, no broadcast requirement, no driver
  * state — the shape that survives a 1000-executor cluster (both sides
  * repartition by `by`; skew is handled by AQE).
  *
  * Tie semantics (non-strict): at equal times the right row is visible to
  * the left row (<= / >=), matching the reference's bisectRight-based adj
  * application (reference adj.go:49-68,183-199). `strict=true` gives
  * (< / >).
  *
  * Column-name caveat: `left` must not already contain the payload output
  * names; payload columns overwrite same-named left columns in the result.
  */
object AsOfJoin {
  def backward(left: DataFrame, right: DataFrame, by: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      rightTieBreak: Seq[String] = Nil, strict: Boolean = false): DataFrame =
    merge(left, right, by, leftTime, rightTime, payload.distinct,
      rightTieBreak, strict, forwardDir = false)

  def forward(left: DataFrame, right: DataFrame, by: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      rightTieBreak: Seq[String] = Nil, strict: Boolean = false): DataFrame =
    merge(left, right, by, leftTime, rightTime, payload.distinct,
      rightTieBreak, strict, forwardDir = true)

  /** NEAREST-in-time as-of join: for each left row, the right row with
    * the smallest |t_right − t_left| per key — ties broken toward the
    * EARLIER right row (backward wins at equal distance; at Δ=0 the
    * equal-time right row counts as backward), then by the per-side tie
    * conventions of [[backward]]/[[forward]] (equal-time backward keeps
    * the greatest tiebreak, forward the smallest).
    *
    * Same merge shape as backward/forward — ONE shuffle + ONE sort on
    * (key, time): both directional picks are window frames over the
    * same sorted partition, so Spark reuses a single Exchange+Sort for
    * the pair of Window operators. Time columns must be numeric
    * (epoch-nanos longs here) so the distance compare is exact integer
    * arithmetic.
    */
  def nearest(left: DataFrame, right: DataFrame, by: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val tb = rightTieBreak
    val carried = (payload ++ tb :+ rightTime).distinct
    val leftCols = left.columns.toSeq
    val extraL = leftCols.filterNot(by.contains)

    val pStructType = org.apache.spark.sql.types.StructType(
      carried.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))

    // right BEFORE left at equal times: the preceding (backward) frame
    // sees the equal-time right row, the following (forward) frame does
    // not — so Δ=0 matches resolve to the backward side, which is also
    // the side the equal-distance tie rule prefers.
    val l = left.withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pStructType))
    var r = right
      .select((by ++ carried).distinct.map(col): _*)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__p", struct(carried.map(col): _*))
    for (c <- extraL)
      r = r.withColumn(c, lit(null).cast(left.schema(c).dataType))

    val unionCols = by ++ extraL ++ Seq("__t", "__side", "__p")
    val merged = l.select(unionCols.map(col): _*)
      .union(r.select(unionCols.map(col): _*))

    val order = Seq(col("__t").asc, col("__side").asc) ++
      tb.map(c => col("__p").getField(c).asc)
    val w0 = Window.partitionBy(by.map(col): _*).orderBy(order: _*)
    val prev = last(col("__p"), ignoreNulls = true)
      .over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val next = first(col("__p"), ignoreNulls = true)
      .over(w0.rowsBetween(Window.currentRow, Window.unboundedFollowing))

    val dPrev = abs(col("__t") - col("__prev").getField(rightTime))
    val dNext = abs(col("__next").getField(rightTime) - col("__t"))
    val picked = when(col("__prev").isNull, col("__next"))
      .when(col("__next").isNull, col("__prev"))
      .when(dPrev <= dNext, col("__prev"))
      .otherwise(col("__next"))
    merged
      .withColumn("__prev", prev).withColumn("__next", next)
      .filter(col("__side") === lit(1))
      .withColumn("__asof", picked)
      .select((leftCols.filterNot(payload.contains).map(col) ++
        payload.map(c => col("__asof").getField(c).as(c))): _*)
  }

  private def merge(left: DataFrame, right: DataFrame, by: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      tb: Seq[String], strict: Boolean, forwardDir: Boolean): DataFrame = {
    // Side ordering so the window frame includes exactly the right rows
    // the direction + strictness allow at equal times:
    //   backward non-strict: right before left  (left sees equal-time right)
    //   backward strict:     left before right
    //   forward  non-strict: left before right  (following-frame sees it)
    //   forward  strict:     right before left
    val leftFirst = if (forwardDir) !strict else strict
    val sideOfL = if (leftFirst) 0 else 1
    val sideOfR = 1 - sideOfL
    val carried = (payload ++ tb).distinct

    val leftCols = left.columns.toSeq
    val extraL = leftCols.filterNot(by.contains)

    // ONE struct carries all payload (+tiebreak) columns, so the window
    // pick below selects a whole right ROW atomically: every output
    // payload value — including legitimate nulls — comes from the same,
    // truly latest/earliest matching right row. (Per-column
    // last/first(ignoreNulls) would instead substitute older non-null
    // values for a newer row's nulls and could mix rows.)
    val pStructType = org.apache.spark.sql.types.StructType(
      carried.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))

    val l = left.withColumn("__t", col(leftTime))
      .withColumn("__side", lit(sideOfL))
      .withColumn("__p", lit(null).cast(pStructType))

    var r = right
      .select((by ++ Seq(rightTime) ++ carried).distinct.map(col): _*)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(sideOfR))
      .withColumn("__p", struct(carried.map(col): _*))
    for (c <- extraL) r = r.withColumn(c, lit(null).cast(left.schema(c).dataType))

    val unionCols = by ++ extraL ++ Seq("__t", "__side", "__p")
    val merged = l.select(unionCols.map(col): _*)
      .union(r.select(unionCols.map(col): _*))

    // among equal-time right rows: backward keeps the greatest tiebreak
    // (last in asc order), forward keeps the smallest (first in asc order)
    val order = Seq(col("__t").asc, col("__side").asc) ++
      tb.map(c => col("__p").getField(c).asc)
    val w0 = Window.partitionBy(by.map(col): _*).orderBy(order: _*)
    val w = if (forwardDir)
      w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    else w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val picked = if (forwardDir)
      first(col("__p"), ignoreNulls = true).over(w)
    else last(col("__p"), ignoreNulls = true).over(w)
    merged.withColumn("__asof", picked)
      .filter(col("__side") === lit(sideOfL))
      .select((leftCols.filterNot(payload.contains).map(col) ++
        payload.map(c => col("__asof").getField(c).as(c))): _*)
  }
}
