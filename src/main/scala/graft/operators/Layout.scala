package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB path: bucketed co-located
  * joins (no shuffle at read time) and salted joins for skewed keys.
  */
object Layout {
  /** Write `df` as a bucketed+sorted managed table: repeated joins or
    * aggregations on `keys` then run shuffle-free (both sides already
    * hash-partitioned by bucket id). This is the batch analog of
    * pre-partitioning a 100 TB fact table once to serve many queries.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys — planner elides both
    * exchanges when bucket specs line up.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)

  /** Skew-safe equi-join: left rows get a deterministic salt derived
    * from `saltSource` (any well-distributed left column), the right
    * side is replicated `n`× — a hot key spreads over n reducers
    * instead of one straggler. Equivalent rows to a plain inner join.
    */
  /** Band (interval) join — pairs within `|l.ts - r.ts| <= delta` under
    * equal `keys` — WITHOUT the broadcast-nested-loop plan Spark gives a
    * naive non-equi condition. The left side probes its time bucket and
    * both neighbors (bucket width = delta, so every in-band partner
    * lands within ±1 bucket), the join is EQUI on (keys, bucket), and
    * the exact band predicate filters the candidates after. Cost: 3×
    * duplication of ONE side and one hash shuffle on (keys, bucket) —
    * versus the quadratic per-key blowup of the NLJ, which is the
    * difference between a join and an outage at 100 TB. Left columns
    * get prefix `l_`, right columns `r_`.
    */
  def bandedRangeJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String, delta: Long): DataFrame = {
    require(delta > 0, "delta must be positive")
    val l = left.columns.foldLeft(left)((d, c) =>
      d.withColumnRenamed(c, s"l_$c"))
    val r = right.columns.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, s"r_$c"))
    val probe = l.withColumn("__bkt",
      explode(array(Seq(-1L, 0L, 1L).map(o =>
        expr(s"l_$tsCol div ${delta}L") + lit(o)): _*)))
    val build = r.withColumn("__bkt", expr(s"r_$tsCol div ${delta}L"))
    val keyConds = keys.map(k => col(s"l_$k") === col(s"r_$k"))
    val joinCond = (keyConds :+ (probe("__bkt") === build("__bkt")))
      .reduce(_ && _)
    probe.join(build, joinCond)
      .filter(abs(col(s"l_$tsCol") - col(s"r_$tsCol")) <= delta)
      .drop("__bkt")
  }

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltSource: String, n: Int): DataFrame = {
    val salted = left.withColumn("__salt", pmod(xxhash64(col(saltSource)), lit(n)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until n).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Z-order (Morton) value of `cols`: bit `i*k + j` of the result is
    * bit `i` of column `j` — pure integer expressions (whole-stage
    * codegen; any engine replays them). Inputs must already be
    * non-negative and fit `bits` bits (scale or `pmod` first);
    * `cols.size * bits` must stay ≤ 63.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 1 && k * bits <= 63, s"$k cols x $bits bits exceeds long")
    val terms = for (j <- 0 until k; i <- 0 until bits) yield
      shiftleft(shiftright(cols(j).cast("bigint"), i).bitwiseAND(lit(1L)),
        i * k + j)
    terms.reduce(_ + _) // disjoint bits: + is OR
  }

  /** Write `df` clustered by the Z-order of `cols`: each column is
    * range-bucketed MONOTONICALLY onto [0, 2^bits) from its actual
    * [min, max] (a modulo fold would scatter distant values into one
    * bucket and destroy the very stats this layout exists for), the
    * buckets interleave through [[zValue]], and the rows
    * range-partition + sort on the z-value into parquet. Files then
    * hold tight min/max ranges on EVERY interleaved dimension at once,
    * so a box predicate on any subset of them prunes files/row-groups
    * via plain parquet stats — multi-dimensional data skipping with
    * zero read-side machinery. Linear sort gives that for the leading
    * column only; at 100 TB the difference is reading a few files vs
    * all of them for the second-dimension query. Costs one extra
    * min/max aggregation pass (at scale: read the stats from table
    * metadata instead).
    */
  def writeZOrdered(df: DataFrame, cols: Seq[String], bits: Int,
      nFiles: Int, path: String): Unit = {
    val statsRow = df.select(cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))): _*)
      .head()
    val nBuckets = 1L << bits
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      // empty input or an all-NULL cluster column yields NULL min/max
      // (a global agg always returns one row) — treat it like a
      // zero-span column: everything lands in bucket 0
      if (statsRow.isNullAt(2 * i) || statsRow.isNullAt(2 * i + 1)) lit(0L)
      else {
        val mn = statsRow.getDouble(2 * i)
        val span = statsRow.getDouble(2 * i + 1) - mn
        if (span <= 0) lit(0L)
        else least(lit(nBuckets - 1),
          floor((col(c).cast("double") - lit(mn)) * lit(nBuckets.toDouble) /
            lit(span)).cast("bigint"))
      }
    }
    df.withColumn("__z", zValue(scaled, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
