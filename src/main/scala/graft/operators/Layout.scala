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

  /** Point-in-interval join — pairs each `points` row with every
    * `intervals` row of the same keys whose [start, end) contains its
    * timestamp — WITHOUT the nested-loop plan a naive
    * `start <= t AND t < end` gets. Intervals are replicated to every
    * time bucket they touch (bucket width = `maxLen`, the declared
    * interval-length bound, so replication ≤ 2 per interval), the
    * join is EQUI on (keys, bucket), and the exact containment
    * predicate filters after. This is the "label every tick with its
    * containing session/regime" join; at 100 TB the bounded
    * replication + one hash shuffle is the whole story. Correctness
    * never depends on `maxLen` — an interval is replicated to EVERY
    * bucket it touches (`sequence(start div w, end div w)`), so longer
    * intervals just replicate more; size the width to the typical
    * interval length. Point columns get prefix `p_`, interval columns
    * `i_`.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], tsCol: String, startCol: String, endCol: String,
      maxLen: Long): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    val p = points.columns.foldLeft(points)((d, c) =>
      d.withColumnRenamed(c, s"p_$c"))
    val i = intervals.columns.foldLeft(intervals)((d, c) =>
      d.withColumnRenamed(c, s"i_$c"))
    val probe = p.withColumn("__bkt", expr(s"p_$tsCol div ${maxLen}L"))
    val build = i.withColumn("__bkt",
      explode(expr(s"sequence(i_$startCol div ${maxLen}L, " +
        s"i_$endCol div ${maxLen}L)")))
    val keyConds = keys.map(k => col(s"p_$k") === col(s"i_$k"))
    val joinCond = (keyConds :+ (probe("__bkt") === build("__bkt")))
      .reduce(_ && _)
    probe.join(build, joinCond)
      .filter(col(s"i_$startCol") <= col(s"p_$tsCol") &&
        col(s"p_$tsCol") < col(s"i_$endCol"))
      .drop("__bkt")
  }

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltSource: String, n: Int): DataFrame = {
    val salted = left.withColumn("__salt", pmod(xxhash64(col(saltSource)), lit(n)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until n).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Bloom bitmap over `dim`'s `key` values as ONE row holding an
    * `array<bigint>` of `bits/64` words — `hashes` positions per key
    * from seeded xxhash64, OR-folded into words by a two-level
    * aggregation (positions dedup map-side, then per-word `bit_or`).
    * Pure integer expressions end to end; the single-row result is the
    * broadcastable form of a dim side too big to broadcast exactly.
    */
  def bloomBitmap(dim: DataFrame, key: String, bits: Int,
      hashes: Int): DataFrame = {
    require(bits >= 64 && Integer.bitCount(bits) == 1,
      s"bits must be a power of two >= 64, got $bits")
    require(hashes >= 1, s"hashes must be positive, got $hashes")
    val words = bits / 64
    dim.select(col(key).as("__k")).distinct()
      .select(explode(array((0 until hashes).map(i =>
        pmod(xxhash64(col("__k"), lit(i)), lit(bits.toLong))): _*)).as("p"))
      .distinct()
      .groupBy(shiftright(col("p"), 6).cast("int").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(p & 63 as int)))").as("bw"))
      .groupBy()
      .agg(map_from_entries(collect_list(struct(col("w"), col("bw"))))
        .as("m"))
      .select(expr(
        s"transform(sequence(0, ${words - 1}), i -> coalesce(m[i], 0L))")
        .as("__bloom"))
  }

  /** Bloom-prefiltered equi-join: the scale pattern for a fact⋈dim where
    * the dim side is too large to broadcast EXACTLY but its bloom bitmap
    * is tiny (2^20 bits = 16 KB regardless of dim row count). Fact rows
    * failing any of the `hashes` bit probes are dropped BEFORE the
    * shuffle — at 100 TB that is the difference between shuffling the
    * whole fact table and shuffling only the (say) 5% that can match.
    * Bloom filters have no false negatives, so the result after the
    * exact join is row-identical to the plain join; false positives only
    * cost a little extra shuffle. Fact and dim key columns must have
    * distinct names (both survive in the output).
    */
  def bloomPrefilterJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, bits: Int = 1 << 20, hashes: Int = 5): DataFrame = {
    val filtered = bloomFilterProbe(fact, factKey,
      bloomBitmap(dim, dimKey, bits, hashes), bits, hashes)
    filtered.join(dim, col(factKey) === dim(dimKey))
  }

  /** The probe half of [[bloomPrefilterJoin]]: keep only `fact` rows
    * whose `factKey` passes every bit test against the (single-row)
    * `bitmap`. Exposed separately so the pruning ratio is testable and
    * so a precomputed bitmap can be reused across queries.
    */
  def bloomFilterProbe(fact: DataFrame, factKey: String, bitmap: DataFrame,
      bits: Int, hashes: Int): DataFrame = {
    val probed = (0 until hashes).foldLeft(
      fact.crossJoin(broadcast(bitmap))) { (d, i) =>
      d.withColumn(s"__h$i",
        pmod(xxhash64(col(factKey), lit(i)), lit(bits.toLong)))
    }
    val cond = (0 until hashes).map(i =>
      // element_at is 1-based; word = h >> 6, bit = h & 63
      expr(s"(shiftright(element_at(__bloom, cast(shiftright(__h$i, 6)" +
        s" as int) + 1), cast(__h$i & 63 as int)) & 1L) = 1L"))
      .reduce(_ && _)
    probed.filter(cond)
      .drop((0 until hashes).map(i => s"__h$i") :+ "__bloom": _*)
  }

  /** Greedy ordered compaction plan: walk each group's files in
    * `orderCol` order, cut a new output bin whenever the running size
    * crosses `targetBytes` — the standard planner for the small-files
    * problem (a 100 TB table accumulating streaming micro-batches reads
    * 100× faster after coalescing to ~target-size files). One window
    * cumsum + one aggregation, all integer arithmetic; bin id =
    * bytes-before `div` target.
    */
  def compactionPlan(files: DataFrame, groupCol: String, orderCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files
      .withColumn("__before",
        coalesce(sum(col(sizeCol).cast("bigint")).over(w), lit(0L)))
      .withColumn("bin", expr(s"__before div ${targetBytes}L"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol).cast("bigint")).as("bytes"),
        min(col(orderCol)).as("first_file"),
        max(col(orderCol)).as("last_file"))
  }

  /** Per-key skew diagnostics: count, share of total, skew factor
    * (count ÷ perfectly-uniform count) and a hot-key flag at
    * `hotFactor`×. This is the query you run BEFORE choosing a salted
    * join or AQE skew hints — one aggregation plus a broadcast of the
    * single-row total. Integer counts; the ratios are one double
    * division each (engine-exact).
    */
  def skewDiagnose(df: DataFrame, keyCol: String,
      hotFactor: Double = 2.0): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("__total"),
      count(lit(1)).as("__keys"))
    counts.crossJoin(broadcast(tot))
      .select(col(keyCol), col("cnt"),
        (col("cnt").cast("double") / col("__total").cast("double"))
          .as("share"),
        (col("cnt").cast("double") * col("__keys").cast("double") /
          col("__total").cast("double")).as("skew"),
        (col("cnt").cast("double") * col("__keys").cast("double") >
          col("__total").cast("double") * lit(hotFactor)).as("is_hot"))
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
