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

  /** Volume-weighted average price per tumbling bucket: one hash
    * aggregation (map-side combined). Price×volume products round into
    * a decimal accumulator before summing (order-independent), and the
    * VWAP is ONE double divide of the exact sums — engine-exact.
    *
    * The accumulator is Decimal(38,6), not (18,6): the PRODUCT can reach
    * price×volume magnitudes where 18-digit precision overflows, and
    * under non-ANSI Spark an overflowing cast becomes NULL and silently
    * drops the row from sum_pv. 38 digits leaves ~1e31 of headroom.
    */
  def vwap(df: DataFrame, keys: Seq[String], timeCol: String,
      valueCol: String, volCol: String, width: Long): DataFrame =
    df.withColumn("bkt", expr(s"$timeCol div ${width}L"))
      .groupBy((keys :+ "bkt").map(col): _*)
      .agg(
        sum((col(valueCol) * col(volCol)).cast(DecimalType(38, 6)))
          .cast(DoubleType).as("sum_pv"),
        sum(col(volCol)).as("sum_vol"),
        count(lit(1)).as("n_events"))
      .withColumn("vwap", col("sum_pv") / col("sum_vol").cast(DoubleType))

  /** Exponentially-weighted moving average with α = 1/2 over the last
    * `depth` rows per key (a bounded-lookback EWMA — the recurrence
    * form needs sequential state; the truncated form is the
    * distributed one, and at α = 1/2 the truncation error is 2^-depth).
    * Weights 2^-j are EXACT binary scalings and the term fold order is
    * fixed in the expression, so the value is bit-identical in any
    * engine. Expression-only; one window shuffle on the keys; series
    * heads renormalize over the weights actually present.
    */
  def ewmaHalf(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
      valueCol: String, depth: Int = 8): DataFrame = {
    require(depth >= 1, s"depth must be positive, got $depth")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val terms = (0 until depth).map { j =>
      val x = if (j == 0) col(valueCol) else lag(col(valueCol), j).over(w)
      (x, math.pow(0.5, j))
    }
    val num = terms.map { case (x, wt) =>
      when(x.isNotNull, x * lit(wt)).otherwise(lit(0.0)) }.reduce(_ + _)
    val den = terms.map { case (x, wt) =>
      when(x.isNotNull, lit(wt)).otherwise(lit(0.0)) }.reduce(_ + _)
    df.withColumn("ewma", num / den)
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

  /** Gap-filled per-group time buckets: every bucket between a group's
    * first and last event emits a row, idle buckets as (0, 0.0) — the
    * densification step charting/feature pipelines need (a model that
    * sees only active buckets learns survivor bias). Decimal
    * accumulator for the value sum (engine-exact), long `div` for the
    * bucket (exact at any epoch).
    *
    * Scale shape: two aggregations on the SAME group keys (the second
    * exchange reuses the first's partitioning), a scan-local
    * sequence+explode over the tiny per-group span table for the grid,
    * and one co-partitioned left join — no global sequence, no
    * driver-side calendar.
    */
  def gapFill(df: DataFrame, keys: Seq[String], timeCol: String,
      valueCol: String, bucketNs: Long): DataFrame = {
    val bkt = expr(s"$timeCol div ${bucketNs}L")
    val keyCols = keys.map(col)
    val agg = df.groupBy(keyCols :+ bkt.as("bkt"): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 6))).cast(DoubleType)
          .as("sum_value"))
    val grid = df.groupBy(keyCols: _*)
      .agg(min(bkt).as("__b0"), max(bkt).as("__b1"))
      .select(keyCols :+
        explode(sequence(col("__b0"), col("__b1"))).as("bkt"): _*)
    grid.join(agg, keys :+ "bkt", "left")
      .select(keyCols ++ Seq(col("bkt"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value")): _*)
  }

  /** Rolling lag-1 autocorrelation over the last `window` (x, lag(x))
    * pairs per series — the momentum/mean-reversion signal of a tick
    * pipeline, with ENGINEERED exactness per the q_stats_moments rule:
    * the five moment sums accumulate in DECIMAL over the frame
    * (order-independent), the Pearson formula is one fixed double
    * expression over them, and degenerate frames (variance ≤ 0, or
    * fewer than `window` complete pairs) emit NULL on every engine.
    * Scale shape: ONE window shuffle on the series keys; the sliding
    * frame sums are incremental, not per-row rescans.
    */
  def rollingAutoCorr(df: DataFrame, keys: Seq[String],
      orderCols: Seq[String], valueCol: String, window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val wf = w.rowsBetween(-(window - 1), 0)
    val d6 = (c: Column) => c.cast(DecimalType(18, 6))
    val base = df.withColumn("__y", lag(col(valueCol), 1).over(w))
    // pair-complete sums: rows whose lag is null contribute nothing
    val px = when(col("__y").isNotNull, d6(col(valueCol)))
    val py = when(col("__y").isNotNull, d6(col("__y")))
    val n = lit(window.toDouble)
    val sums = base
      .withColumn("__ny", count(col("__y")).over(wf))
      .withColumn("__sx", sum(px).over(wf).cast(DoubleType))
      .withColumn("__sxx", sum(px * px).over(wf).cast(DoubleType))
      .withColumn("__sy", sum(py).over(wf).cast(DoubleType))
      .withColumn("__syy", sum(py * py).over(wf).cast(DoubleType))
      .withColumn("__sxy", sum(px * py).over(wf).cast(DoubleType))
    val vx = n * col("__sxx") - col("__sx") * col("__sx")
    val vy = n * col("__syy") - col("__sy") * col("__sy")
    sums
      .withColumn("autocorr",
        when(col("__ny") === window && vx > 0.0 && vy > 0.0,
          (n * col("__sxy") - col("__sx") * col("__sy")) / sqrt(vx * vy)))
      .drop("__y", "__ny", "__sx", "__sxx", "__sy", "__syy", "__sxy")
  }

  /** SCD2 run-compression of a per-key state stream: collapse
    * consecutive equal states into validity intervals
    * (state, valid_from, valid_to, n_obs) — the slowly-changing-
    * dimension build a CDC pipeline runs over every snapshot/update
    * feed. valid_to is the next interval's valid_from (NULL = still
    * current); n_obs counts the collapsed observations.
    *
    * Scale shape: one window shuffle on the keys (change flags + the
    * running segment id share it), one map-side-combined aggregation
    * on (keys, segment), and the valid_to lead rides the same keyed
    * partitioning — nothing quadratic, no self-join. All outputs are
    * exact integers/originals, engine-replayable.
    */
  def scd2(df: DataFrame, keys: Seq[String], timeCol: String,
      tieBreak: String, stateCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*)
      .orderBy(col(timeCol), col(tieBreak))
    val seg = df
      .withColumn("__chg",
        when(lag(col(stateCol), 1).over(w).isNull ||
          col(stateCol) =!= lag(col(stateCol), 1).over(w), 1L)
          .otherwise(0L))
      .withColumn("__seg", sum(col("__chg")).over(w))
      .groupBy(keyCols :+ col("__seg").as("seg"): _*)
      .agg(min(col(stateCol)).as("state"), // constant within a segment
        min(col(timeCol)).as("valid_from"),
        count(lit(1)).as("n_obs"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*).orderBy(col("valid_from"), col("seg"))
    seg.withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
  }

  /** Time-weighted average price (TWAP) per (keys, tumbling bucket):
    * each tick's value holds from its timestamp until the next tick in
    * the bucket (the last tick holds to the bucket edge), so
    * twap = Σ vᵢ·(tᵢ₊₁ − tᵢ) / Σ (tᵢ₊₁ − tᵢ) — the resample that
    * weights by HOLDING TIME instead of volume (VWAP's dual). The gap
    * before the bucket's first tick carries no value (standard form).
    *
    * ENGINEERED exactness: values are scaled to integer `centScale`ths
    * first — round(v·centScale) of an identical double is
    * rule-identical across engines because generated prices sit within
    * 1e-13 of the grid, never near a .5 boundary — so the weighted
    * sums are exact BIGINTs (order-independent), and the final quotient
    * is one fixed-order double expression. Zero-duration ticks (equal
    * timestamps) carry zero weight and drop out exactly.
    *
    * Scale shape: ONE window shuffle on (keys, bucket) for the lead,
    * then one map-side-combined aggregation — linear, like ohlcv.
    */
  def twap(df: DataFrame, keys: Seq[String], timeCol: String,
      valueCol: String, tieBreak: String, width: Long,
      centScale: Long = 100L): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val keyCols = keys.map(col)
    val bucketed = df.withColumn("__b", expr(s"`$timeCol` div ${width}L"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols :+ col("__b"): _*)
      .orderBy(col(timeCol), col(tieBreak))
    bucketed
      .withColumn("__next",
        coalesce(lead(col(timeCol), 1).over(w),
          (col("__b") + 1L) * width))
      .withColumn("__w", col("__next") - col(timeCol))
      .withColumn("__c",
        round(col(valueCol) * centScale, 0).cast("long"))
      .groupBy(keyCols :+ col("__b").as("bucket"): _*)
      .agg(count(lit(1)).as("n_ticks"),
        sum(col("__w")).as("span"),
        ((sum(col("__c") * col("__w")).cast(DoubleType) /
          lit(centScale.toDouble)) /
          sum(col("__w")).cast(DoubleType)).as("twap"))
  }

  /** First-order Markov transition statistics over per-key ordered
    * state sequences: count every (prev_state → state) step and its
    * conditional probability p(cur | prev) = c(prev,cur) / c(prev,·).
    * The probability is ONE double division over two exact integer
    * counts — engine-exact. The first event of each key has no
    * predecessor and contributes no step.
    *
    * Scale shape: one window shuffle on the keys for the lag, then one
    * map-side-combined count on (prev, cur) — state-pair cardinality,
    * not row cardinality — and a broadcast-sized join against the
    * per-prev totals (states² rows at most).
    */
  def transitions(df: DataFrame, keys: Seq[String],
      orderCols: Seq[String], stateCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val steps = df
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev"), col(stateCol).as("cur"))
      .agg(count(lit(1)).as("n"))
    val totals = steps.groupBy("prev").agg(sum(col("n")).as("__tot"))
    steps.join(broadcast(totals), "prev")
      .select(col("prev"), col("cur"), col("n"),
        (col("n").cast(DoubleType) / col("__tot").cast(DoubleType))
          .as("p"))
  }

  /** Interval-overlap (concurrency) profile per series, by sweep line:
    * each interval [start, end) contributes a +1 boundary at start and
    * a −1 at end; a running sum over boundaries ordered (time, delta,
    * tiebreak) yields the number of concurrently-open intervals after
    * each boundary. Ends sort before starts at equal times (delta −1 <
    * +1), so touching intervals do not overlap. The classic O(n log n)
    * sweep as ONE union + ONE keyed window — no interval self-join
    * (which is quadratic per key at 100 TB).
    */
  def concurrency(df: DataFrame, keys: Seq[String], startCol: String,
      endCol: String, tieBreak: String): DataFrame = {
    val keyCols = keys.map(col)
    val bounds = df.select(keyCols ++ Seq(col(startCol).as("t"),
        lit(1L).as("delta"), col(tieBreak).as("tie")): _*)
      .unionAll(df.select(keyCols ++ Seq(col(endCol).as("t"),
        lit(-1L).as("delta"), col(tieBreak).as("tie")): _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*)
      .orderBy(col("t"), col("delta"), col("tie"))
    bounds.withColumn("active", sum(col("delta")).over(w))
  }

  /** Global running total WITHOUT a global window. An empty-partition
    * window moves every row to one task — the straggler QueriesSpec's
    * registry-wide guard exists to ban. Instead, a three-level prefix
    * sum: rows cumulate inside fixed-width blocks of the order key
    * (window partitioned by block — ≤ `block` rows per task at ANY data
    * scale), block totals cumulate within super-blocks, super-block
    * totals cumulate within super²-blocks (with the carry chained down
    * so super-block edges are exact), and per-block offsets join back
    * by equi key. Three bounded windows + one broadcast join replace
    * the unbounded global sort. Exact while the order-key span stays
    * under block × superBlock² units (defaults: 32 × 4096² days ≈ 1.5M
    * years of daily keys) — a wall-clock bound, not a data-size bound;
    * raise the knobs for denser keys.
    *
    * @param orderCol unique LONG ordering key (e.g. epoch day)
    * @param valueCol LONG value to cumulate
    * @param out      name of the emitted running-total column
    */
  def boundedRunningSum(df: DataFrame, orderCol: String, valueCol: String,
      out: String, block: Long = 32L, superBlock: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withBlk = df.withColumn("__blk", expr(s"$orderCol div ${block}L"))
    val wIn = Window.partitionBy("__blk").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSup = Window.partitionBy("__sblk").orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTop = Window.partitionBy(expr(s"__sblk div ${superBlock}L"))
      .orderBy(col("__sblk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blkTotals = withBlk.groupBy("__blk")
      .agg(sum(col(valueCol)).as("__tot"))
      .withColumn("__sblk", expr(s"__blk div ${superBlock}L"))
    val supOffsets = blkTotals.groupBy("__sblk")
      .agg(sum(col("__tot")).as("__stot"))
      .withColumn("__soff", sum(col("__stot")).over(wTop) - col("__stot"))
      .select("__sblk", "__soff")
    val offsets = blkTotals
      .withColumn("__cumb", sum(col("__tot")).over(wSup))
      .join(broadcast(supOffsets), "__sblk")
      .withColumn("__off", col("__soff") + col("__cumb") - col("__tot"))
      .select("__blk", "__off")
    withBlk.withColumn("__cum_in", sum(col(valueCol)).over(wIn))
      .join(broadcast(offsets), "__blk")
      .withColumn(out, col("__off") + col("__cum_in"))
      .drop("__blk", "__cum_in", "__off")
  }

  /** Time-series DOWNSAMPLING by effective triangle area (the
    * one-bucket variant of Steinarsson's largest-triangle family —
    * LTOB): per series, each interior point scores twice the area of
    * the triangle it forms with its immediate neighbors (a point on
    * the straight line between its neighbors scores 0 and can be
    * dropped without changing the drawn shape); each fixed-size bucket
    * keeps its highest-scoring point (min-position tiebreak), and
    * series endpoints always survive. The LTTB variant ranks against
    * the PREVIOUSLY SELECTED point — a sequential dependency no
    * parallel engine should buy; one-bucket scores depend only on
    * lag/lead, so the whole pass is one partitioned sort.
    *
    * INTEGER-exact: positions are the per-series rank (not raw epoch
    * nanos — keeps the cross products far from overflow), values ride
    * an integer grid, and 2·area = |x₋(y−y₊) + x(y₊−y₋) + x₊(y₋−y)|
    * is pure BIGINT arithmetic.
    *
    * @param seriesCols partition key of each series
    * @param orderCols  total order within a series
    * @param valueCol   LONG value column (pre-gridded)
    * @param bucketSize points per bucket (keeps ~1/bucketSize)
    */
  def downsampleEffectiveArea(df: DataFrame, seriesCols: Seq[String],
      orderCols: Seq[String], valueCol: String,
      bucketSize: Int): DataFrame = {
    require(bucketSize >= 1, s"bucketSize must be positive, got $bucketSize")
    val Window = org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val scored = df
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("__yp", lag(col(valueCol), 1).over(w))
      .withColumn("__yn", lead(col(valueCol), 1).over(w))
      .withColumn("__xp", col("pos") - 1)
      .withColumn("__xn", col("pos") + 1)
      .withColumn("area2",
        abs(col("__xp") * (col(valueCol) - col("__yn")) +
          col("pos") * (col("__yn") - col("__yp")) +
          col("__xn") * (col("__yp") - col(valueCol))))
      .withColumn("__bucket", expr(s"(pos - 1) div $bucketSize"))
    // endpoints (no neighbor on one side) always survive; interior
    // points compete within their bucket on (area2 desc, pos asc)
    val outCols = seriesCols.map(col) :+ col("pos") :+ col(valueCol) :+
      col("area2")
    val endpoints = scored
      .filter(col("__yp").isNull || col("__yn").isNull)
      .select(outCols: _*)
    val wB = Window
      .partitionBy((seriesCols.map(col) :+ col("__bucket")): _*)
      .orderBy(col("area2").desc, col("pos").asc)
    val interior = scored
      .filter(col("__yp").isNotNull && col("__yn").isNotNull)
      .withColumn("__rk", row_number().over(wB))
      .filter(col("__rk") === 1)
      .select(outCols: _*)
    endpoints.union(interior)
  }
}
