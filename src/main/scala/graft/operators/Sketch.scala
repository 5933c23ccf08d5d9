package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches — the approximate-distinct machinery
  * a 100 TB profile pass runs instead of exact count(DISTINCT), built
  * ENGINE-PORTABLY: hash bits come from md5 hex nibbles (any SQL
  * engine reproduces them — the [[Dedup.simhashPortablePairs]] trick),
  * and every accumulation is exact-integer or fixed-order double, so
  * the oracle gate hash-verifies the SKETCH itself, not just a
  * tolerance band. Spark's own approx_count_distinct gives the same
  * HLL shape non-portably; this one exists to be bit-reproducible
  * across engines and mergeable across partitions/days.
  */
object Sketch {
  /** HyperLogLog registers over `keyCol`: bucket = first 3 md5
    * nibbles (m = 4096 registers), rho = leading-zero count of the
    * next 13 nibbles (52 bits) + 1, register = max rho per bucket.
    * One map-side-combined aggregation, ≤ m output rows — THE
    * mergeable-sketch shape: registers from disjoint corpus slices
    * (days, partitions) merge by the same groupBy-max.
    *
    * The leading-zero count is pure string/CASE logic (count leading
    * '0' nibbles via ltrim, then a 4-way CASE inside the first nonzero
    * nibble) — no bin()/log2 whose formatting or rounding could
    * diverge between engines.
    */
  def hllRegisters(df: DataFrame, keyCol: String): DataFrame =
    hllFromHex(df.select(md5(col(keyCol).cast("string")).as("hex")))

  private[operators] def hllFromHex(hexed: DataFrame): DataFrame = {
    val nib = (i: Int) =>
      expr(s"instr('0123456789abcdef', substring(hex, $i, 1)) - 1")
    hexed
      .withColumn("bucket",
        (nib(1) * 256 + nib(2) * 16 + nib(3)).cast("long"))
      // Scala-API ltrim(col, trimStr): Spark's SQL-string form is the
      // Hive-legacy ltrim(trimStr, str) — reversed args silently trim
      // the wrong operand
      .withColumn("tail", ltrim(substring(col("hex"), 4, 13), "0"))
      .withColumn("rho",
        when(col("tail") === "", lit(53L))
          .otherwise(lit(4L) * (lit(13L) - length(col("tail"))) +
            when(expr("instr('0123456789abcdef', substring(tail, 1, 1)) - 1") >= 8, 0L)
              .when(expr("instr('0123456789abcdef', substring(tail, 1, 1)) - 1") >= 4, 1L)
              .when(expr("instr('0123456789abcdef', substring(tail, 1, 1)) - 1") >= 2, 2L)
              .otherwise(3L) + 1L))
      .groupBy("bucket")
      .agg(max(col("rho")).as("register"))
  }

  /** Fold registers into the HLL estimate row: raw estimate
    * α·m²/Σ2^−M_j (absent buckets contribute 2^0), the linear-counting
    * estimate m·ln(m/V) (the right regime when V = empty registers is
    * large), and the register/empty counts. The indicator sum is
    * exact: each 2^−rho is carried as the INTEGER 2^(53−rho) summed in
    * DECIMAL(38,0) — order-independent, no double-accumulation drift —
    * then one fixed-order double expression finishes. α is the
    * standard 0.7213/(1 + 1.079/m); an oracle must mirror the computed
    * expression, not a folded literal.
    */
  def hllEstimate(registers: DataFrame, m: Int = 4096): DataFrame =
    registers
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr("CAST(power(2.0, 53 - register) AS DECIMAL(38, 0))"))
          .as("scaled"))
      .select(
        lit(m).cast("long").as("m"),
        col("n_buckets"),
        (lit(m.toLong) - col("n_buckets")).as("n_empty"),
        ((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))) *
          lit(m.toDouble) * lit(m.toDouble) /
          ((lit(m.toDouble) - col("n_buckets").cast("double")) +
            col("scaled").cast("double") / lit(9007199254740992.0)))
          .as("est_raw"),
        when(col("n_buckets") < m,
          lit(m.toDouble) *
            log(lit(m.toDouble) /
              (lit(m.toDouble) - col("n_buckets").cast("double"))))
          .as("est_linear"))

  /** Count-min sketch of `keyCol` frequencies: `depth` hash rows of
    * 4096 counters each; row d's bucket for a key is md5 nibbles
    * [3d+1, 3d+3] (12 bits), so depth ≤ 10 independent-enough rows
    * come from ONE md5. The sketch is ≤ depth·4096 rows of exact
    * integer counts — mergeable across slices by (row, bucket) sum,
    * the same shape that makes it a streaming/distributed heavy-hitter
    * counter at 100 TB (the exact per-key groupBy it replaces would
    * shuffle key-cardinality rows; this shuffles ≤ 4096·depth
    * whatever the key space does).
    */
  def countMinSketch(df: DataFrame, keyCol: String,
      depth: Int = 4): DataFrame = {
    require(depth >= 1 && depth <= 10, s"depth must be 1..10, got $depth")
    cmBuckets(df, keyCol, depth)
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a [[countMinSketch]]: for each distinct key
    * in `probes`, min over its `depth` counters — an UPPER bound on
    * the true count (collisions only add). Join shape: the probe side
    * explodes to depth rows and hash-joins the ≤ depth·4096-row sketch
    * (broadcastable at any corpus size), then one min per key.
    */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame,
      keyCol: String, depth: Int = 4): DataFrame =
    cmBuckets(probes.select(col(keyCol)).distinct(), keyCol, depth)
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** 52-bit uniform hash from the first 13 md5 nibbles of `hexExpr` —
    * one SQL string BOTH engines parse identically (no `L` suffixes,
    * no engine-specific casts), so Spark and the DuckDB oracle share
    * it verbatim. The value stays under 2^52, hence exact in a
    * double — the property the KMV estimate's single multiply+divide
    * needs to be bit-stable cross-engine.
    */
  private[graft] def hex52Sql(hexExpr: String): String =
    (0 until 13).map { i =>
      val w = 1L << (4 * (12 - i))
      // per-nibble BIGINT cast: small weights parse as 32-bit INT
      // literals and nibble*weight would overflow INT arithmetic
      s"CAST(instr('0123456789abcdef', substring($hexExpr, ${i + 1}, 1)) - 1 AS BIGINT) * $w"
    }.mkString("(", " + ", ")")

  /** K-minimum-values (bottom-k / Theta-family) distinct sketch per
    * group: every key hashes to a portable 52-bit value and the sketch
    * keeps the k smallest DISTINCT values per group — ≤ k rows per
    * group leave the shuffle whatever the key cardinality does.
    * Unlike HLL registers, bottom-k sketches support SET ALGEBRA:
    * union = bottom-k of concatenated sketches ([[kmvMerge]]),
    * intersection via the inclusion ratio below the union threshold.
    * Emits (groupCols, hv, rn) with rn the ascending hash rank.
    */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // the native codegen twin of hex52Sql — bit-identical values (spec
    // Hex52Spec), one digest per row instead of 13 hex-substring scans
    kmvBottomK(
      df.select(groupCols.map(col) :+
        graft.functions.Hex52(col(keyCol).cast("string")).as("hv"): _*),
      groupCols, k)
  }

  /** Union of per-slice sketches: bottom-k of their concatenation —
    * exactly [[kmvSketch]]'s shape over already-hashed rows, so slice
    * sketches built independently (days, partitions, engines) merge
    * without touching raw data.
    */
  def kmvMerge(sketches: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame =
    kmvBottomK(sketches.select(groupCols.map(col) :+ col("hv"): _*),
      groupCols, k)

  private def kmvBottomK(hashed: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("hv"))
    hashed.distinct()
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Distinct estimate from a [[kmvSketch]]: with fewer than k kept
    * values the sketch IS the distinct set (exact count); at capacity,
    * est = (k−1) · 2^52 / h_k — both branches fixed-order arithmetic
    * on exact integers, so the estimate itself oracle-hashes.
    */
  def kmvEstimate(sketch: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame =
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_keep"), max(col("hv")).as("h_k"))
      .withColumn("est", when(col("n_keep") < k,
          col("n_keep").cast("double"))
        .otherwise(lit((k - 1).toDouble * 4503599627370496.0) /
          col("h_k").cast("double")))

  /** Pairwise set-INTERSECTION estimate from per-group KMV sketches —
    * the set algebra HLL registers cannot do, over sketches alone
    * (audience overlap between segments without rescanning raw data).
    * For each unordered group pair: the union sketch is bottom-k of
    * the two sketches' concatenation; among its members, those present
    * in BOTH input sketches estimate the Jaccard as n_both/n_keep, and
    * intersection ≈ jaccard · union-distinct-estimate. Every count is
    * an exact integer and the estimate is the same fixed-order divide
    * chain as [[kmvEstimate]], so the ESTIMATES oracle-hash exactly.
    *
    * Scale shape: the pair domain is the GROUP domain (segments — a
    * handful by nature; the g_a < g_b self-join is over the distinct
    * group list, never over rows); per pair at most 2k sketch rows
    * enter the rank window. Nothing touches raw keys.
    */
  def kmvOverlap(sketches: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"k must be >= 2, got $k")
    val gs = sketches.select(col(groupCol)).distinct()
    val prs = gs.select(col(groupCol).as("g_a"))
      .join(gs.select(col(groupCol).as("g_b")), col("g_a") < col("g_b"))
    val a = prs.join(
      sketches.select(col(groupCol).as("g_a"), col("hv")), "g_a")
      .select(col("g_a"), col("g_b"), col("hv"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val b = prs.join(
      sketches.select(col(groupCol).as("g_b"), col("hv")), "g_b")
      .select(col("g_a"), col("g_b"), col("hv"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val u = a.unionByName(b)
      .groupBy("g_a", "g_b", "hv")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy("g_a", "g_b").orderBy("hv")
    u.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy("g_a", "g_b")
      .agg(count(lit(1)).as("n_keep"), max(col("hv")).as("h_k"),
        sum((col("in_a") * col("in_b")).cast("long")).as("n_both"))
      .withColumn("union_est", when(col("n_keep") < k,
          col("n_keep").cast("double"))
        .otherwise(lit((k - 1).toDouble * 4503599627370496.0) /
          col("h_k").cast("double")))
      .withColumn("jaccard_est",
        col("n_both").cast("double") / col("n_keep").cast("double"))
      .withColumn("inter_est", col("jaccard_est") * col("union_est"))
  }

  /** Fixed-grid histogram quantile sketch: integer bucket counts over
    * `valueCol div width` — ≤ domain/width rows per group whatever the
    * row count does, mergeable by (group, bucket) sum across
    * slices/streams, quantile error ≤ one grid step. The rank-
    * statistics complement of HLL/count-min/KMV under the same
    * portability discipline: every accumulation is an integer count,
    * so the ESTIMATES oracle-hash exactly (a t-digest's float
    * centroids never would).
    */
  def histSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      width: Long): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    df.groupBy(groupCols.map(col) :+
        expr(s"$valueCol div ${width}L").as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-mille quantile estimates from a [[histSketch]]: the first
    * bucket whose cumulative count reaches q‰ of the group total;
    * the estimate is that bucket's inclusive upper edge. The window
    * runs over the BUCKET domain (bounded by domain/width), never the
    * raw rows.
    */
  def histQuantile(sketch: DataFrame, groupCols: Seq[String],
      width: Long, qPerMille: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    sketch.withColumn("rw", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .select(groupCols.map(col) ++ Seq(col("bucket"), col("rw"),
        col("n"), explode(array(qPerMille.map(lit): _*)).as("q_pm")): _*)
      .filter(col("rw") * 1000 >= col("q_pm") * col("n"))
      .groupBy(groupCols.map(col) :+ col("q_pm"): _*)
      .agg(min(col("bucket")).as("qbucket"))
      .withColumn("est_hi", (col("qbucket") + 1) * width - 1)
  }

  private def cmBuckets(df: DataFrame, keyCol: String,
      depth: Int): DataFrame = {
    val nib = (i: Int) =>
      expr(s"instr('0123456789abcdef', substring(hex, $i, 1)) - 1")
    df.withColumn("hex", md5(col(keyCol).cast("string")))
      .select(col("*"), posexplode(array((0 until depth).map(d =>
        (nib(3 * d + 1) * 256 + nib(3 * d + 2) * 16 + nib(3 * d + 3))
          .cast("long")): _*)).as(Seq("row", "bucket")))
      .withColumn("row", col("row").cast("long"))
      .drop("hex")
  }
}
