package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift primitives shared by the batch drift queries
  * (`q_psi_drift`'s binning + PSI formula) and the streaming monitor
  * ([[graft.streaming.Ingest.psiStream]]): fixed-width binning and a
  * Population-Stability-Index comparison of two binned count frames.
  *
  * Exactness discipline (the `q_psi_drift` / `q_keyness` micro-grid
  * rules): counts stay integer through the joins; the smoothed
  * probabilities are doubles built from identical integer inputs in
  * both engines; each bin's (pA−pB)·ln(pA/pB) term floors onto the
  * integer NANO grid BEFORE the cross-bin sum, so the total is
  * order-free and engine-exact.
  */
object Drift {
  /** Fixed-width histogram counts of `valueCol` per group:
    * (groupCol, bin, cnt), bin = min(nBins−1, ⌊value/binWidth⌋). One
    * map-side-combined aggregation — scan-local at any size.
    */
  def binCounts(df: DataFrame, groupCol: String, valueCol: String,
      binWidth: Double = 50.0, nBins: Int = 10): DataFrame =
    df.select(col(groupCol),
        least(lit(nBins - 1L), floor(col(valueCol) / binWidth))
          .as("bin"))
      .groupBy(groupCol, "bin").agg(count(lit(1)).as("cnt"))

  /** PSI per group between two [[binCounts]] frames — `a` the baseline
    * (typically a small persisted artifact), `b` the candidate. Bins
    * absent on one side count 0 (the full join) and Laplace smoothing
    * (+1 over n+nBins) keeps every log finite. Emits
    * (groupCol, n_a, n_b, psi_nano); the usual alarm line is
    * psi ≥ 0.2 ⇒ psi_nano ≥ 2e8.
    *
    * Scale shape: one full join on (group, bin) — both sides already
    * aggregated to ≤ groups·nBins rows — plus one rollup. The corpus
    * itself is only ever touched by [[binCounts]].
    */
  def psiNano(a: DataFrame, b: DataFrame, groupCol: String,
      nBins: Int = 10): DataFrame = {
    val j = a.select(col(groupCol), col("bin"), col("cnt").as("cnt_a"))
      .join(b.select(col(groupCol), col("bin"), col("cnt").as("cnt_b")),
        Seq(groupCol, "bin"), "full")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
    val tot = j.groupBy(groupCol)
      .agg(sum("cnt_a").as("n_a"), sum("cnt_b").as("n_b"))
    j.join(tot, groupCol)
      .withColumn("pa",
        (col("cnt_a") + 1L).cast("double") /
          (col("n_a") + nBins.toLong).cast("double"))
      .withColumn("pb",
        (col("cnt_b") + 1L).cast("double") /
          (col("n_b") + nBins.toLong).cast("double"))
      .withColumn("term_nano",
        floor((col("pa") - col("pb")) * log(col("pa") / col("pb")) *
          lit(1000000000.0)).cast("long"))
      .groupBy(groupCol)
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(col("term_nano")).as("psi_nano"))
  }

  /** COHEN'S KAPPA between two categorical label columns — the
    * chance-corrected agreement score labeling pipelines use to audit
    * annotator (or metadata-vs-classifier) consistency; raw agreement
    * flatters any skewed label distribution, kappa doesn't. The three
    * sufficient statistics are exact int64 aggregates (n, agreements,
    * Σ_k marginal_a(k)·marginal_b(k)); kappa = (n·agree − Σ)/(n² − Σ)
    * derives from them in ONE fixed-order double expression, so both
    * engines match bit-for-bit. n² − Σ = 0 (both raters constant and
    * identical — chance agreement is total, kappa undefined) pins 0.
    *
    * Returns one row: (n, n_agree, sum_marg_prod, kappa_nano).
    * Scale shape: one scan for the pair counts, two map-side-combined
    * marginal aggregates joined on the (tiny) class domain, three
    * 1-row collects — nothing grows past the class count.
    */
  def cohenKappa(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val pairs = df.select(col(aCol).as("a"), col(bCol).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val head = pairs.agg(count(lit(1)).as("n"),
      coalesce(sum(when(col("a") === col("b"), 1L).otherwise(0L)),
        lit(0L)).as("ag")).head()
    val (n, agree) = (head.getLong(0), head.getLong(1))
    val margRow = pairs.groupBy("a").agg(count(lit(1)).as("ca"))
      .join(pairs.groupBy("b").agg(count(lit(1)).as("cb"))
        .withColumnRenamed("b", "a"), "a")
      .agg(sum(col("ca") * col("cb"))).head()
    val marg = if (margRow.isNullAt(0)) 0L else margRow.getLong(0)
    pairs.unpersist()
    val den = n * n - marg
    val kappaNano =
      if (den == 0L) 0L
      else math.floor((n * agree - marg).toDouble / den.toDouble
        * 1e9).toLong
    import org.apache.spark.sql.types.{StructType, StructField, LongType}
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(n, agree, marg, kappaNano)),
      StructType(Seq(
        StructField("n", LongType, nullable = false),
        StructField("n_agree", LongType, nullable = false),
        StructField("sum_marg_prod", LongType, nullable = false),
        StructField("kappa_nano", LongType, nullable = false))))
  }
}
