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
}
