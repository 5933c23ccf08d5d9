package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus build, composed from the
  * single-purpose operators: one call from raw documents (plus an
  * optional held-out benchmark set) to packed training sequences.
  * Every stage is exactly the operator the query registry
  * oracle-checks in isolation — the composition adds ordering, not
  * new semantics.
  *
  * Stage order is the scale order:
  *  1. [[Curate.curate]] — stateless language/quality filters BEFORE
  *     anything shuffles, then exact dedup (the one curate exchange
  *     carries only filter survivors);
  *  2. [[Dedup.minhashLSH]] — near-dup mining over the already-curated
  *     set (each pair keeps its smaller id);
  *  3. [[Curate.decontaminate]] — benchmark n-gram overlap, benchmark
  *     side broadcast;
  *  4. [[Sampling.packSequences]] — shard-parallel token packing of
  *     whatever survived.
  */
object Pipelines {
  /** All artifacts of a corpus build — the kept corpus plus the audit
    * trails (what near-dup pairs collapsed, what hit the benchmark),
    * because a pipeline that discards its exclusion evidence can't be
    * audited.
    */
  final case class CorpusBuild(
      corpus: DataFrame,
      packs: DataFrame,
      nearDupPairs: DataFrame,
      contaminated: Option[DataFrame],
      private val cachedIntermediates: Seq[DataFrame] = Nil) {
    /** Release the pipeline's persisted fan-out intermediates once the
      * outputs are materialized — long-lived sessions building corpora
      * repeatedly must not accrue cached plans.
      */
    def unpersistIntermediates(): Unit =
      cachedIntermediates.foreach(_.unpersist())
  }

  def buildTrainingCorpus(docs: DataFrame, idCol: String, textCol: String,
      bench: Option[DataFrame] = None, benchId: String = "bench_id",
      benchText: String = "text",
      keepLangs: Seq[String] = Seq("en"), minQuality: Double = 0.3,
      dedupThreshold: Double = 0.6, contaminationN: Int = 13,
      packBudget: Long = 2048, packShards: Int = 64): CorpusBuild = {
    // 1. curate (keeps the smallest id of each exact-duplicate group);
    //    re-join to the raw docs because later stages need the text.
    //    kept fans out to EVERY later stage (near-dup mining, the
    //    anti-join, decontamination, packing) — persist it or the
    //    curate window recomputes once per consumer
    val curated = Curate.curate(docs, idCol, textCol, keepLangs, minQuality)
    val kept = docs.join(curated.select(col(idCol)), Seq(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 2. near-dup pairs on the curated set; the larger id of each
    //    verified pair drops
    val nearDups = Dedup.minhashLSH(kept, idCol, textCol,
      threshold = dedupThreshold)
    val dropIds = nearDups.select(col("id_b").as(idCol)).distinct()
    val afterDedup = kept.join(dropIds, Seq(idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 3. decontamination (optional): any doc sharing n-grams with the
    //    benchmark set leaves the corpus entirely
    val contaminated = bench.map(b => Curate.decontaminate(afterDedup,
      idCol, textCol, b, benchId, benchText, n = contaminationN))
    val clean = contaminated match {
      case Some(c) => afterDedup.join(
        c.select(col("doc_id").as(idCol)).distinct(), Seq(idCol),
        "left_anti")
      case None => afterDedup
    }
    // 4. pack into fixed token budgets, shard-parallel
    val packs = Sampling.packSequences(clean, idCol, textCol, packBudget,
      packShards)
    CorpusBuild(clean, packs, nearDups, contaminated,
      cachedIntermediates = Seq(kept, afterDedup))
  }
}
