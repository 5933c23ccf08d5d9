package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the standard training-data filter chain
  * (C4/Gopher-style) composed into ONE Spark pipeline — language
  * filter, quality filter, exact dedup, PII accounting + redaction,
  * token accounting. Every stage reuses the corresponding
  * single-purpose operator ([[TextAnalysis.langId]],
  * [[TextAnalysis.qualityScore]], [[Dedup.normalized]],
  * [[TextAnalysis.piiScan]]'s patterns), so the composition cannot
  * drift from the parts.
  *
  * Scale shape: the language/quality filters and PII projection are
  * expression-only (whole-stage codegen, no shuffle) and run BEFORE the
  * dedup shuffle, so the one exchange in the plan — the window over the
  * content hash — carries only surviving docs. At 100 TB that ordering
  * is the difference between shuffling the whole corpus and shuffling
  * the quality-filtered fraction of it.
  */
object Curate {
  /** Benchmark DECONTAMINATION: flag training documents that overlap a
    * held-out benchmark set by shared word n-grams (the standard
    * 13-gram contamination test, n configurable). Returns one row per
    * (doc, benchmark item) with a shared n-gram count ≥ `minShared`
    * and the contaminated fraction of the benchmark item's n-grams.
    *
    * Scale shape: both sides shingle through the same
    * [[Dedup.shingles]] inverted index and meet in ONE equi-join on
    * the shingle — the benchmark side is tiny (thousands of items vs a
    * 100 TB corpus) so Spark broadcasts it and the corpus never
    * shuffles; the per-pair count is a map-side-combined aggregation.
    */
  def decontaminate(docs: DataFrame, docId: String, docText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int = 13, minShared: Long = 1): DataFrame = {
    val docSh = Dedup.shingles(docs, docId, docText, n)
      .toDF("doc_id", "shingle")
    val benchSh = Dedup.shingles(bench, benchId, benchText, n)
      .toDF("bench_id", "shingle")
    val benchSizes = benchSh.groupBy("bench_id")
      .agg(count(lit(1)).as("n_bench_grams"))
    docSh
      .join(broadcast(benchSh), "shingle")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= minShared)
      .join(broadcast(benchSizes), "bench_id")
      .withColumn("contaminated_frac",
        col("shared_grams").cast("double") / col("n_bench_grams"))
      .select("doc_id", "bench_id", "shared_grams", "contaminated_frac")
  }

  /** Bloom-prefiltered decontamination: byte-identical output to
    * [[decontaminate]], with a scan-local Bloom membership test
    * inserted UNDER the equi-join.
    *
    * Why: [[decontaminate]] already broadcasts the benchmark side, but
    * every corpus shingle still flows into the join operator's hash
    * probe. Here the benchmark shingles' k=3 xxhash64 bit positions
    * are OR-ed into an m-bit bitmap (one bounded driver-side collect
    * of the SMALL side — the same rows the join broadcasts anyway,
    * compressed ~64×), embedded as ONE ArrayType(long) literal
    * (128 KiB at the default m=2²⁰), and each corpus shingle tests
    * `all 3 bits set` as a codegen'd scan-local predicate. At 100 TB
    * the overwhelming non-matching majority dies in the scan at the
    * false-positive rate ((k·n/m)³ ≈ 1e-5 per 100k bench shingles)
    * instead of reaching the join; the exact equi-join that follows
    * removes the false positives, so the RESULT is exact — the bloom
    * only prunes, never decides.
    */
  def decontaminateBloom(docs: DataFrame, docId: String, docText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int = 13, minShared: Long = 1, mBits: Int = 1 << 20): DataFrame = {
    require((mBits & (mBits - 1)) == 0 && mBits >= 64,
      s"mBits must be a power of two >= 64, got $mBits")
    val seeds = Seq(1001L, 2002L, 3003L)
    val docSh = Dedup.shingles(docs, docId, docText, n)
      .toDF("doc_id", "shingle")
    val benchSh = Dedup.shingles(bench, benchId, benchText, n)
      .toDF("bench_id", "shingle")
    val benchSizes = benchSh.groupBy("bench_id")
      .agg(count(lit(1)).as("n_bench_grams"))
    // bit positions come from the SAME xxhash64 the probe uses, computed
    // in Spark on the bench side, so driver and executors cannot drift
    val words = new Array[Long](mBits / 64)
    benchSh.select(explode(array(seeds.map(sd =>
        pmod(xxhash64(col("shingle"), lit(sd)), lit(mBits.toLong)))
          .toIndexedSeq: _*)).as("bit"))
      .distinct().collect()
      .foreach { r =>
        val b = r.getLong(0).toInt
        words(b >> 6) |= (1L << (b & 63))
      }
    val bm = typedLit(words.toSeq)
    def probe(sd: Long): Column = {
      val bit = pmod(xxhash64(col("shingle"), lit(sd)), lit(mBits.toLong))
        .cast("int")
      val word = element_at(bm, floor(bit / lit(64)).cast("int") + lit(1))
      call_function("shiftright", word, bit % lit(64))
        .bitwiseAND(lit(1L)) === lit(1L)
    }
    docSh.filter(seeds.map(probe).reduce(_ && _))
      .join(broadcast(benchSh), "shingle")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= minShared)
      .join(broadcast(benchSizes), "bench_id")
      .withColumn("contaminated_frac",
        col("shared_grams").cast("double") / col("n_bench_grams"))
      .select("doc_id", "bench_id", "shared_grams", "contaminated_frac")
  }

  /** The stateless curation prefix shared by [[curate]] and
    * [[graft.streaming.Ingest.curateStream]]: language keep-list +
    * quality threshold filters, then the normalized-content hash
    * `__h` the dedup stage keys on. ONE definition so batch and
    * streaming curation cannot drift.
    */
  def filterChain(df: DataFrame, textCol: String, keepLangs: Seq[String],
      minQuality: Double): DataFrame =
    TextAnalysis.qualityScore(TextAnalysis.langId(df, textCol), textCol)
      .filter(col("lang_pred").isin(keepLangs: _*) &&
        col("quality_score") >= minQuality)
      .withColumn("__h", md5(Dedup.normalized(col(textCol))))

  /** The per-rule Gopher/MassiveText-style quality RULES as boolean
    * pass flags — the per-rule sibling of the combined
    * [[TextAnalysis.qualityScore]]: where the score collapses signals
    * into one number, this keeps each published rule separate so a
    * pipeline can audit WHICH rule kills a document (the attrition
    * table every curation run publishes; cf. the reference's
    * corpus-filter north star, SURVEY §2.9).
    *
    * Every rule is an INTEGER comparison (counts cross-multiplied
    * against ratio bounds, never divided), so the flags replay
    * bit-exactly in any engine. Expression-only → whole-stage codegen,
    * no shuffle: at 100 TB this is a pure scan-local map.
    *
    * Rules (bounds tuned to the synthetic corpus; production swaps
    * constants through the same shape):
    *  - word_count: 5 ≤ words ≤ 1000
    *  - mean_word_len: 3 ≤ (chars-in-words / words) ≤ 10, as
    *    3·words ≤ Σ|w| ≤ 10·words
    *  - symbol_ratio: (#'#' + #'...') / words ≤ 0.1, as 10·symbols ≤ words
    *  - alpha_words: ≥ 80% of words contain a letter, as
    *    5·alpha_words ≥ 4·words
    *  - stopwords: ≥ 2 distinct hits from a fixed 8-stopword list
    */
  def gopherAudit(df: DataFrame, textCol: String): DataFrame = {
    val stops = Seq("the", "a", "of", "to", "and", "in", "is", "it")
    val withToks = df.withColumn("__toks", Dedup.tokens(col(textCol)))
    val nw = size(col("__toks"))
    val charSum = aggregate(transform(col("__toks"), w => length(w)),
      lit(0L), (acc, x) => acc + x)
    val alphaWords = size(filter(col("__toks"), w => w.rlike("[a-z]")))
    val hashCnt = length(col(textCol)) -
      length(regexp_replace(col(textCol), "#", ""))
    val ellipsisCnt = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3
    val stopHits = stops.map(sw =>
      when(array_contains(col("__toks"), sw), 1).otherwise(0))
      .reduce(_ + _)
    withToks
      .withColumn("p_word_count", nw.between(5, 1000))
      .withColumn("p_mean_word_len",
        lit(3L) * nw <= charSum && charSum <= lit(10L) * nw)
      .withColumn("p_symbol_ratio",
        lit(10L) * (hashCnt + ellipsisCnt) <= nw)
      .withColumn("p_alpha_words", lit(5L) * alphaWords >= lit(4L) * nw)
      .withColumn("p_stopwords", stopHits >= 2)
      .drop("__toks")
  }

  /** Curated corpus rows: (id, lang_pred, quality_score, n_chars,
    * n_tokens, n_copies, n_emails, redacted) — one row per distinct
    * surviving document (smallest id wins among exact duplicates;
    * n_copies counts the collapsed group).
    */
  def curate(df: DataFrame, idCol: String, textCol: String,
      keepLangs: Seq[String] = Seq("en"),
      minQuality: Double = 0.3): DataFrame = {
    val kept = filterChain(df, textCol, keepLangs, minQuality)
    val w = Window.partitionBy("__h").orderBy(col(idCol))
    kept
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_copies", count(lit(1)).over(Window.partitionBy("__h")))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("lang_pred"), col("quality_score"),
        col("n_chars"), col("n_tokens"), col("n_copies"),
        size(regexp_extract_all(col(textCol),
          lit(TextAnalysis.emailRe), lit(0))).as("n_emails"),
        regexp_replace(col(textCol), TextAnalysis.emailRe, "<EMAIL>")
          .as("redacted"))
  }
}
