package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators for training-data pipelines: the
  * sampling / packing / mixing steps that run AFTER cleaning and dedup.
  * All are expression-only (whole-stage codegen) and deterministic —
  * reproducibility is the point: re-running the pipeline over the same
  * corpus must pick the same documents, in any engine, on any cluster.
  */
object Sampling {
  /** Deterministic document-level sampling by content-independent hash:
    * keep a row iff the first 8 hex chars of md5(id) sort below the
    * threshold — `rateToThreshold(0.2)` keeps ~20 %, exactly
    * reproducibly, with no RNG state. The hex-string comparison (rather
    * than parsing the hash to an integer) is portable to any SQL engine
    * verbatim. At 100 TB this is a scan-local filter: no shuffle, no
    * driver coordination, prunes before any downstream exchange.
    */
  def hashSample(df: DataFrame, idCol: String, hexThreshold: String)
      : DataFrame =
    df.withColumn("sample_key",
        substring(md5(col(idCol).cast("string")), 1, 8))
      .filter(col("sample_key") < lit(hexThreshold))

  /** The 8-hex-char prefix threshold that keeps ~`rate` of rows. */
  def rateToThreshold(rate: Double): String =
    f"${(rate * 0xffffffffL).toLong}%08x"

  /** Per-row weighted deterministic sampling: keep a row iff its hash
    * key sorts below the row's OWN weight-derived threshold — documents
    * with weight 0.9 survive ~9× more often than weight 0.1, with no
    * RNG state (quality-weighted corpus downsampling, reproducibly).
    * Both sides of the comparison are 8-hex-char strings: the key is
    * [[hashSample]]'s md5 prefix; the threshold is the weight scaled to
    * the same 32-bit hex space (lower-cased hex, zero-padded), so the
    * comparison is portable to any SQL engine verbatim. Weights clamp
    * to [0, 1]. Scan-local filter: no shuffle, no driver coordination.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column)
      : DataFrame = {
    val w = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    df.withColumn("sample_key",
        substring(md5(col(idCol).cast("string")), 1, 8))
      .withColumn("keep_threshold",
        lpad(lower(hex(floor(w * 4294967295.0).cast("long"))), 8, "0"))
      .filter(col("sample_key") < col("keep_threshold"))
  }

  /** Sequence packing: assign documents to fixed token-budget packs —
    * the approximation used when preparing fixed-length training
    * sequences at corpus scale. Documents pack contiguously in `idCol`
    * order WITHIN a shard (`pack_id = floor(tokens_before / budget)`),
    * so the window is partitioned by shard and never global: shards
    * pack in parallel, the shuffle is one hash exchange on the shard
    * key, and a 1000-executor run packs 1000 shards at once. True
    * bin-packing is sequential by nature; contiguous-by-id packing is
    * the deterministic, restartable form pipelines actually use.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Long, nShards: Int): DataFrame = {
    val toks = size(split(Dedup.normalized(col(textCol)), " ")).cast("long")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
    df.withColumn("n_tokens", toks)
      .withColumn("shard", pmod(col(idCol), lit(nShards)).cast("int"))
      .withColumn("pack_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget))
      .select(col(idCol), col("shard"), col("n_tokens"), col("pack_id"))
  }

  /** Stratified fixed-size sampling: exactly `perGroup` documents per
    * group (fewer when the group is smaller), chosen by content-
    * independent hash order — an unbiased-but-deterministic draw, the
    * per-stratum counterpart of [[hashSample]]'s global rate. Ties
    * break on id, so the selection is total-ordered and reproducible
    * in any engine. One rank window partitioned by the group key: the
    * shuffle carries the group hash, strata sample in parallel.
    */
  def stratifiedSample(df: DataFrame, idCol: String, groupCol: String,
      perGroup: Int): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= perGroup)
  }

  /** Document chunking: split each document into fixed token-budget
    * chunks with `overlap` tokens of context carried between adjacent
    * chunks — the retrieval/training prep step that turns documents
    * into model-sized windows. Chunk k covers tokens
    * [k·(chunk−overlap), k·(chunk−overlap)+chunk); the last chunk may
    * be short, and a doc never emits an all-overlap tail (a chunk must
    * contain at least one NEW token). Expression-only (split +
    * sequence + explode + slice, whole-stage codegen): a scan-local
    * row explosion with no shuffle at any corpus size — the downstream
    * consumer decides how chunks partition.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val step = chunkTokens - overlap
    val toks = split(Dedup.normalized(col(textCol)), " ")
    // ceil((n - overlap) / step) chunks, minimum 1 for any non-empty doc
    val nChunks = greatest(lit(1L),
      ceil((size(toks).cast("long") - overlap).cast("double") / step)
        .cast("long"))
    df.withColumn("__toks", toks)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), nChunks - 1L)))
      .withColumn("chunk_text", concat_ws(" ",
        slice(col("__toks"), (col("chunk_idx") * step + 1L).cast("int"),
          lit(chunkTokens))))
      .withColumn("n_chunk_tokens",
        least(lit(chunkTokens.toLong),
          size(col("__toks")).cast("long") - col("chunk_idx") * step))
      .select(col(idCol), col("chunk_idx"), col("chunk_text"),
        col("n_chunk_tokens"))
  }

  /** Domain/language mixing: keep the top `perGroup` documents per
    * language by quality score (deterministic ties by id) — the
    * stratified selection step that balances a training mix instead of
    * letting one dominant language swamp it. One window per group key;
    * at scale the rank window shuffles once on the group key, and the
    * filter prunes everything below the cut before any later stage.
    */
  def domainMix(df: DataFrame, idCol: String, textCol: String,
      perGroup: Int): DataFrame = {
    val scored = TextAnalysis.langId(
      TextAnalysis.qualityScore(df, textCol), textCol)
    val w = Window.partitionBy("lang_pred")
      .orderBy(col("quality_score").desc, col(idCol).asc)
    scored.withColumn("lang_rank", row_number().over(w))
      .filter(col("lang_rank") <= perGroup)
      .select(col(idCol), col("lang_pred"), col("quality_score"),
        col("lang_rank"))
  }

  /** Content-defined chunking: a chunk boundary opens BEFORE token p
    * when the hash of the `n`-token window ENDING at p-1 sorts under
    * `probHexLt` (first two hex chars of md5; "04" ≈ 1/64 of windows) —
    * Rabin-style splitting where boundaries move WITH the content, so
    * an insertion early in a document only re-chunks its neighborhood
    * instead of shifting every downstream fixed-size chunk (the dedup
    * stability property fixed-budget [[chunkDocuments]] lacks). The
    * md5-prefix test is portable to any SQL engine verbatim.
    * Emits (id, chunk_id, n_tokens, start_pos), chunk ids 1-based,
    * positions 0-based.
    *
    * Scale shape: tokenize + window-gram hashing are scan-local (the
    * gram array is bound once per row); the only shuffle is the
    * per-document cumulative-sum window — partitioned by doc id, never
    * global — and the closing per-chunk aggregation on the same key.
    */
  def cdcChunk(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, probHexLt: String = "04"): DataFrame = {
    val flagged = df
      .withColumn("__toks", Dedup.tokens(col(textCol)))
      .withColumn("__grams", Dedup.shingleArray(col("__toks"), n))
      .select(col(idCol), col("__grams"),
        posexplode(col("__toks")).as(Seq("pos", "tok")))
      .withColumn("__boundary",
        when(col("pos") === 0, 1L)
          .when(col("pos") >= n &&
            substring(md5(element_at(col("__grams"),
              (col("pos") - (n - 1)).cast("int"))), 1, 2) < probHexLt, 1L)
          .otherwise(0L))
    val w = Window.partitionBy(idCol).orderBy("pos")
    flagged
      .withColumn("chunk_id", sum(col("__boundary")).over(w))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_tokens"), min(col("pos")).as("start_pos"))
  }

  /** Leakage-safe train/val/test split: every document inherits its
    * DEDUP CLUSTER's split, so near-duplicates can never straddle the
    * train/test boundary — the contamination vector a plain per-doc
    * hash split leaves wide open (a doc in train and its 0.9-Jaccard
    * twin in test is memorization measured as generalization). The
    * split key is [[hashSample]]'s md5-prefix on the cluster
    * REPRESENTATIVE (the component's min id; singletons represent
    * themselves via the left join's coalesce), thresholded at
    * `trainFrac` / `trainFrac + valFrac` — deterministic, no RNG
    * state, engine-portable verbatim.
    *
    * Scale shape: one broadcast-or-hash left join of ids against the
    * (much smaller) cluster-label table, then a scan-local md5 +
    * threshold compare — the cluster labels are the persisted artifact
    * a 100 TB corpus builds once ([[Dedup.connectedComponents]]) and
    * every split/rebalance reuses.
    *
    * `labels` must be (idCol, comp) rows for CLUSTERED docs only or
    * for all docs; emits (idCol, rep, split_key, split).
    */
  def leakageSafeSplit(ids: DataFrame, idCol: String, labels: DataFrame,
      compCol: String = "comp", trainFrac: Double = 0.8,
      valFrac: Double = 0.1): DataFrame = {
    val trainThr = rateToThreshold(trainFrac)
    val valThr = rateToThreshold(trainFrac + valFrac)
    ids.join(labels.select(col("id").as(idCol), col(compCol)),
        Seq(idCol), "left")
      .withColumn("rep", coalesce(col(compCol), col(idCol)))
      .withColumn("split_key",
        substring(md5(col("rep").cast("string")), 1, 8))
      .withColumn("split",
        when(col("split_key") < trainThr, "train")
          .when(col("split_key") < valThr, "val")
          .otherwise("test"))
      .drop(compCol)
  }

  /** LEAKAGE-SAFE TARGET ENCODING: per (category, fold), the
    * smoothed OUT-OF-FOLD mean of a 0/1 target — the classic
    * high-cardinality categorical feature (category → target rate)
    * computed so a row's own fold never leaks into its encoding, with
    * m-estimate smoothing toward the global prior so rare categories
    * shrink instead of memorizing. Exact integers end-to-end:
    * enc = ((sy_c − sy_cf)·1e6 + m·prior_micro) div (n_c − n_cf + m),
    * all terms non-negative counts, so any engine replays it.
    *
    * Scale shape: one map-side-combined (category, fold) aggregate,
    * a category-total re-aggregate over those (tiny) partials
    * broadcast back, and a 1-row global prior cross-joined — the
    * corpus is scanned once; the encoding table (categories × folds)
    * is the persisted artifact the training job joins back.
    */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      foldCol: String, smoothing: Long = 20L): DataFrame = {
    val d = df.select(col(catCol).as("cat"),
      col(targetCol).cast("long").as("y"),
      col(foldCol).cast("long").as("fold"))
    val cf = d.groupBy("cat", "fold")
      .agg(count(lit(1)).as("n_cf"), sum("y").as("sy_cf"))
    val c = cf.groupBy("cat")
      .agg(sum("n_cf").as("n_c"), sum("sy_cf").as("sy_c"))
    val g = cf.agg(sum("n_cf").as("n_all"), sum("sy_cf").as("sy_all"))
    cf.join(broadcast(c), "cat")
      .crossJoin(broadcast(g))
      .withColumn("prior_micro", expr("sy_all * 1000000L div n_all"))
      .withColumn("enc_micro",
        expr(s"((sy_c - sy_cf) * 1000000L + ${smoothing}L * prior_micro)" +
          s" div (n_c - n_cf + ${smoothing}L)"))
      .select(col("cat").as(catCol), col("fold"), col("n_cf"),
        col("sy_cf"), col("prior_micro"), col("enc_micro"))
  }

  /** Temperature-scaled multinomial MIXING WEIGHTS over a group key —
    * the standard up/down-weighting a multi-domain (or multilingual)
    * training mix applies so head domains stop swamping the tail:
    * w_g ∝ count_g^(1/T). Fixed at T = 2 (the square-root mix), which
    * keeps every step EXACT: sqrt is correctly rounded by IEEE-754 in
    * every engine (unlike pow/exp, which are libm-dependent), the
    * per-group raw weight floors onto the integer nano grid, the
    * denominator is then an exact integer SUM of those nanos, and each
    * share is integer micro division. No double ever crosses an
    * accumulation-order boundary.
    *
    * Emits (groupCol, n_docs, raw_nano, share_micro). Scale shape: one
    * map-side-combined count per group and one tiny (n_groups-row)
    * total joined back broadcast — the corpus is scanned once.
    */
  def temperatureWeights(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("raw_nano",
        floor(sqrt(col("n_docs").cast("double")) * 1e9).cast("long"))
    val total = counts.agg(sum(col("raw_nano")).as("total_nano"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_micro",
        expr("raw_nano * 1000000L div total_nano"))
      .select(groupCol, "n_docs", "raw_nano", "share_micro")
  }
}
