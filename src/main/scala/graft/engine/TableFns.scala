package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Drift, Graph, Resample, Sampling,
  TextAnalysis}

/** Table-valued functions: the SQL-dialect gateway to the library's
  * pipeline operators. The reference's select grammar stops at one
  * closed function class (the adj family, reference parser.go:12);
  * this is the extension surface SURVEY §2.9 promises in its place —
  * a curated set of pipeline operators becomes wire-addressable, e.g.
  * `select * from minhash_pairs('db.docs', 'doc_id', 'text', 0.5)`,
  * runnable over BSON and JSON connections, prepared and
  * placeholder-bound like any other statement.
  *
  * Each function's first argument is the engine table reference
  * (`'db.tbl'` or `'tbl'` against the connection's current db); the
  * engine resolves it through the catalog and the caller's READ
  * permission before any plan is built (the same at-resolve gate the
  * reference applies, reference query.go:60-75). The remaining
  * arguments parameterize the operator. The returned plan is exactly
  * what the library API builds — distributed, shuffle-shaped for
  * scale — so the wire surface adds routing, not a second
  * implementation.
  */
object TableFns {
  /** `fn(engineTableDf, boundArgsAfterTableRef)` → result plan. */
  final case class FnDef(usage: String, arity: Range,
      apply: (DataFrame, Seq[Any]) => DataFrame)

  private def argStr(fn: String, args: Seq[Any], i: Int): String =
    args(i) match {
      case s: String => s
      case other =>
        throw OtError(s"$fn: argument ${i + 2} must be a string, got $other")
    }

  private def argNum(fn: String, args: Seq[Any], i: Int): Double =
    args(i) match {
      case d: Double => d
      case l: Long => l.toDouble
      case i2: Int => i2.toDouble
      case other =>
        throw OtError(s"$fn: argument ${i + 2} must be a number, got $other")
    }

  private def argInt(fn: String, args: Seq[Any], i: Int): Long =
    args(i) match {
      case l: Long => l
      case i2: Int => i2.toLong
      case other =>
        throw OtError(
          s"$fn: argument ${i + 2} must be an integer, got $other")
    }

  private def requireCol(fn: String, df: DataFrame, c: String): Unit =
    if (!df.columns.contains(c))
      throw OtError(s"$fn: no column $c in table")

  /** Timestamp columns arrive as TimestampType from the catalog; the
    * numeric resample bucketing wants a long axis — epoch micros.
    */
  private def numericTime(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        df.withColumn(c, unix_micros(col(c)))
      case _ => df
    }

  val registry: Map[String, FnDef] = Map(
    // near-duplicate pairs, exact-Jaccard-verified — the library's
    // banded MinHash LSH plan (operators/Dedup.scala)
    "minhash_pairs" -> FnDef(
      "minhash_pairs('db.tbl', 'id_col', 'text_col', threshold)",
      4 to 4,
      (df, a) => {
        val (id, text) = (argStr("minhash_pairs", a, 1),
          argStr("minhash_pairs", a, 2))
        requireCol("minhash_pairs", df, id)
        requireCol("minhash_pairs", df, text)
        val th = argNum("minhash_pairs", a, 3)
        if (th <= 0.0 || th > 1.0)
          throw OtError("minhash_pairs: threshold must be in (0, 1]")
        Dedup.minhashLSH(df, id, text, threshold = th)
          .orderBy("id_a", "id_b")
      }),
    // BM25 relevance of every document against a query string
    "bm25_scores" -> FnDef(
      "bm25_scores('db.tbl', 'id_col', 'text_col', 'query terms')",
      4 to 4,
      (df, a) => {
        val (id, text) = (argStr("bm25_scores", a, 1),
          argStr("bm25_scores", a, 2))
        requireCol("bm25_scores", df, id)
        requireCol("bm25_scores", df, text)
        val terms = argStr("bm25_scores", a, 3).trim.toLowerCase
          .split("\\s+").toSeq.filter(_.nonEmpty)
        if (terms.isEmpty)
          throw OtError("bm25_scores: empty query")
        TextAnalysis.bm25(df, id, text, terms).orderBy(id)
      }),
    // per-row text-quality metrics + composite score
    "quality_score" -> FnDef(
      "quality_score('db.tbl', 'text_col')",
      2 to 2,
      (df, a) => {
        val text = argStr("quality_score", a, 1)
        requireCol("quality_score", df, text)
        TextAnalysis.qualityScore(df, text)
      }),
    // near-duplicate CLUSTER LABELS: the minhash LSH pair mine plus
    // the min-label connected-components fixpoint — the wire entry
    // point for "which docs are copies of which" (round-10 verdict
    // item 6: the first pipeline call a dedup user makes)
    "dedup_components" -> FnDef(
      "dedup_components('db.tbl', 'id_col', 'text_col', threshold)",
      4 to 4,
      (df, a) => {
        val (id, text) = (argStr("dedup_components", a, 1),
          argStr("dedup_components", a, 2))
        requireCol("dedup_components", df, id)
        requireCol("dedup_components", df, text)
        val th = argNum("dedup_components", a, 3)
        if (th <= 0.0 || th > 1.0)
          throw OtError("dedup_components: threshold must be in (0, 1]")
        val pairs = Dedup.minhashLSH(df, id, text, threshold = th)
          .select("id_a", "id_b")
        Dedup.connectedComponents(pairs, "id_a", "id_b").orderBy("id")
      }),
    // per-row PII counts + email-redacted text — the audit scan a
    // curation pipeline runs before anything ships
    "pii_scan" -> FnDef(
      "pii_scan('db.tbl', 'id_col', 'text_col')",
      3 to 3,
      (df, a) => {
        val (id, text) = (argStr("pii_scan", a, 1),
          argStr("pii_scan", a, 2))
        requireCol("pii_scan", df, id)
        requireCol("pii_scan", df, text)
        TextAnalysis.piiScan(df, id, text).orderBy(id)
      }),
    // deterministic hash sample: keep ~rate of rows, reproducibly,
    // scan-local (no shuffle) — the "give me 1% of the table" call
    "sample_hash" -> FnDef(
      "sample_hash('db.tbl', 'id_col', rate)",
      3 to 3,
      (df, a) => {
        val id = argStr("sample_hash", a, 1)
        requireCol("sample_hash", df, id)
        val rate = argNum("sample_hash", a, 2)
        if (rate <= 0.0 || rate > 1.0)
          throw OtError("sample_hash: rate must be in (0, 1]")
        Sampling.hashSample(df, id, Sampling.rateToThreshold(rate))
      }),
    // per-slice lexicon profile: vocab, token mass, hapax share,
    // type-token ratio — the organic-vs-templated corpus read
    "hapax_stats" -> FnDef(
      "hapax_stats('db.tbl', 'text_col', 'group_col')",
      3 to 3,
      (df, a) => {
        val (text, grp) = (argStr("hapax_stats", a, 1),
          argStr("hapax_stats", a, 2))
        requireCol("hapax_stats", df, text)
        requireCol("hapax_stats", df, grp)
        TextAnalysis.hapaxStats(df, text, grp)
      }),
    // pairwise vocabulary-overlap grid between slices
    "vocab_jaccard" -> FnDef(
      "vocab_jaccard('db.tbl', 'text_col', 'group_col')",
      3 to 3,
      (df, a) => {
        val (text, grp) = (argStr("vocab_jaccard", a, 1),
          argStr("vocab_jaccard", a, 2))
        requireCol("vocab_jaccard", df, text)
        requireCol("vocab_jaccard", df, grp)
        TextAnalysis.vocabJaccard(df, text, grp)
      }),
    // concentration audit of a mass column (spend per user, tokens
    // per domain): one row (n, total, gini_nano)
    "gini" -> FnDef(
      "gini('db.tbl', 'id_col', 'value_col')",
      3 to 3,
      (df, a) => {
        val (id, v) = (argStr("gini", a, 1), argStr("gini", a, 2))
        requireCol("gini", df, id)
        requireCol("gini", df, v)
        Drift.giniNano(df, id, v)
      }),
    // one-way ANOVA F across a categorical column's groups — the
    // parametric mean-separation audit (operators/Drift.scala)
    "anova_f" -> FnDef(
      "anova_f('db.tbl', 'group_col', 'value_col')",
      3 to 3,
      (df, a) => {
        val (g, v) = (argStr("anova_f", a, 1), argStr("anova_f", a, 2))
        requireCol("anova_f", df, g)
        requireCol("anova_f", df, v)
        Drift.anovaFNano(df, g, v)
      }),
    // Wilcoxon signed-rank over a paired difference column — the
    // matched-pairs before/after shift test (operators/Drift.scala)
    "wilcoxon" -> FnDef(
      "wilcoxon('db.tbl', 'diff_col')",
      2 to 2,
      (df, a) => {
        val d = argStr("wilcoxon", a, 1)
        requireCol("wilcoxon", df, d)
        Drift.wilcoxonNano(df, d)
      }),
    // Chao1 + Good–Turing vocabulary richness per group — the
    // corpus-coverage planning read (operators/TextAnalysis.scala)
    "vocab_richness" -> FnDef(
      "vocab_richness('db.tbl', 'text_col', 'group_col')",
      3 to 3,
      (df, a) => {
        val (t, g) = (argStr("vocab_richness", a, 1),
          argStr("vocab_richness", a, 2))
        requireCol("vocab_richness", df, t)
        requireCol("vocab_richness", df, g)
        TextAnalysis.vocabRichness(df, t, g)
      }),
    // walk-counting influence over an edge table, Δ_in-attenuated
    "katz_centrality" -> FnDef(
      "katz_centrality('db.tbl', 'src_col', 'dst_col', rounds)",
      4 to 4,
      (df, a) => {
        val (src, dst) = (argStr("katz_centrality", a, 1),
          argStr("katz_centrality", a, 2))
        requireCol("katz_centrality", df, src)
        requireCol("katz_centrality", df, dst)
        val rounds = argInt("katz_centrality", a, 3)
        if (rounds <= 0 || rounds > 16)
          throw OtError("katz_centrality: rounds must be in 1..16")
        Graph.katzCentrality(df, src, dst, rounds.toInt).orderBy("id")
      }),
    // unigram-LM (SentencePiece-style) tokenizer training: Viterbi
    // hard-EM over the ≤2-char piece inventory, trained inventory
    // back over the wire (round-12; TextAnalysis.unigramLmTrain)
    "unigram_lm" -> FnDef(
      "unigram_lm('db.tbl', 'text_col', rounds)",
      3 to 3,
      (df, a) => {
        val text = argStr("unigram_lm", a, 1)
        requireCol("unigram_lm", df, text)
        val rounds = argInt("unigram_lm", a, 2)
        if (rounds <= 0 || rounds > 8)
          throw OtError("unigram_lm: rounds must be in 1..8")
        TextAnalysis.unigramLmTrain(df, text, rounds.toInt)
      }),
    // OHLCV bars from a (key, time, value) event table; width in the
    // time column's own units (epoch micros for timestamp columns)
    "resample_ohlcv" -> FnDef(
      "resample_ohlcv('db.tbl', 'key_col', 'time_col', 'value_col', width)",
      5 to 5,
      (df, a) => {
        val (key, tm, v) = (argStr("resample_ohlcv", a, 1),
          argStr("resample_ohlcv", a, 2), argStr("resample_ohlcv", a, 3))
        Seq(key, tm, v).foreach(requireCol("resample_ohlcv", df, _))
        val width = argInt("resample_ohlcv", a, 4)
        if (width <= 0)
          throw OtError("resample_ohlcv: width must be positive")
        Resample.ohlcv(numericTime(df, tm), Seq(key), tm, v,
            tieBreak = tm, width = width)
          .orderBy(key, "bkt")
      }))
}
