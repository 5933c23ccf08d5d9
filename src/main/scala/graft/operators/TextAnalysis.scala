package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All
  * expression-only (codegen'd); deterministic integer counts feed the
  * double arithmetic so results are engine-exact.
  */
object TextAnalysis {
  /** Tiny per-language stopword profiles for the n-gram/stopword langid
    * heuristic (public common-word lists).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "ich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "这", "他"))

  private def toks(text: Column): Column =
    split(Dedup.normalized(text), " ")

  /** Stopword-overlap language ID: argmax over per-language hit ratios;
    * "und" (undetermined) when nothing matches.
    */
  def langId(df: DataFrame, textCol: String,
      outCol: String = "lang_pred"): DataFrame = {
    val t = toks(col(textCol))
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(array_intersect(t, array(words.map(lit): _*)))
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    // argmax by (hits, lang) struct ordering; ties → lexicographically
    // greatest lang among equals, deterministic
    val best = greatest(scored: _*)
    df.withColumn(outCol,
      when(best.getField("hits") > 0, best.getField("lang")).otherwise("und"))
  }

  /** Quality metrics + a composite score in [0,1]. Integer counts ⇒
    * deterministic ratios across engines.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nAlpha = length(regexp_replace(t, "[^a-zA-Z]", ""))
    val nDigit = length(regexp_replace(t, "[^0-9]", ""))
    val nPunct = length(regexp_replace(t, "[^.,;:!?]", ""))
    val nTokens = size(split(trim(t), "\\s+"))
    val alphaRatio = nAlpha.cast(DoubleType) / greatest(nChars, lit(1)).cast(DoubleType)
    val digitRatio = nDigit.cast(DoubleType) / greatest(nChars, lit(1)).cast(DoubleType)
    val punctRatio = nPunct.cast(DoubleType) / greatest(nChars, lit(1)).cast(DoubleType)
    val avgTokLen = nChars.cast(DoubleType) / greatest(nTokens, lit(1)).cast(DoubleType)
    // length sweet spot: 1 inside [20, 20000] chars, 0 outside
    val lenOk = when(nChars.between(20, 20000), 1.0).otherwise(0.0)
    val avgOk = when(avgTokLen.between(2.0, 12.0), 1.0).otherwise(0.0)
    df.withColumn("n_chars", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("alpha_ratio", alphaRatio)
      .withColumn("digit_ratio", digitRatio)
      .withColumn("punct_ratio", punctRatio)
      .withColumn("avg_token_len", avgTokLen)
      .withColumn("quality_score",
        (alphaRatio * 0.5 + lenOk * 0.25 + avgOk * 0.25) *
          (lit(1.0) - digitRatio))
  }

  /** Token counts: whitespace tokens and a BPE-ish word/punct regex
    * (`\w+` runs or single non-space symbols).
    */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_ws_tokens", size(split(trim(col(textCol)), "\\s+")))
      .withColumn("n_re_tokens",
        size(regexp_extract_all(col(textCol), lit("[a-zA-Z0-9_]+|[^a-zA-Z0-9_\\s]"), lit(0))))

  /** Content fingerprints: md5 of normalized text (exact identity) and
    * a 64-bit rolling-window min-hash (winnowing-style robust id: the
    * minimum xxhash64 over all word 4-grams — stable under local edits
    * away from the minimizer).
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = Dedup.normalized(col(textCol))
    val grams = Dedup.shingleArray(col("__toks"), 4)
    df.withColumn("__toks", Dedup.tokens(col(textCol)))
      .select(col(idCol), md5(norm).as("md5_fp"),
        coalesce(array_min(transform(grams, g => xxhash64(g))),
          xxhash64(norm)).as("rolling_fp"))
  }
}
