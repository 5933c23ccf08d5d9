package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Document deduplication for large-scale training-data pipelines.
  * All variants are expression-only (whole-stage codegen, no UDFs) and
  * shuffle once on the blocking key — the shapes that hold at 100 TB:
  *
  *  - exact:       hash-groupBy on normalized text
  *  - ngramJaccard: shingle inverted index → shared-count join → exact
  *                  Jaccard (also the verify stage after MinHash LSH)
  *  - minhashLSH:  signature → banded buckets → candidate pairs →
  *                  exact-Jaccard verification
  *  - simhash:     64-bit sign-vote fingerprint → banded buckets →
  *                  hamming-distance verification
  */
object Dedup {
  /** Lowercased whitespace-collapsed text (shared normalizer). */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact dedup: one row per distinct normalized text, keeping the
    * smallest id; n_copies counts the group size.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(normalized(col(textCol))).as("text_hash"))
      .groupBy("text_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** SQL expression: array of word n-gram shingles of `textCol`
    * (normalized), empty when the doc has fewer than n tokens. The
    * emptiness guard matters: Spark's `sequence(1, 0)` yields a
    * DESCENDING [1, 0], not an empty array.
    */
  def shingleExpr(textCol: String, n: Int): String = {
    val toks = s"split(regexp_replace(lower(trim($textCol)), '\\\\s+', ' '), ' ')"
    s"""CASE WHEN size($toks) >= $n
        THEN transform(sequence(1, size($toks) - ${n - 1}),
             i -> concat_ws(' ', slice($toks, i, $n)))
        ELSE array() END"""
  }

  /** Distinct word-n-gram shingles per doc: (id, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(array_distinct(expr(shingleExpr(textCol, n)))).as("shingle"))

  /** Exact pairwise n-gram Jaccard over a shingle inverted index.
    * Returns (id_a, id_b, shared, jaccard) for pairs ≥ threshold.
    * Skew guard: shingles occurring in more than `maxDocFreq` docs are
    * dropped (stopword shingles explode the pair join quadratically and
    * contribute little discrimination).
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, threshold: Double = 0.6,
      maxDocFreq: Long = 1000): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val filtered = if (maxDocFreq <= 0) sh else {
      val freq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDocFreq)
      sh.join(freq.select("shingle"), "shingle")
    }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val pairs = filtered.as("a")
      .join(filtered.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard", col("shared").cast(DoubleType) /
        (col("n_a") + col("n_b") - col("shared")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "shared", "jaccard")
  }

  /** MinHash signature column: array of `numHashes` min-hashes over the
    * doc's shingle set, built with xxhash64(shingle, seed) — pure
    * expressions, evaluated in one projection.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column = {
    val hashes = (0 until numHashes).map(i =>
      array_min(transform(shingleArr, x => xxhash64(x, lit(i)))))
    array(hashes: _*)
  }

  /** MinHash + LSH near-dup candidates, verified with exact Jaccard.
    * bands × rowsPerBand = numHashes; two docs collide if any band of
    * their signatures matches exactly. Returns verified pairs
    * (id_a, id_b, jaccard ≥ threshold).
    */
  def minhashLSH(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.6): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val shArr = array_distinct(expr(shingleExpr(textCol, shingleSize)))
    val sigs = df
      .select(col(idCol).as("id"), shArr.as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    // banded buckets: (band, hash(band slice)) per doc
    val banded = sigs.select(col("id"), col("sh"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * r + 1, r)
          .cast("array<string>")))): _*)).as(Seq("band", "bucket")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("shared").cast(DoubleType) /
        (size(col("sh_a")) + size(col("sh_b")) - col("shared"))
          .cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash fingerprint per doc: per-token xxhash64, sign votes
    * per bit, fingerprint bit j set iff the vote sum is positive.
    * Expression-only: explode → 64 conditional sums → bit-pack.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = split(normalized(col(textCol)), " ")
    val exploded = df.select(col(idCol).as("id"),
      explode(tokens).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map(j =>
      sum(when(expr(s"(h >> $j) & 1") === 1, 1).otherwise(-1)).as(s"v$j"))
    val agg = exploded.groupBy("id").agg(votes.head, votes.tail: _*)
    val packed = (0 until 64).map(j =>
      expr(s"CASE WHEN v$j > 0 THEN CAST(${1L} AS BIGINT) << $j ELSE CAST(0 AS BIGINT) END"))
      .reduce(_ + _)
    agg.select(col("id"), packed.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, via
    * 4×16-bit band blocking (pigeonhole: ham ≤ 3 ⇒ ≥ 1 band equal).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = simhash(df, idCol, textCol)
    val banded = fp.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        expr(s"(simhash >> ${b * 16}) & 65535")): _*))
        .as(Seq("band", "bucket")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
