package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + scale-shape of the round-9 curation/eval additions:
  * the per-rule Gopher audit, temperature mixing weights, BPE pair
  * statistics, and the JL sign projection.
  */
class CurationEvalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("gopherAudit: each rule trips on its own pathology, " +
    "and the flag map is shuffle-free") {
    val good = "the quick brown fox jumps over a lazy dog and it " +
      "is plainly of good cheer to all involved here today"
    val docs = Seq(
      (1L, good),                               // passes everything
      (2L, "too few"),                          // word_count (< 5)
      (3L, "the a of to and in is it " +
        "aa bb cc dd ee ff gg hh"),             // mean_word_len (< 3)
      (4L, ("the a of it " +
        "#### #### #### ####").trim),           // symbol_ratio
      (5L, "the 1 2 3 4 5 6 7 8 9 10 11 of"),   // alpha_words (< 80%)
      (6L, "purely novel vocabulary without common function words")
    ).toDF("doc_id", "text")                    // 6: stopwords (< 2)
    val f = Curate.gopherAudit(docs, "text")
    val rows = f.orderBy("doc_id").collect()
    def flags(i: Int): Seq[Boolean] =
      (2 to 6).map(c => rows(i).getBoolean(c))
    assert(flags(0).forall(identity), s"doc 1 must pass all: ${flags(0)}")
    // each crafted doc fails exactly the intended rule (columns are
    // word_count, mean_word_len, symbol_ratio, alpha_words, stopwords)
    assert(!rows(1).getBoolean(2) && rows(1).getBoolean(3))
    assert(!rows(2).getBoolean(3), s"doc 3 mean word len: ${flags(2)}")
    assert(!rows(3).getBoolean(4), s"doc 4 symbol ratio: ${flags(3)}")
    assert(!rows(4).getBoolean(5), s"doc 5 alpha words: ${flags(4)}")
    assert(!rows(5).getBoolean(6), s"doc 6 stopwords: ${flags(5)}")
    val plan = f.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"the flag map must be scan-local:\n$plan")
  }

  test("temperatureWeights: sqrt mix flattens a skewed domain " +
    "distribution, shares are exact integers") {
    val df = (Seq.fill(900)("head") ++ Seq.fill(100)("tail"))
      .zipWithIndex.map { case (g, i) => (i.toLong, g) }
      .toDF("id", "grp")
    val w = Sampling.temperatureWeights(df, "grp")
      .orderBy("grp").collect()
    val (headRaw, headShare) = (w(0).getLong(2), w(0).getLong(3))
    val (tailRaw, tailShare) = (w(1).getLong(2), w(1).getLong(3))
    assert(headRaw == math.floor(math.sqrt(900.0) * 1e9).toLong)
    assert(tailRaw == math.floor(math.sqrt(100.0) * 1e9).toLong)
    // raw proportion is 9:1; sqrt mix is 3:1 — exactly 750000/250000
    assert(headShare == 750000L && tailShare == 250000L,
      s"got $headShare / $tailShare")
  }

  test("bpePairCounts: per-instance adjacent pair counts match a " +
    "hand count") {
    val df = Seq((1L, "low low lower"), (2L, "west")).toDF("id", "text")
    val got = TextAnalysis.bpePairCounts(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "low"x2 + "lower": lo x3, ow x3, we x1, er x1; "west": we es st
    assert(got("lo") == 3L && got("ow") == 3L)
    assert(got("we") == 2L, s"'we' from lower+west: ${got.get("we")}")
    assert(got("er") == 1L && got("es") == 1L && got("st") == 1L)
    assert(!got.contains("wl"), "pairs never cross word boundaries")
  }

  test("signProject: deterministic ±1 matrix, exact integer " +
    "coordinates, dot-product sketch is unbiased on a known vector") {
    val m = Similarity.signMatrix(4, 8)
    assert(m.size == 4 && m.forall(_.size == 8))
    assert(m.flatten.forall(s => s == 1L || s == -1L))
    assert(m == Similarity.signMatrix(4, 8), "matrix must be stable")
    // hand-check entry (k=0, j=0): md5("0_0") first hex digit parity
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("0_0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect0 = if ("02468ace".contains(hex.charAt(0))) 1L else -1L
    assert(m(0)(0) == expect0)
    // projection of a unit basis vector is exactly the matrix column
    val e3 = Seq((7L, Array(0, 0, 0, 1, 0, 0, 0, 0))).toDF("id", "q")
    val p = e3.select(Similarity.signProject(col("q"), 4, 8).as("p"))
      .head().getSeq[Long](0)
    assert(p == (0 until 4).map(k => m(k)(3)),
      s"basis-vector projection must read column 3 of the matrix: $p")
  }
}
