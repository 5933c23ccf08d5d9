package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Randomized completeness/soundness check of [[Dedup.tfCosineJoin]]'s
  * all-pairs prefix filter against a brute-force all-pairs model:
  * seeded random corpora (Zipf-ish token draws so document mass
  * concentrates on common tokens — the prefix theorem's hard case,
  * where shared weight lives in the UN-indexed suffixes), thresholds
  * across the operating range, both unigram and shingle element
  * spaces. Any missed pair is a completeness bug (the filter must be
  * a candidate SUPERSET); any extra pair is a verification bug.
  */
class TfCosinePropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def bruteForce(docs: Seq[(Long, String)], threshold: Double,
      ngram: Int): Seq[(Long, Long)] = {
    def grams(txt: String): Map[String, Long] = {
      val toks = txt.trim.toLowerCase.split("\\s+").toSeq
      val els =
        if (ngram <= 1) toks
        else if (toks.length < ngram) Seq.empty
        else toks.sliding(ngram).map(_.mkString(" ")).toSeq
      els.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    }
    val tf = docs.map { case (id, t) => id -> grams(t) }.toMap
    val ids = docs.map(_._1).sorted
    for {
      i <- ids; j <- ids if i < j
      ta = tf(i); tb = tf(j)
      if ta.nonEmpty && tb.nonEmpty
      dot = ta.keysIterator.filter(tb.contains)
        .map(k => ta(k) * tb(k)).sum
      cos = dot.toDouble /
        (math.sqrt(ta.values.map(v => v * v).sum.toDouble) *
          math.sqrt(tb.values.map(v => v * v).sum.toDouble))
      if cos >= threshold
    } yield (i, j)
  }

  test("tfCosineJoin == brute force on seeded Zipf-ish corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eed)
    // Zipf-ish draw: token k with weight ~ 1/(k+1) from a 12-token
    // vocabulary — most mass on very few very common tokens
    val vocab = (0 until 12).map(i => s"tok$i")
    val cum = {
      val w = vocab.indices.map(i => 1.0 / (i + 1))
      val s = w.sum
      w.scanLeft(0.0)(_ + _).tail.map(_ / s)
    }
    def draw(): String = {
      val u = rnd.nextDouble()
      vocab(cum.indexWhere(u <= _))
    }
    for (trial <- 0 until 3) {
      // ≥ 5 tokens so ngram=3 docs carry several shingles (the md5
      // shingle-key compression path activates only at ngram ≥ 3 —
      // sweeping it here pins that path against the same brute-force
      // model, which compares PAIR SETS and so is agnostic to whether
      // the engine keys shingles raw or fingerprinted)
      val base = (0 until 24).map { _ =>
        val len = 5 + rnd.nextInt(10)
        (0 until len).map(_ => draw()).mkString(" ")
      }
      // a third of docs are near-twins of an earlier doc (append one
      // token) so high-threshold pairs actually exist
      val docs = (0 until 24).map { i =>
        (i.toLong, if (i >= 16) base(i - 16) + " " + draw() else base(i))
      }
      val df = docs.toDF("doc_id", "text")
      for (t <- Seq(0.7, 0.9); n <- Seq(1, 2, 3)) {
        val got = Dedup.tfCosineJoin(df, "doc_id", "text",
            threshold = t, ngram = n)
          .orderBy("id_a", "id_b")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        val want = bruteForce(docs, t, n)
        assert(got == want,
          s"trial $trial threshold $t ngram $n: got $got want $want")
      }
    }
  }
}
