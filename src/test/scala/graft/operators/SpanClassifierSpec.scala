package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the round-6 corpus operators: windowed substring-span
  * dedup (Lee et al. shape), TF-cosine inverted-index join, and the
  * hashed-feature linear classifier score.
  */
class SpanClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dupSpans: cross-doc windows flagged, within-doc-only text clean") {
    // A and B share tokens 1..25 of 30; C is disjoint. window=10 stride=5
    // → window starts 1,6,11,16,21; starts 1..16 lie fully inside the
    // shared prefix (16+9=25), start 21 reads the differing tail.
    val w = (i: Int) => s"w$i"
    val a = (1 to 30).map(w).mkString(" ")
    val b = ((1 to 25).map(w) ++ (1 to 5).map(i => s"x$i")).mkString(" ")
    val c = (101 to 130).map(i => s"z$i").mkString(" ")
    val out = Dedup.dupSpans(
        Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text"),
        "doc_id", "text", window = 10, stride = 5)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 5L, 4L), (2L, 5L, 4L), (3L, 5L, 0L)))
  }

  test("dupSpans: docs shorter than the window drop out, no [1,0] ghost") {
    val out = Dedup.dupSpans(
        Seq((1L, "a b c"), (2L, "a b c d e f")).toDF("doc_id", "text"),
        "doc_id", "text", window = 5, stride = 2)
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L)) // doc 1: 3 < window
  }

  test("tfCosineJoin: exact cosines, fixed-order IEEE values") {
    val docs = Seq((1L, "a a b"), (2L, "a a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    // identical docs cos=1; (1,3)/(2,3) share only 'a':
    // 2/(sqrt(5)*sqrt(2)) ≈ 0.632 — below 0.7
    val full = Dedup.tfCosineJoin(docs, "doc_id", "text",
        threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // NOT 1.0: cosine is dot/(√n2·√n2) and √5·√5 = 5.000000000000001 —
    // the fixed-order IEEE value every engine reproduces identically
    val selfCos = 5.0 / (math.sqrt(5.0) * math.sqrt(5.0))
    assert(full.toSeq == Seq((1L, 2L, selfCos)))
    // below 0.632: the cross pairs appear, scored from FULL vectors
    val low = Dedup.tfCosineJoin(docs, "doc_id", "text",
        threshold = 0.6)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(low.toSeq == Seq((1L, 2L, 5L), (1L, 3L, 2L), (2L, 3L, 2L)))
  }

  test("tfCosineJoin: prefix filter is COMPLETE vs brute force") {
    // adversarial mix: exact twins, twins-with-tails, repeated-token
    // mass concentrated on COMMON tokens (the prefix theorem's hard
    // case: shared mass lives in suffixes), and a disjoint doc
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "alpha alpha alpha alpha beta"),
      (5L, "alpha alpha alpha alpha gamma"),
      (6L, "omega psi chi phi"),
      (7L, "beta beta beta alpha alpha delta")).toDF("doc_id", "text")
    // brute force: every pair, exact TF cosine
    val tf = docs.as[(Long, String)].collect().map { case (id, txt) =>
      id -> txt.split(" ").groupBy(identity).map { case (k, v) =>
        k -> v.length.toLong }
    }.toMap
    def cos(a: Long, b: Long): Double = {
      val (ta, tb) = (tf(a), tf(b))
      val dot = ta.keysIterator.filter(tb.contains)
        .map(k => ta(k) * tb(k)).sum
      dot.toDouble / (math.sqrt(ta.values.map(v => v * v).sum.toDouble) *
        math.sqrt(tb.values.map(v => v * v).sum.toDouble))
    }
    val ids = tf.keys.toSeq.sorted
    for (t <- Seq(0.5, 0.8, 0.9, 0.95, 0.99)) {
      val expect = (for {
        i <- ids; j <- ids if i < j && cos(i, j) >= t
      } yield (i, j)).sorted
      val got = Dedup.tfCosineJoin(docs, "doc_id", "text", threshold = t)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == expect, s"threshold $t")
    }
  }

  test("tfCosineJoin ngram=2: element space is shingles, not tokens") {
    // share every unigram but NO bigram → ngram=2 finds nothing
    // (doc 2's bigrams are "b a", "a c", "c b" — disjoint from
    // doc 1's "a b", "b c")
    val docs = Seq((1L, "a b c"), (2L, "b a c b")).toDF("doc_id", "text")
    val uni = Dedup.tfCosineJoin(docs, "doc_id", "text",
      threshold = 0.1)
    val bi = Dedup.tfCosineJoin(docs, "doc_id", "text",
      threshold = 0.1, ngram = 2)
    assert(uni.count() == 1 && bi.count() == 0)
  }

  test("incrementalComponents: equals the full rebuild on any split") {
    // chains {1-2-3}, {10-11}, {20-21-22}, singles via pairs (30,31)
    val basePairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (30L, 31L)).toDF("a", "b")
    val labels = Dedup.connectedComponents(basePairs, "a", "b")
    // increment: merge {10,11} into {1,2,3} via a NEW unseen node 99
    // bridging both; attach fresh singleton pair (40,41); an
    // intra-component no-op pair (20,22)
    val inc = Seq((99L, 3L), (99L, 11L), (40L, 41L), (20L, 22L))
      .toDF("a", "b")
    val got = Dedup.incrementalComponents(labels, inc, "a", "b")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val full = Dedup.connectedComponents(
        basePairs.unionByName(inc), "a", "b")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == full.toSeq)
    // the merged cluster's label is the global min across BOTH old
    // components and the bridge node
    val m = got.toMap
    assert(Seq(1L, 2L, 3L, 10L, 11L, 99L).forall(m(_) == 1L))
    assert(m(40L) == 40L && m(41L) == 40L)
    assert(m(20L) == 20L && m(22L) == 20L) // untouched by the no-op
  }

  test("classifierScore: integer-grid accumulation matches direct model") {
    val out = TextAnalysis.classifierScore(
        Seq((7L, "a b a")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    def w1000(tok: String): Long = {
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5hex.take(13), 16) % 2001L - 1000L
    }
    val expectedSum = 2 * w1000("a") + w1000("b")
    assert(out.getLong(1) == 3L) // n_toks
    assert(out.getLong(2) == expectedSum)
    assert(out.getDouble(3) == expectedSum.toDouble / (1000.0 * 3.0))
    assert(out.getInt(4) == (if (out.getDouble(3) >= 0) 1 else 0))
  }
}
