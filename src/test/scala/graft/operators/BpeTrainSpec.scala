package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Specs for [[TextAnalysis.bpeTrain]]: the per-round (pair, count,
  * tokens-after) trace must match a driver-side brute-force greedy
  * model — including overlapping runs, where pairs counted and merges
  * performed diverge — and multi-round merges must chain.
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Brute-force model with the operator's exact semantics. */
  private def model(docs: Seq[Seq[String]], merges: Int)
      : Seq[(Int, String, String, Long, Long)] = {
    var cur = docs.filter(_.nonEmpty)
    (1 to merges).map { r =>
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      cur.foreach(t => t.sliding(2).filter(_.length == 2).foreach(p =>
        counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + 1))
      val ((a, b), c) = counts.toSeq
        .sortBy { case ((x, y), n) => (-n, x, y) }.head
      val m = a + "+" + b
      cur = cur.map { t =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < t.length) {
          if (i + 1 < t.length && t(i) == a && t(i + 1) == b) {
            out += m; i += 2
          } else { out += t(i); i += 1 }
        }
        out.toSeq
      }
      (r, a, b, c, cur.map(_.length.toLong).sum)
    }
  }

  private def run(docs: Seq[Seq[String]], merges: Int) = {
    val df = docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t.mkString(" ")) }
      .toDF("doc_id", "text")
    TextAnalysis.bpeTrain(df, "doc_id", "text", merges)
      .orderBy("round")
      .as[(Int, String, String, Long, Long)].collect().toSeq
  }

  test("overlapping runs: pairs counted > merges performed") {
    // "a a a a a" has 4 adjacent (a,a) pairs but only 2 greedy merges
    val docs = Seq(Seq("a", "a", "a", "a", "a"))
    val got = run(docs, 1)
    assert(got == Seq((1, "a", "a", 4L, 3L)), got.toString)
    assert(got == model(docs, 1))
  }

  test("multi-round merges chain onto merged tokens") {
    // round 1 merges (x,y); round 2 should see "x+y" as a real token
    val docs = Seq(
      Seq("x", "y", "z", "x", "y", "z"),
      Seq("x", "y", "z", "w"),
      Seq("q", "x", "y", "z"))
    val got = run(docs, 3)
    assert(got == model(docs, 3), s"got $got\nwant ${model(docs, 3)}")
    assert(got(1)._2 == "x+y" && got(1)._3 == "z") // chained merge
  }

  test("bpeEncode: per-doc counts under the trained merges, resistant docs first") {
    // doc 0 is pure "a a ..." (compresses hard), doc 1 has one merge
    // site, doc 2 has none (fully merge-resistant)
    val docs = Seq(
      Seq("a", "a", "a", "a"),
      Seq("b", "a", "a", "c"),
      Seq("x", "y", "z"))
    val df = docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncode(df, "doc_id", "text",
        merges = 1, topN = 50)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // merge table round 1 = (a,a); doc0: 4->2 (500000), doc1: 4->3
    // (750000), doc2: 3->3 (1000000); resistant-first ordering
    assert(got == Seq((2L, 3L, 3L, 1000000L), (1L, 4L, 3L, 750000L),
      (0L, 4L, 2L, 500000L)))
  }

  test("randomized parity with the brute-force model") {
    val rng = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd")
    for (trial <- 1 to 5) {
      val docs = (0 until 12).map(_ =>
        (0 until (3 + rng.nextInt(10))).map(_ =>
          vocab(rng.nextInt(vocab.length))))
      assert(run(docs, 3) == model(docs, 3), s"trial $trial")
    }
  }
}
