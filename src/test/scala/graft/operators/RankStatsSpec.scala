package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-11 additions: the rank-statistics family
  * (Spearman, Mann–Whitney, Gini, mutual information), Katz
  * centrality, and the lexicon profiles (hapax, burstiness,
  * vocabulary Jaccard) — each against hand-computed values including
  * the tie/degenerate branches.
  */
class RankStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lnG(x: Long): Long =
    math.floor(math.log(x.toDouble) * 1e9).toLong

  // ── distributed ordering primitives ────────────────────────────

  test("Ranks: distributed row numbers and doubled ranks match the sequential forms") {
    val df = Seq((5L, "e"), (1L, "a"), (3L, "c"), (2L, "b"),
      (4L, "d")).toDF("k", "s")
    val rn = Ranks.globalRowNumber(df, Seq("k"), "rn")
      .orderBy("k").select("k", "rn").as[(Long, Long)].collect().toSeq
    assert(rn == Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L),
      (5L, 5L)))
    // ties: v = (1, 2, 2, 3) → doubled avg ranks 2, 5, 5, 8
    val dr = Ranks.doubledRanks(
        Seq(1L, 2L, 2L, 3L).toDF("v"), "v")
      .orderBy("v").as[(Long, Long, Long)].collect().toSeq
    assert(dr == Seq((1L, 1L, 2L), (2L, 2L, 5L), (3L, 1L, 8L)))
  }

  // ── Spearman ───────────────────────────────────────────────────

  test("spearmanNano: hand-computed moments under x-ties") {
    // x = (1,2,2,3) → doubled avg ranks (2,5,5,8);
    // y = (10,20,30,15) → (2,6,8,4)
    // n=4 sx=20 sxx=118 sy=20 syy=120 sxy=106 → vx=72 vy=80 num=24
    val df = Seq((1L, 10L), (2L, 20L), (2L, 30L), (3L, 15L))
      .toDF("x", "y")
    val expected =
      math.floor(24.0 / math.sqrt(72.0 * 80.0) * 1e9).toLong
    assert(Drift.spearmanNano(df, "x", "y")
      .as[(Long, Long)].head() == ((4L, expected)))
  }

  test("spearmanNano: perfect monotone is 1e9, reversed is -1e9, constant pins 0") {
    val up = Seq((1L, 5L), (2L, 7L), (3L, 9L)).toDF("x", "y")
    assert(Drift.spearmanNano(up, "x", "y")
      .as[(Long, Long)].head()._2 == 1000000000L)
    val down = Seq((1L, 9L), (2L, 7L), (3L, 5L)).toDF("x", "y")
    assert(Drift.spearmanNano(down, "x", "y")
      .as[(Long, Long)].head()._2 == -1000000000L)
    // constant x: vx = 0 → degenerate guard pins 0
    val const = Seq((4L, 1L), (4L, 2L)).toDF("x", "y")
    assert(Drift.spearmanNano(const, "x", "y")
      .as[(Long, Long)].head() == ((2L, 0L)))
  }

  // ── Mann–Whitney ───────────────────────────────────────────────

  test("mannWhitneyNano: tie-corrected U and effect size by hand") {
    // A = (1,3), B = (2,2): combined doubled ranks 1→2, 2→5,5, 3→8
    // 2R_a = 10, 2U_a = 10 − 2·3 = 4 (U = 2: the two 3>2 wins),
    // cles = 4/(2·2·2) = 0.5
    val df = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 2L))
      .toDF("g", "v")
    assert(Drift.mannWhitneyNano(df, "g", "v", "a", "b")
      .as[(Long, Long, Long, Long)].head() ==
      ((2L, 2L, 4L, 500000000L)))
  }

  test("mannWhitneyNano: complete separation saturates the effect size") {
    // every a above every b: U = n_a·n_b → cles = 1
    val df = Seq(("a", 10L), ("a", 11L), ("b", 1L), ("b", 2L))
      .toDF("g", "v")
    val out = Drift.mannWhitneyNano(df, "g", "v", "a", "b")
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((2L, 2L, 8L, 1000000000L)))
    // missing slice: zero counts pin the effect to 0, no NPE
    val one = Seq(("a", 1L)).toDF("g", "v")
    assert(Drift.mannWhitneyNano(one, "g", "v", "a", "b")
      .as[(Long, Long, Long, Long)].head() == ((1L, 0L, 0L, 0L)))
  }

  // ── Gini ───────────────────────────────────────────────────────

  test("giniNano: exact discrete form, even mass pins 0") {
    // sorted (1,1,2): Σi·x = 9, G = (18 − 16)/12 = 1/6
    val df = Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("id", "v")
    assert(Drift.giniNano(df, "id", "v")
      .as[(Long, Long, Long)].head() == ((3L, 4L, 166666666L)))
    val even = Seq((1L, 5L), (2L, 5L)).toDF("id", "v")
    assert(Drift.giniNano(even, "id", "v")
      .as[(Long, Long, Long)].head() == ((2L, 10L, 0L)))
    // zero total mass: denominator guard pins 0
    val zero = Seq((1L, 0L), (2L, 0L)).toDF("id", "v")
    assert(Drift.giniNano(zero, "id", "v")
      .as[(Long, Long, Long)].head() == ((2L, 0L, 0L)))
  }

  // ── mutual information ─────────────────────────────────────────

  test("mutualInfoNano: perfect dependence is ln 2 on the grid, independence is 0") {
    val dep = Seq(("a1", "b1"), ("a1", "b1"), ("a2", "b2"),
      ("a2", "b2")).toDF("a", "b")
    // each cell: c=2, n=4, ca=cb=2 → t = 2·(lnG(8) − lnG(4));
    // S over 2 cells, mi = S/4 = lnG(8) − lnG(4) (= ln 2 · 1e9)
    val expected = lnG(8) - lnG(4)
    assert(Drift.mutualInfoNano(dep, "a", "b")
      .as[(Long, Long, Long)].head() == ((4L, 2L, expected)))
    val ind = Seq(("a1", "b1"), ("a1", "b2"), ("a2", "b1"),
      ("a2", "b2")).toDF("a", "b")
    assert(Drift.mutualInfoNano(ind, "a", "b")
      .as[(Long, Long, Long)].head() == ((4L, 4L, 0L)))
  }

  // ── Theil index ────────────────────────────────────────────────

  test("theilIndex: hand-computed micro-grid terms, even and zero mass pin 0") {
    def ln6(x: Long): Long =
      math.floor(math.log(x.toDouble) * 1e6).toLong
    // x = (1, 1, 2), X = 4, n = 3:
    // S = 2·(ln6(3) − ln6(4)) + 2·(ln6(6) − ln6(4))
    val df = Seq(1L, 1L, 2L).toDF("v")
    val s = 2L * (ln6(3) - ln6(4)) + 2L * (ln6(6) - ln6(4))
    val expected = math.floor(s.toDouble / 4.0).toLong
    assert(Drift.theilIndex(df, "v")
      .as[(Long, Long, Long)].head() == ((3L, 4L, expected)))
    assert(Drift.theilIndex(Seq(5L, 5L).toDF("v"), "v")
      .as[(Long, Long, Long)].head() == ((2L, 10L, 0L)))
    assert(Drift.theilIndex(Seq(0L, 0L).toDF("v"), "v")
      .as[(Long, Long, Long)].head() == ((2L, 0L, 0L)))
  }

  // ── Adamic–Adar ────────────────────────────────────────────────

  test("adamicAdar: 4-cycle candidates, hub weights 1/ln(deg) by hand") {
    // square 1-2-3-4-1: non-edges (1,3) and (2,4), each with two
    // degree-2 common neighbors → aa = 2·⌊1e9/ln 2⌋
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L), (4L, 3L))
      .toDF("x", "y")
    val w2 = math.floor(1e9 / math.log(2.0)).toLong
    val out = Graph.adamicAdar(edges, "x", "y")
      .orderBy("a", "b").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 2L, 2 * w2), (2L, 4L, 2L, 2 * w2)))
  }

  // ── label propagation ──────────────────────────────────────────

  test("labelPropagation: two hand-tracked synchronous rounds with tie-break") {
    // (1,2,w5) (1,3,w5) (2,3,w1) (3,4,w1): round 1 → (2,1,1,3),
    // round 2 → (1,2,2,1): two communities of two
    val edges = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 1L),
      (3L, 4L, 1L)).toDF("s", "d", "w")
    val out = Graph.labelPropagation(edges, "s", "d", "w", rounds = 2)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (2L, 2L)))
  }

  // ── Katz centrality ────────────────────────────────────────────

  test("katzCentrality: three hand-unrolled rounds, Δ_in attenuation") {
    // 1→2, 3→2, 2→3: Δ_in = 2
    // r1: x=(1e6, 2e6, 1.5e6); r2: (1e6, 2.25e6, 2e6);
    // r3: (1e6, 2.5e6, 2.125e6)
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.katzCentrality(edges, "src", "dst", rounds = 3)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1000000L), (2L, 2500000L),
      (3L, 2125000L)))
  }

  // ── lexicon profiles ───────────────────────────────────────────

  test("hapaxStats: per-slice vocab, hapax share, type-token ratio") {
    val docs = Seq((1L, "a b a", "s1"), (2L, "b c", "s1"),
      (3L, "x", "s2")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.hapaxStats(docs, "text", "source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // s1: counts a:2 b:2 c:1 → vocab 3, tokens 5, hapax 1
    assert(out == Seq(
      ("s1", 3L, 5L, 1L, 333333333L, 600000000L),
      ("s2", 1L, 1L, 1L, 1000000000L, 1000000000L)))
  }

  test("burstiness: VMR as the two-floor identity, head-K order") {
    val docs = Seq((1L, "a a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.burstiness(docs, "doc_id", "text", topK = 2)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // a: S=3 Q=5 n=3 → ⌊5/3·1e9⌋ − ⌊3/3·1e9⌋; b: S=2 Q=2
    assert(out == Seq(
      ("a", 2L, 3L, 5L, 1666666666L - 1000000000L),
      ("b", 2L, 2L, 2L, 1000000000L - 666666666L)))
  }

  test("vocabJaccard: overlapping, disjoint, and absent pairs") {
    val docs = Seq((1L, "a b", "s1"), (2L, "b c", "s2"),
      (3L, "d", "s3")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.vocabJaccard(docs, "text", "source")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("s1", "s2", 2L, 2L, 1L, 333333333L),
      ("s1", "s3", 2L, 1L, 0L, 0L),
      ("s2", "s3", 2L, 1L, 0L, 0L)))
  }

  test("vocabRichness: Chao1 and Good-Turing from f1/f2") {
    val docs = Seq((1L, "x x y", "s1"), (2L, "x y z", "s2"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.vocabRichness(docs, "text", "source")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // s1: x:2 y:1 → V=2 N=3 f1=1 f2=1; chao1 = 2 + 0/4, p0 = 1/3
    // s2: all singletons → chao1 = 3 + 6/2 = 6, p0 = 1
    assert(out == Seq(
      ("s1", 2L, 3L, 1L, 1L, 2000L, 333333333L),
      ("s2", 3L, 3L, 3L, 0L, 6000L, 1000000000L)))
  }

  test("burrowsDelta: mirrored frequencies, identical sources at 0") {
    val docs = Seq((1L, "x x y", "a"), (2L, "x y y", "b"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.burrowsDelta(docs, "text", "source",
      topK = 2).as[(String, String, Long, Long, Long)].collect().toSeq
    // rf micro: a = (666666, 333333), b mirrored; D = 111110888889 =
    // 333333² exactly → each term z-gap = 2·333333/333333 = 2
    assert(out == Seq(("a", "b", 2L, 4000000000L, 2000000000L)))
    val same = Seq((1L, "x y", "a"), (2L, "x y", "b"))
      .toDF("doc_id", "text", "source")
    val rs = TextAnalysis.burrowsDelta(same, "text", "source",
      topK = 2).as[(String, String, Long, Long, Long)].collect().toSeq
    assert(rs == Seq(("a", "b", 2L, 0L, 0L)))
  }
}
