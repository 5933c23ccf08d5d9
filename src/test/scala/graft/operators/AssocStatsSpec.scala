package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checked fixtures for the round-12 association statistics:
  * Kruskal–Wallis H, Cramér's V, and Jensen–Shannon divergence.
  */
class AssocStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kruskal-wallis: untied 2-group case matches the closed form") {
    // groups a = {1, 2}, b = {3, 4}: avg ranks (1,2) vs (3,4), no ties
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "v")
    val r = Drift.kruskalWallisNano(df, "g", "v").head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("tie_sum") == 0L)
    // H = 12/(4·5)·(3²/2 + 7²/2) − 3·5 = 2.4; no ties → corrected = raw
    val h = r.getAs[Long]("h_nano")
    assert(math.abs(h - 2400000000L) <= 2L, h.toString)
    assert(r.getAs[Long]("h_tie_nano") == h)
  }

  test("kruskal-wallis: identical groups give H at 0; nulls drop") {
    val df = Seq(("a", Some(5L)), ("a", Some(7L)), ("b", Some(5L)),
      ("b", Some(7L)), ("b", None)).toDF("g", "v")
    val r = Drift.kruskalWallisNano(df, "g", "v").head()
    assert(r.getAs[Long]("n") == 4L) // the null row is excluded
    // both groups have the same rank sum → H ≈ 0 (within floor grid)
    assert(math.abs(r.getAs[Long]("h_nano")) <= 2L)
  }

  test("cramers-v: perfect association reads 1, independence reads 0") {
    // 2×2 perfect: lang determines source → V = 1 (the zero cells
    // must NOT be dropped from chi2 — the Σo²/e − n identity)
    val perfect = Seq(("x", "s1"), ("x", "s1"), ("y", "s2"), ("y", "s2"))
      .toDF("lang", "src")
    val rp = Drift.cramersVNano(perfect, "lang", "src").head()
    assert(rp.getAs[Long]("chi2_micro") == 4000000L, rp.toString)
    assert(rp.getAs[Long]("v_nano") == 1000000000L, rp.toString)
    // 2×2 uniform independence: chi2 = 0 → V pins 0
    val indep = Seq(("x", "s1"), ("x", "s2"), ("y", "s1"), ("y", "s2"))
      .toDF("lang", "src")
    val ri = Drift.cramersVNano(indep, "lang", "src").head()
    assert(ri.getAs[Long]("chi2_micro") <= 0L, ri.toString)
    assert(ri.getAs[Long]("v_nano") == 0L)
    // degenerate: single column class → pinned 0
    val degen = Seq(("x", "s1"), ("y", "s1")).toDF("lang", "src")
    assert(Drift.cramersVNano(degen, "lang", "src")
      .head().getAs[Long]("v_nano") == 0L)
  }

  test("kendall tau-b: perfect concordance / reversal / tied grid") {
    val up = Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("xb", "yb")
    val ru = Drift.kendallTauNano(up, "xb", "yb", 4, 4).head()
    assert(ru.getAs[Long]("n") == 4L)
    assert(ru.getAs[Long]("conc") == 6L && ru.getAs[Long]("disc") == 0L)
    assert(ru.getAs[Long]("tie_x_pairs") == 0L &&
      ru.getAs[Long]("tie_y_pairs") == 0L)
    assert(ru.getAs[Long]("tau_b_nano") == 1000000000L)
    val down = Seq((0L, 3L), (1L, 2L), (2L, 1L), (3L, 0L))
      .toDF("xb", "yb")
    val rd = Drift.kendallTauNano(down, "xb", "yb", 4, 4).head()
    assert(rd.getAs[Long]("conc") == 0L && rd.getAs[Long]("disc") == 6L)
    assert(rd.getAs[Long]("tau_b_nano") == -1000000000L)
    // 2×2 balanced grid: 1 concordant + 1 discordant + 4 tied pairs
    val sq = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L))
      .toDF("xb", "yb")
    val rs = Drift.kendallTauNano(sq, "xb", "yb", 2, 2).head()
    assert(rs.getAs[Long]("conc") == 1L && rs.getAs[Long]("disc") == 1L)
    assert(rs.getAs[Long]("tie_x_pairs") == 2L &&
      rs.getAs[Long]("tie_y_pairs") == 2L)
    assert(rs.getAs[Long]("tau_b_nano") == 0L)
  }

  test("anova F: closed-form 2-group case; degenerate pins 0") {
    // a = {1, 2}, b = {3, 5}: S = ⌊9/2⌋+⌊64/2⌋ = 36, G = ⌊121/4⌋ = 30
    // → ssb = 6, ssw = 39−36 = 3, F = (6/1)/(3/2) = 4
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 5L))
      .toDF("g", "v")
    val r = Drift.anovaFNano(df, "g", "v").head()
    assert(r.getAs[Long]("n") == 4L &&
      r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("ssb") == 6L && r.getAs[Long]("ssw") == 3L)
    assert(r.getAs[Long]("f_nano") == 4000000000L)
    val one = Seq(("a", 1L), ("a", 5L)).toDF("g", "v")
    assert(Drift.anovaFNano(one, "g", "v")
      .head().getAs[Long]("f_nano") == 0L)
  }

  test("wilcoxon signed-rank: zero diffs drop, ties average") {
    // diffs {1, −2, 3, 0, null}: zeros and nulls drop → ranks 1,2,3,
    // W⁺ = 1+3 → w2_plus = 2+6 = 8, frac = 8/12
    val df = Seq(Some(1L), Some(-2L), Some(3L), Some(0L), None)
      .toDF("d")
    val r = Drift.wilcoxonNano(df, "d").head()
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("w2_plus") == 8L)
    assert(r.getAs[Long]("w_frac_nano") == 666666666L)
    // {+2, −2}: tied |d| → both get doubled avg rank 3 → frac = ½
    val sym = Seq(2L, -2L).toDF("d")
    val rs = Drift.wilcoxonNano(sym, "d").head()
    assert(rs.getAs[Long]("w2_plus") == 3L)
    assert(rs.getAs[Long]("w_frac_nano") == 500000000L)
  }

  test("jensen-shannon: identical slices read 0, bounded by ln 2") {
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("g", "text")
    val r0 = TextAnalysis.jsUnigram(same, "text", "g", "a", "b").head()
    assert(r0.getAs[Long]("js_nano") == 0L, r0.toString)
    // disjoint vocabularies: maximal but still under ln2 (smoothing
    // keeps it strictly inside)
    val disj = Seq(("a", "x x x"), ("b", "y y y")).toDF("g", "text")
    val r1 = TextAnalysis.jsUnigram(disj, "text", "g", "a", "b").head()
    val js = r1.getAs[Long]("js_nano")
    assert(js > 0L && js <= 693147181L, js.toString)
  }
}
