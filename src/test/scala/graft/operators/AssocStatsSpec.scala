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
