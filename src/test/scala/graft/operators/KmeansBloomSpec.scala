package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-9 additions: distributed Lloyd's k-means
  * (brute-force parity against a driver-side model on the same
  * integer grid) and bloom-prefiltered decontamination (byte-exact
  * parity with the exact join + the prefilter's plan position).
  */
class KmeansBloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ── distributed k-means ────────────────────────────────────────

  /** Driver-side Lloyd model with the operator's exact semantics:
    * 1e4-grid quantization, k lowest-id init, int64 distances with
    * (d2, cid) tie-break, floor-of-mean updates, empty-cluster
    * carry-forward.
    */
  private def modelKmeans(vecs: Seq[(Long, Seq[Double])], k: Int,
      iters: Int): (Array[Array[Long]], Map[Int, Long]) = {
    val q = vecs.map { case (id, v) =>
      (id, v.map(x => math.floor(x * 1e4).toLong).toArray)
    }.sortBy(_._1)
    var cents = q.take(k).map(_._2.clone).toArray
    def assign(x: Array[Long]): Int =
      cents.zipWithIndex.map { case (c, i) =>
        (c.zip(x).map { case (a, b) => (b - a) * (b - a) }.sum, i)
      }.min._2
    for (_ <- 1 to iters) {
      val groups = q.groupBy { case (_, x) => assign(x) }
      val next = cents.map(_.clone)
      groups.foreach { case (cid, members) =>
        val d = members.head._2.length
        for (p <- 0 until d) {
          val sv = members.map(_._2(p)).sum
          next(cid)(p) = math.floor(sv.toDouble / members.size).toLong
        }
      }
      cents = next
    }
    val sizes = q.groupBy { case (_, x) => assign(x) }
      .map { case (cid, ms) => cid -> ms.size.toLong }
    (cents, sizes)
  }

  test("kmeansLloyd matches the driver-side model bit-for-bit") {
    // three well-separated blobs + a few stragglers; dim 4, k 3
    val rng = new scala.util.Random(42)
    def blob(center: Seq[Double], n: Int, base: Long) =
      (0 until n).map(i => (base + i,
        center.map(c => c + (rng.nextDouble() - 0.5) * 0.2)))
    val vecs = blob(Seq(1.0, 0.0, 0.0, 0.0), 12, 0L) ++
      blob(Seq(0.0, 1.0, 0.0, 0.0), 12, 100L) ++
      blob(Seq(0.0, 0.0, 1.0, 1.0), 12, 200L)
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.kmeansLloyd(df, "vec_id", "embedding",
        k = 3, iters = 4)
      .orderBy("cid", "pos")
      .select("cid", "pos", "c_q", "n_vecs")
      .as[(Int, Int, Long, Long)].collect().toSeq
    val (cents, sizes) = modelKmeans(vecs, k = 3, iters = 4)
    val want = for {
      cid <- 0 until 3 if sizes.contains(cid)
      pos <- 0 until 4
    } yield (cid, pos, cents(cid)(pos), sizes(cid))
    assert(got == want.toSeq)
  }

  test("kmeansLloyd separates obvious blobs into distinct clusters") {
    val vecs = (0 until 10).map(i => (i.toLong, Seq(0.0, 0.0))) ++
      (10 until 20).map(i => (i.toLong, Seq(5.0, 5.0)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.kmeansLloyd(df, "vec_id", "embedding",
        k = 2, iters = 3)
      .select("cid", "n_vecs").distinct()
      .as[(Int, Long)].collect().toMap
    assert(out == Map(0 -> 10L, 1 -> 10L))
  }

  test("kmeansSilhouette: exact values on a symmetric two-blob fit") {
    // ids 0 and 1 are the two inits and the blobs sit exactly on
    // them, so Lloyd converges immediately: a = 0 for every point,
    // b = 2·(5e4)² = 5e9, s = (b−0)·1e6 div max(0,b,1) = exactly 1e6
    val vecs = Seq((0L, Seq(0.0, 0.0)), (1L, Seq(5.0, 5.0))) ++
      (2 until 11).map(i => (i.toLong, Seq(0.0, 0.0))) ++
      (11 until 20).map(i => (i.toLong, Seq(5.0, 5.0)))
    val out = Similarity.kmeansSilhouette(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2, iters = 3)
      .orderBy("cid")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0, 10L, 1000000L, 1000000L, 1000000L),
      (1, 10L, 1000000L, 1000000L, 1000000L)))
  }

  test("kmeansSilhouette: a boundary point scores exactly 0") {
    // iters = 0 keeps the init centroids (0,0) and (10,10); the third
    // point is equidistant (a = b), ties to cid 0, and s = 0
    val vecs = Seq((0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 10.0)),
      (2L, Seq(5.0, 5.0)))
    val out = Similarity.kmeansSilhouette(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2, iters = 0)
      .orderBy("cid")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0, 2L, 500000L, 0L, 1000000L),
      (1, 1L, 1000000L, 1000000L, 1000000L)))
  }

  test("dbscanGrid: blobs cluster, adjacent cells merge, sparse cells are noise") {
    // cellWidth 2000 on the shifted 1e4 grid = 0.2-wide cells.
    // Blob A: 5 pts at (0,0) -> cell (50,50), ck 5000050.
    // Bridge: 3 pts at (0.21,0) -> cell (51,50) — adjacent, merges
    // into A via the 8-neighborhood. Blob B: 4 pts at (1,1) ->
    // cell (55,55), ck 5500055 — isolated (self-offset keeps it).
    // Noise: 2 pts in one cell and 1 in another, both under minPts=3.
    val vecs =
      (0 until 5).map(i => (i.toLong, Seq(0.0f, 0.0f))) ++
      (10 until 13).map(i => (i.toLong, Seq(0.21f, 0.0f))) ++
      (20 until 24).map(i => (i.toLong, Seq(1.0f, 1.0f))) ++
      Seq((30L, Seq(-0.5f, 0.5f)), (31L, Seq(-0.5f, 0.5f)),
        (32L, Seq(0.5f, -0.5f)))
    val out = Similarity.dbscanGrid(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", cellWidth = 2000L, minPts = 3L)
      .orderBy("comp")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((-1L, 2L, 3L), (5000050L, 2L, 8L),
      (5500055L, 1L, 4L)))
  }

  // ── retrieval-rank fusion ──────────────────────────────────────

  test("nearestRank: exact grid distances, deterministic ranks") {
    val vecs = Seq((0L, Seq(0.0f)), (1L, Seq(0.1f)), (2L, Seq(0.2f)),
      (3L, Seq(1.0f)))
    val out = Similarity.nearestRank(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", queryId = 0L, topN = 3)
      .orderBy("rank")
      .as[(Long, Long, Long)].collect().toSeq
    // 0.1f widens to 0.10000000149…, so it quantizes to exactly 1000
    assert(out == Seq((0L, 1L, 0L), (1L, 2L, 1000L * 1000L),
      (2L, 3L, 2000L * 2000L)))
  }

  test("kCenterSample: farthest-point picks with shrinking cover radius") {
    // 1-D grid points 0, 10000, 9000, 1000, 5000 (ids 0..4)
    val vecs = Seq((0L, Seq(0.0)), (1L, Seq(1.0)), (2L, Seq(0.9)),
      (3L, Seq(0.1)), (4L, Seq(0.5)))
    val out = Similarity.kCenterSample(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 4)
      .as[(Int, Long, Long)].collect().toSeq
    // seed 0; then 1 (d2 1e8), then the midpoint 4 (25e6), then the
    // md tie between 2 and 3 (both 1e6) breaks to the lower id
    assert(out == Seq((1, 0L, 0L), (2, 1L, 100000000L),
      (3, 4L, 25000000L), (4, 2L, 1000000L)))
  }

  test("mmrDiversify: diversity term reorders near-duplicates, pure relevance does not") {
    // 1-D grid: query 0 at 0.0; candidates 1 (0.1), 2 (0.11 — near-dup
    // of 1), 3 (0.5), 4 (0.6)
    val vecs = Seq((0L, Seq(0.0)), (1L, Seq(0.1)), (2L, Seq(0.11)),
      (3L, Seq(0.5)), (4L, Seq(0.6)))
    val df = vecs.toDF("vec_id", "embedding")
    // diversity-heavy λ=0.3: after the nearest pick (1), the far point
    // 4 beats the near-duplicate 2 (hand-computed integer keys)
    val div = Similarity.mmrDiversify(df, "vec_id", "embedding",
        queryId = 0L, poolN = 50, k = 4, lambdaMilli = 300L)
      .as[(Int, Long, Long)].collect().toSeq
    assert(div == Seq((1, 1L, 1000000L), (2, 4L, 36000000L),
      (3, 2L, 1210000L), (4, 3L, 25000000L)))
    // pure relevance λ=1.0 degenerates to the distance ranking
    val rel = Similarity.mmrDiversify(df, "vec_id", "embedding",
        queryId = 0L, poolN = 50, k = 4, lambdaMilli = 1000L)
      .as[(Int, Long, Long)].collect().toSeq
    assert(rel.map(_._2) == Seq(1L, 2L, 3L, 4L))
  }

  test("rrfFuse: hand-computed nano scores, missing sides contribute 0") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val b = Seq((2L, 1L), (4L, 2L)).toDF("doc_id", "rank")
    val out = Similarity.rrfFuse(a, b, "doc_id")
      .orderBy(col("rrf_nano").desc, col("doc_id"))
      .select("doc_id", "rrf_nano")
      .as[(Long, Long)].collect().toSeq
    // 1e9 div 61 = 16393442, div 62 = 16129032, div 63 = 15873015
    assert(out == Seq((2L, 16129032L + 16393442L), (1L, 16393442L),
      (4L, 16129032L), (3L, 15873015L)))
  }

  // ── hard-negative mining ───────────────────────────────────────

  test("hardNegatives: exact nearest wrong-label example per anchor") {
    val vecs = Seq(
      (1L, Seq(0.0, 0.0), 0), (2L, Seq(1.0, 0.0), 1),
      (3L, Seq(3.0, 0.0), 0), (4L, Seq(10.0, 0.0), 1))
    val out = Similarity.hardNegatives(
        vecs.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", nAnchors = 16)
      .orderBy("anchor_id")
      .as[(Long, Int, Long, Int, Long, Long)].collect().toSeq
    // grid distances: 1.0 apart = (1e4)² = 1e8
    assert(out == Seq(
      (1L, 0, 2L, 1, 100000000L, 2L),
      (2L, 1, 1L, 0, 100000000L, 2L),
      (3L, 0, 2L, 1, 400000000L, 2L),
      (4L, 1, 3L, 0, 4900000000L, 2L)))
  }

  test("hardPositives: nearest same-label example, self excluded") {
    val vecs = Seq(
      (1L, Seq(0.0, 0.0), 0), (2L, Seq(1.0, 0.0), 1),
      (3L, Seq(3.0, 0.0), 0), (4L, Seq(10.0, 0.0), 1))
    val out = Similarity.hardPositives(
        vecs.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", nAnchors = 16)
      .orderBy("anchor_id")
      .as[(Long, Int, Long, Int, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0, 3L, 0, 900000000L, 1L),
      (2L, 1, 4L, 1, 8100000000L, 1L),
      (3L, 0, 1L, 0, 900000000L, 1L),
      (4L, 1, 2L, 1, 8100000000L, 1L)))
  }

  test("kmeansPurity: per-cluster majority label and exact micro purity") {
    // two exact blobs; two points in blob A carry the wrong label
    val vecs =
      Seq((0L, Seq(0.0, 0.0), 0), (1L, Seq(5.0, 5.0), 1)) ++
      (2 until 11).map(i => (i.toLong, Seq(0.0, 0.0),
        if (i <= 3) 1 else 0)) ++
      (11 until 20).map(i => (i.toLong, Seq(5.0, 5.0), 1))
    val out = Similarity.kmeansPurity(
        vecs.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", k = 2, iters = 3)
      .orderBy("cid")
      .as[(Int, Long, Int, Long, Long)].collect().toSeq
    assert(out == Seq((0, 10L, 0, 8L, 800000L),
      (1, 10L, 1, 10L, 1000000L)))
  }

  test("hardNegatives: equidistant candidates break to the lower id") {
    val vecs = Seq((1L, Seq(0.0), 0), (5L, Seq(1.0), 1),
      (6L, Seq(-1.0), 1))
    val out = Similarity.hardNegatives(
        vecs.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", nAnchors = 1)
      .as[(Long, Int, Long, Int, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0, 5L, 1, 100000000L, 2L)))
  }

  // ── bloom-prefiltered decontamination ─────────────────────────

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again today"),
    (2L, "a completely different document with no overlap at all here"),
    (3L, "quick brown fox jumps over the lazy dog again and again"),
    (4L, "yet another clean doc about spark catalyst and parquet scans"))
    .toDF("doc_id", "text")

  private def benchSet = Seq(
    (900L, "quick brown fox jumps over the lazy dog"))
    .toDF("bench_id", "text")

  test("decontaminateBloom is byte-identical to the exact join") {
    val exact = Curate.decontaminate(corpus, "doc_id", "text",
        benchSet, "bench_id", "text", n = 3)
      .orderBy("doc_id", "bench_id").collect().toSeq
    val bloom = Curate.decontaminateBloom(corpus, "doc_id", "text",
        benchSet, "bench_id", "text", n = 3)
      .orderBy("doc_id", "bench_id").collect().toSeq
    assert(exact.nonEmpty, "fixture must actually contaminate")
    assert(bloom == exact)
  }

  test("bloom prefilter sits under the join, on the corpus scan side") {
    // the point of the operator: the xxhash64 membership test must be
    // a Filter BELOW the shingle equi-join, so non-matching corpus
    // shingles die scan-local instead of reaching the join
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val plan = Curate.decontaminateBloom(corpus, "doc_id", "text",
        benchSet, "bench_id", "text", n = 3)
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    val shingleJoin = joins.last // bottom-most: the shingle equi-join
    val bloomFilters = shingleJoin.collect {
      case f: Filter if f.condition.toString.contains("xxhash64") => f
    }
    assert(bloomFilters.nonEmpty,
      "bloom membership filter not pushed under the shingle join:\n" +
        plan.toString)
  }

  test("decontaminateBloom with a tiny bitmap still returns exact rows") {
    // m=64 (one word) saturates the bitmap — every probe passes, the
    // exact join does all the work; results must STILL be exact
    val exact = Curate.decontaminate(corpus, "doc_id", "text",
        benchSet, "bench_id", "text", n = 3)
      .orderBy("doc_id", "bench_id").collect().toSeq
    val bloom = Curate.decontaminateBloom(corpus, "doc_id", "text",
        benchSet, "bench_id", "text", n = 3, mBits = 64)
      .orderBy("doc_id", "bench_id").collect().toSeq
    assert(bloom == exact)
  }
}
