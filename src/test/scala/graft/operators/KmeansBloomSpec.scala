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
