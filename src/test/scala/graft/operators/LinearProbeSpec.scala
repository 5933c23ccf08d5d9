package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Specs for [[TextAnalysis.linearProbeTrain]]: bit-parity against a
  * driver-side GD model, and learning sanity on separable data.
  */
class LinearProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Driver-side model with the operator's exact semantics: milli
    * features, micro weights from zero, nano residuals,
    * w -= floor(sum(r*x) / (2N*1e6)) per round.
    */
  private def model(xs: Seq[(Seq[Long], Long)], iters: Int)
      : (Array[Long], Long) = {
    val dim = xs.head._1.length
    var w = Array.fill(dim)(0L)
    for (_ <- 1 to iters) {
      val grads = Array.fill(dim)(0L)
      xs.foreach { case (x, y) =>
        val s = x.zip(w).map { case (a, b) => a * b }.sum
        val r = s - y * 1000000000L
        for (j <- 0 until dim) grads(j) += x(j) * r
      }
      w = Array.tabulate(dim)(j => w(j) -
        math.floor(grads(j).toDouble / (xs.size * 2e6)).toLong)
    }
    val nCorrect = xs.count { case (x, y) =>
      val s = x.zip(w).map { case (a, b) => a * b }.sum
      (s >= 500000000L) == (y == 1L)
    }.toLong
    (w, nCorrect)
  }

  private val fixture: Seq[(Seq[Long], Long)] = {
    val rng = new scala.util.Random(7)
    (0 until 60).map { i =>
      val y = i % 2L
      // positives: high second feature; negatives: low — separable
      // with grid noise
      val f1 = if (y == 1L) 700L + rng.nextInt(300)
        else rng.nextInt(300).toLong
      val f2 = rng.nextInt(1000).toLong // uninformative
      (Seq(1000L, f1, f2), y)
    }
  }

  test("linearProbeTrain matches the driver-side GD model bit-for-bit") {
    val df = fixture.toDF("x", "y")
    val got = TextAnalysis.linearProbeTrain(df, "x", "y",
        Seq("bias", "sig", "noise"), iters = 4)
      .orderBy("feature")
      .as[(String, Long, Long, Long)].collect().toSeq
    val (w, nc) = model(fixture, iters = 4)
    val want = Seq(("bias", w(0), nc, 60L), ("noise", w(2), nc, 60L),
      ("sig", w(1), nc, 60L))
    assert(got == want)
  }

  test("the trained probe separates separable data") {
    val df = fixture.toDF("x", "y")
    val out = TextAnalysis.linearProbeTrain(df, "x", "y",
        Seq("bias", "sig", "noise"), iters = 8)
      .select("n_correct", "n_docs")
      .as[(Long, Long)].head()
    assert(out._2 == 60L)
    assert(out._1 >= 54L, s"probe should fit separable data: $out")
  }

  test("labelNoise matches the driver-side miner and surfaces flipped labels") {
    // flip three labels in the separable fixture — the probe learns
    // the majority pattern, so the flips become confident
    // disagreements the miner must surface
    val flipped = Set(10L, 21L, 32L)
    val rows = fixture.zipWithIndex.map { case ((x, y), i) =>
      (i.toLong, x, if (flipped(i.toLong)) 1L - y else y)
    }
    val got = TextAnalysis.labelNoise(rows.toDF("doc_id", "x", "y"),
        "x", "y", "doc_id", dim = 3, iters = 4, topN = 50)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // driver-side replay: train on the flipped labels, mine the
    // confident disagreements with the same grids and tie-break
    val (w, _) = model(rows.map { case (_, x, y) => (x, y) }, iters = 4)
    val want = rows.map { case (id, x, y) =>
      val s = x.zip(w).map { case (a, b) => a * b }.sum
      (id, y, s, math.abs(s - 500000000L))
    }.filter { case (_, y, s, _) => (s >= 500000000L) != (y == 1L) }
      .sortBy { case (id, _, _, m) => (-m, id) }.take(50)
    assert(got == want)
    val minedIds = got.map(_._1).toSet
    assert(flipped.subsetOf(minedIds),
      s"flipped labels must be mined: $flipped vs $minedIds")
  }
}
