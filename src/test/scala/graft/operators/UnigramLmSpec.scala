package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Specs for [[TextAnalysis.unigramLmTrain]] — the Viterbi hard-EM
  * unigram tokenizer trainer. The tiny corpus is small enough to walk
  * by hand: costs are nano-grid ln differences, so on "ab ab b" the
  * whole-word piece "ab" (seed count 2, cost ln(7)−ln(2)) beats the
  * two-piece path a·b ((ln7−ln2)+(ln7−ln3)) in round 1, and the
  * smoothing floor keeps the never-used "a" alive into round 2.
  */
class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-checked 2-round EM on a 3-word corpus") {
    val df = Seq("ab ab b").toDF("text")
    val got = TextAnalysis.unigramLmTrain(df, "text", rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // round 1: "ab" segments as [ab] (one piece, lower total cost),
    // "b" as [b] → counts ab:2, b:1. Round-2 inventory: a (floored to
    // 1), b:1, ab:2, total 4; "ab" again picks [ab]. Final counts:
    assert(got == Seq(("ab", 2L, 2L), ("b", 1L, 1L)), got.toString)
  }

  test("single chars never die: all-distinct corpus keeps every char") {
    val df = Seq("xy yx").toDF("text")
    val got = TextAnalysis.unigramLmTrain(df, "text", rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    // both words segment somehow; every piece reported was used ≥ once
    assert(got.values.forall(_ >= 1L), got.toString)
    assert(got.keys.forall(p => Set("x", "y", "xy", "yx")(p)),
      got.toString)
  }

  test("words over the length cap are dropped; empty corpus is empty") {
    val long = "q" * 17
    val df = Seq(s"$long zz").toDF("text")
    val got = TextAnalysis.unigramLmTrain(df, "text", rounds = 1)
      .collect().map(_.getString(0)).toSet
    assert(!got.exists(_.contains("q")), got.toString)
    val empty = TextAnalysis.unigramLmTrain(
      Seq.empty[String].toDF("text"), "text")
    assert(empty.collect().isEmpty)
    assert(empty.columns.toSeq == Seq("piece", "piece_len", "cnt"))
  }

  test("determinism: two runs produce identical inventories") {
    val df = Seq("the cat sat", "the bat sat on the mat").toDF("text")
    def run() = TextAnalysis.unigramLmTrain(df, "text", rounds = 2)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run() == run())
  }
}
