package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the streaming block of [[Bench]] (round-6 verdict item 7):
  * the file-per-trigger ingest loop must drain every sf event exactly
  * once through the blind-append upsert with read-side LWW (the
  * primary path since round-10 item 4). Runs at sf0.001 (1k events)
  * so the per-round BENCH artifact can't be the first execution of
  * this path.
  */
class BenchStreamingSpec extends AnyFunSuite {
  test("bench streaming loop drains all events through the upsert log") {
    val spark = SparkTestSession.spark
    val (wall, rows, profile) =
      Bench.streamingLoop(spark, "/root/testdata/sf0.001")
    assert(rows == 1000L, s"expected the sf0.001 events table, got $rows")
    assert(wall > 0.0)
    // the per-batch profile (round-11 item 3) must report the named
    // trigger components, non-negative, with addBatch ≤ trigger wall
    assert(profile.getOrElse("nBatches", 0.0) >= 1.0, profile.toString)
    for (k <- Seq("addBatch", "walCommit", "commitOffsets",
        "triggerExecution"))
      assert(profile.getOrElse(k, -1.0) >= 0.0, s"$k missing: $profile")
    assert(profile("addBatch") <= profile("triggerExecution") + 1e-9,
      profile.toString)
  }

  test("component variants (statestore/rawwrite) drain the same corpus") {
    val spark = SparkTestSession.spark
    for (v <- Seq("statestore", "rawwrite")) {
      val (wall, rows, _) =
        Bench.streamingLoop(spark, "/root/testdata/sf0.001", 1, v)
      assert(rows == 1000L, s"variant $v: expected 1k events, got $rows")
      assert(wall > 0.0, s"variant $v")
    }
  }
}
