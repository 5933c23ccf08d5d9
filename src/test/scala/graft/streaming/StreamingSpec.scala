package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming upsert: replays and PK overwrites resolve LWW") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Int, Long, Double)]
    val path = Files.createTempDirectory("graft-stream").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = Ingest.streamUpsert(
      mem.toDF.toDF("sec", "tm", "px"), path, Seq("sec", "tm"), ckpt)
    mem.addData((1, 10L, 1.0), (1, 20L, 2.0), (1, 10L, 1.5)) // in-batch dup
    q.processAllAvailable()
    mem.addData((1, 20L, 9.0)) // cross-batch overwrite
    q.processAllAvailable()
    q.stop()
    val out = Ingest.readUpserted(spark, path, Seq("sec", "tm"))
      .orderBy("sec", "tm").collect().toSeq
    assert(out == Seq(Row(1, 10L, 1.5), Row(1, 20L, 9.0)))
  }

  test("streaming OHLCV bars emit on watermark advance") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Int, java.sql.Timestamp, Long, Double)]
    val bars = Ingest.streamingOhlcv(
      mem.toDF.toDF("sec", "ts", "eid", "px"),
      "ts", "10 seconds", Seq("sec"), "px", "eid", "1 minute")
    val q = bars.writeStream.outputMode("append")
      .format("memory").queryName("bars_out").start()
    def t(s: Int) = new java.sql.Timestamp(s * 1000L)
    mem.addData((1, t(0), 1L, 10.0), (1, t(10), 2L, 30.0), (1, t(50), 3L, 20.0))
    q.processAllAvailable()
    // advance watermark past the first window
    mem.addData((1, t(130), 4L, 5.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("SELECT sec, open, high, low, close, n_events FROM bars_out")
      .collect().toSeq
    assert(out == Seq(Row(1, 10.0, 30.0, 10.0, 20.0, 3L)))
  }

  test("dedup within watermark drops exact replays") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Int, java.sql.Timestamp, Double)]
    val deduped = Ingest.dedupWithinWatermark(
      mem.toDF.toDF("k", "ts", "v"), "ts", "1 minute", Seq("k"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    // modern base time: epoch-0 events sit exactly on the initial
    // watermark and get dropped as late
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def t(s: Int) = new java.sql.Timestamp(base + s * 1000L)
    mem.addData((1, t(0), 1.0), (1, t(0), 1.0), (2, t(1), 2.0))
    q.processAllAvailable()
    q.stop()
    assert(spark.sql("SELECT count(*) FROM dedup_out").head().getLong(0) == 2L)
  }

  test("session window aggregation merges within gap, splits across it") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Int, java.sql.Timestamp, Double)]
    val sessions = Ingest.sessionAgg(
      mem.toDF.toDF("k", "ts", "v"), "ts", "5 seconds", Seq("k"),
      "10 seconds", "v")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def t(s: Int) = new java.sql.Timestamp(base + s * 1000L)
    // one session (0,5,9), gap, another at 60
    mem.addData((1, t(0), 1.0), (1, t(5), 2.0), (1, t(9), 3.0), (1, t(60), 4.0))
    q.processAllAvailable()
    mem.addData((1, t(200), 0.0)) // advance watermark, close both
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("SELECT n_events, sum_value FROM sess_out ORDER BY n_events")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 4.0), (3L, 6.0)))
  }

  test("tailTable streams engine inserts as micro-batches (live subscription)") {
    val wh = Files.createTempDirectory("graft-tail-wh").toString
    val engine = new graft.engine.Engine(spark, wh)
    engine.execute("create database tl")
    engine.execute("create table tl.t(k int, v double, primary key(k))")
    val td = engine.catalog.getSchema("tl", "t")
    val q = engine.catalog.tailTable(td)
      .writeStream.outputMode("append")
      .format("memory").queryName("tail_out").start()
    engine.execute("insert into tl.t values(1, 1.5)")
    q.processAllAvailable()
    assert(spark.sql("SELECT k, v FROM tail_out").collect().toSeq ==
      Seq(Row(1, 1.5)))
    // later batches arrive incrementally, __seq strictly increases
    engine.execute("insert into tl.t values(2, 2.5)")
    engine.execute("insert into tl.t values(1, 9.5)") // upsert = new version
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT k, v, __seq FROM tail_out ORDER BY __seq")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1, 1.5), (2, 2.5), (1, 9.5)))
  }

  test("streaming adj: a bar's adjusted value flips after a mid-stream _adj_ insert") {
    implicit val sq = spark.sqlContext
    val wh = Files.createTempDirectory("graft-sadj-wh").toString
    val engine = new graft.engine.Engine(spark, wh)
    engine.execute("create database sadj")
    val mem = MemoryStream[(Int, java.sql.Timestamp, Double)]
    val out = Files.createTempDirectory("graft-sadj-out").toString + "/bars"
    val ckpt = Files.createTempDirectory("graft-sadj-ckpt").toString
    val q = Ingest.streamAdjusted(
      mem.toDF.toDF("sec", "tm", "v"), engine, "sadj",
      "sec", "tm", "v", which = 1, backward = false, out, ckpt)
    def t(s: Int) = new java.sql.Timestamp(s * 1000L)
    // batch 1: no corporate actions yet -> unadjusted
    mem.addData((1, t(50), 100.0))
    q.processAllAvailable()
    // a split lands mid-stream: px 0.5 at t=100 (after the bar's time,
    // so the FORWARD suffix product now covers the bar)
    engine.execute("insert into sadj._adj_ values(1, 100, 0.5, 2)")
    // batch 2: the SAME bar re-sent now adjusts by 0.5
    mem.addData((1, t(50), 100.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(out)
      .select("adj_v").collect().map(_.getDouble(0)).sorted.toSeq
    assert(got == Seq(50.0, 100.0))
  }

  test("custom sessionizer (flatMapGroupsWithState) closes on gap timeout") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SessEvent]
    val sessions = Ingest.sessionize(mem.toDS(), gapMs = 10000L,
      watermark = "5 seconds")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("szr_out").start()
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def t(s: Int) = new java.sql.Timestamp(base + s * 1000L)
    mem.addData(SessEvent(7L, t(0), 1.0), SessEvent(7L, t(4), 2.0),
      SessEvent(7L, t(8), 3.0))
    q.processAllAvailable()
    mem.addData(SessEvent(8L, t(300), 9.0)) // watermark far past user 7
    q.processAllAvailable()
    mem.addData(SessEvent(8L, t(600), 1.0)) // push watermark to close 8's first
    q.processAllAvailable()
    q.stop()
    val out = spark.sql(
      "SELECT user, n, sumValue FROM szr_out ORDER BY user")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out.contains((7L, 3L, 6.0)))
  }
}
