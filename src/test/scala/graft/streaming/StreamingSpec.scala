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
    // the write path is a BLIND append: the in-batch duplicate key is
    // retained in the log (3 + 1 rows), resolution happens at read
    assert(spark.read.parquet(path).count() == 4)
    // compaction drops the losers but changes no read-side answer, and
    // a later append still beats compacted rows (original stamps kept)
    val compacted = Files.createTempDirectory("graft-compact").toString + "/t"
    Ingest.compactUpserted(spark, path, compacted, Seq("sec", "tm"))
    assert(spark.read.parquet(compacted).count() == 2)
    assert(Ingest.readUpserted(spark, compacted, Seq("sec", "tm"))
      .orderBy("sec", "tm").collect().toSeq == out)
    Ingest.upsertBatch(
      Seq((1, 10L, 7.5)).toDF("sec", "tm", "px"), 99L, compacted,
      Seq("sec", "tm"))
    assert(Ingest.readUpserted(spark, compacted, Seq("sec", "tm"))
      .orderBy("sec", "tm").collect().toSeq ==
      Seq(Row(1, 10L, 7.5), Row(1, 20L, 9.0)))
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

  test("streaming VWAP bars emit on watermark advance with exact weights") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Int, java.sql.Timestamp, Double, Long)]
    val bars = Ingest.streamingVwap(
      mem.toDF.toDF("sec", "ts", "px", "vol"),
      "ts", "10 seconds", Seq("sec"), "px", "vol", "1 minute")
    val q = bars.writeStream.outputMode("append")
      .format("memory").queryName("vwap_out").start()
    def t(s: Int) = new java.sql.Timestamp(s * 1000L)
    // bucket 0: (10*2 + 20*6) / 8 = 17.5
    mem.addData((1, t(0), 10.0, 2L), (1, t(30), 20.0, 6L))
    q.processAllAvailable()
    mem.addData((1, t(130), 5.0, 1L)) // advance watermark past bucket 0
    q.processAllAvailable()
    q.stop()
    val out = spark.sql(
      "SELECT sec, sum_pv, sum_vol, n_events, vwap FROM vwap_out").collect()
    assert(out.toSeq == Seq(Row(1, 140.0, 8L, 2L, 17.5)))
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

  test("streaming curation: filters, redacts, dedups across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val en = "The cat sat on the mat and it was a good day for the town " +
      "to gather and talk about all of the things in the news."
    val de = "der hund ist nicht zu hause und ich bin mit der katze im garten"
    val pii = "Send the notes to the team at desk@corp.example.net for " +
      "the review of the plan and the timing of it all."
    val curated = Ingest.curateStream(
      mem.toDF.toDF("doc_id", "text"), "text",
      keepLangs = Seq("en"), minQuality = 0.5)
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curate_out").start()
    mem.addData((1L, en), (2L, de), (3L, pii))
    q.processAllAvailable()
    // cross-batch duplicate of doc 1 AND of doc 3's text: state persists
    mem.addData((4L, en), (5L, "99999 88888 77777 66666 55555"))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql(
      "SELECT doc_id, n_emails, redacted FROM curate_out ORDER BY doc_id")
      .collect()
    // doc 2 german, doc 4 cross-batch dup, doc 5 junk — all dropped
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L), out.mkString(";"))
    assert(out(1).getInt(1) == 1 &&
      out(1).getString(2).contains("<EMAIL>"))
  }

  test("streaming document chunking: stateless, batch-identical output") {
    // chunkDocuments is expression-only, so the SAME operator runs on a
    // streaming DataFrame with zero state — batch/stream parity is the
    // point of the scan-local design
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val text = (1 to 25).map(i => s"tok$i").mkString(" ")
    val chunked = graft.operators.Sampling.chunkDocuments(
      mem.toDF.toDF("doc_id", "text"), "doc_id", "text",
      chunkTokens = 10, overlap = 2)
    val q = chunked.writeStream.outputMode("append")
      .format("memory").queryName("chunk_out").start()
    mem.addData((1L, text))
    q.processAllAvailable()
    mem.addData((2L, text)) // second micro-batch: no cross-batch state
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("SELECT doc_id, chunk_idx, chunk_text, " +
      "n_chunk_tokens FROM chunk_out ORDER BY doc_id, chunk_idx").collect()
    val batch = graft.operators.Sampling.chunkDocuments(
      Seq((1L, text), (2L, text)).toDF("doc_id", "text"),
      "doc_id", "text", chunkTokens = 10, overlap = 2)
      .orderBy("doc_id", "chunk_idx").collect()
    assert(out.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    // 25 tokens, step 8 -> ceil((25-2)/8) = 3 chunks at 0/8/16
    assert(out.count(_.getLong(0) == 1L) == 3)
    assert(out.filter(_.getLong(0) == 1L).map(_.getLong(3)).toSeq ==
      Seq(10L, 10L, 9L))
  }

  test("streaming classifier gate: batch-identical scores, zero state") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "zeta eta theta iota"))
    val gated = graft.streaming.Ingest.streamClassify(
      mem.toDF.toDF("doc_id", "text"), "doc_id", "text",
      minScore = Double.MinValue)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("clf_out").start()
    docs.foreach { d => mem.addData(d); q.processAllAvailable() }
    q.stop()
    val out = spark.sql(
      "SELECT id, n_toks, sum_w1000, score, label FROM clf_out ORDER BY id")
      .collect()
    val batch = graft.operators.TextAnalysis.classifierScore(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("id").collect()
    assert(out.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    // the gate actually gates: a threshold above every score keeps none
    val none = graft.streaming.Ingest.streamClassify(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      minScore = 2.0) // scores live in [-1, 1]
    assert(none.count() == 0)
  }

  test("streaming sketch maintenance: count-min and HLL registers equal batch, bounded state") {
    // the SAME batch operators run on a stream: hashing is stateless
    // expression work and the aggregation key space is the sketch's
    // FIXED geometry (depth×4096 counters / 4096 registers), so the
    // streaming state is O(1) in stream cardinality — the property
    // that makes sketches the right streaming distinct/frequency
    // machinery at 100 TB, proven here by complete-mode parity
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Long]
    val cm = graft.operators.Sketch.countMinSketch(
      mem.toDF.toDF("k"), "k")
    val q1 = cm.writeStream.outputMode("complete")
      .format("memory").queryName("cm_out").start()
    val hll = graft.operators.Sketch.hllRegisters(
      mem.toDF.toDF("k"), "k")
    val q2 = hll.writeStream.outputMode("complete")
      .format("memory").queryName("hll_out").start()
    mem.addData(1L to 500L: _*)
    q1.processAllAvailable(); q2.processAllAvailable()
    mem.addData(251L to 750L: _*) // overlap: counts add, registers max
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()
    val keys = ((1L to 500L) ++ (251L to 750L)).toDF("k")
    val cmBatch = graft.operators.Sketch.countMinSketch(keys, "k")
      .orderBy("row", "bucket").collect().map(_.toSeq).toSeq
    val cmStream = spark.sql(
      "SELECT row, bucket, cnt FROM cm_out ORDER BY row, bucket")
      .collect().map(_.toSeq).toSeq
    assert(cmStream == cmBatch, "count-min batch/stream parity")
    val hllBatch = graft.operators.Sketch.hllRegisters(keys, "k")
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    val hllStream = spark.sql(
      "SELECT bucket, register FROM hll_out ORDER BY bucket")
      .collect().map(_.toSeq).toSeq
    assert(hllStream == hllBatch, "hll batch/stream parity")
    // state bounded by sketch geometry, not stream size
    assert(cmStream.length <= 4 * 4096 && hllStream.length <= 4096)
  }

  test("streaming hamming dedup: stream-static join, batch parity, zero state") {
    implicit val sq = spark.sqlContext
    val dim = 40
    def vec(seed: Int, flips: Int): Array[Float] = {
      val v = Array.tabulate(dim)(i =>
        if (((i * 31 + seed * 7) % 5) < 2) 1.0f else -1.0f)
      (0 until flips).foreach(i => v(i * 3 % dim) = -v(i * 3 % dim))
      v
    }
    // static corpus: 3 vectors; stream: an exact twin of corpus id 10,
    // a 2-flip near-dup of id 11, and a far vector
    val corpus = Seq((10L, vec(1, 0)), (11L, vec(2, 0)), (12L, vec(3, 0)))
      .toDF("vec_id", "embedding")
    val mem = MemoryStream[(Long, Array[Float])]
    val flagged = graft.streaming.Ingest.streamHammingDedup(
      mem.toDF.toDF("vec_id", "embedding"), corpus,
      "vec_id", "embedding", dim, maxHamming = 3)
    val q = flagged.writeStream.outputMode("append")
      .format("memory").queryName("hamm_out").start()
    mem.addData((100L, vec(1, 0)), (101L, vec(2, 2)))
    q.processAllAvailable()
    mem.addData((102L, vec(1, 0).map(-_))) // inverted: far from all
    q.processAllAvailable()
    q.stop()
    val out = spark.sql(
      "SELECT DISTINCT new_id, old_id, hamming FROM hamm_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch parity: the same transform over the same rows as one batch
    val batch = graft.streaming.Ingest.streamHammingDedup(
      Seq((100L, vec(1, 0)), (101L, vec(2, 2)),
        (102L, vec(1, 0).map(-_))).toDF("vec_id", "embedding"),
      corpus, "vec_id", "embedding", dim, maxHamming = 3)
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == batch)
    // the exact twin matched its original at distance 0; the 2-flip
    // near-dup at distance 2; the inverted vector matched nothing
    assert(out.contains((100L, 10L, 0L)))
    assert(out.contains((101L, 11L, 2L)))
    assert(!out.exists(_._1 == 102L))
  }

  test("streaming minhash dedup flags near-dups of the indexed corpus per batch") {
    implicit val sq = spark.sqlContext
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").filter("doc_id < 100")
    val idx = Files.createTempDirectory("graft-smh-idx").toString
    graft.operators.Dedup.minhashIndexWrite(docs, "doc_id", "text", idx)
    val twin = docs.filter("doc_id IN (1, 2)")
      .selectExpr("doc_id + 100000 AS doc_id", "concat(text, ' zz') AS text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("graft-smh-out").toString + "/pairs"
    val ckpt = Files.createTempDirectory("graft-smh-ck").toString
    val q = Ingest.streamMinhashDedup(mem.toDF.toDF("doc_id", "text"),
      "doc_id", "text", idx, out, ckpt, threshold = 0.5)
    mem.addData((twin(0)._1, twin(0)._2), (900001L, "totally novel words " +
      "nothing like any corpus document at all in here today"))
    q.processAllAvailable()
    mem.addData((twin(1)._1, twin(1)._2)) // second batch hits the index too
    q.processAllAvailable()
    q.stop()
    val pairs = spark.read.parquet(out)
      .select("id_new", "id_old").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100001L, 1L)) && pairs.contains((100002L, 2L)),
      pairs.toString)
    assert(!pairs.exists(_._1 == 900001L), "novel doc must not match")
  }

  test("streaming PSI drift: stable batch stays quiet, shifted batch alarms") {
    implicit val sq = spark.sqlContext
    import graft.operators.Drift
    // baseline: values uniform over [0, 500) in 10 fixed 50-wide bins
    val baseline = Drift.binCounts(
      (0 until 500).map(i => ("m", i.toDouble)).toDF("g", "v"), "g", "v")
    val mem = MemoryStream[(String, Double)]
    val out = Files.createTempDirectory("graft-psi-out").toString + "/psi"
    val ckpt = Files.createTempDirectory("graft-psi-ck").toString
    val q = Ingest.psiStream(mem.toDF.toDF("g", "v"), "g", "v",
      baseline, out, ckpt)
    // batch 0: the same uniform shape — no drift
    mem.addData((0 until 500).map(i => ("m", i.toDouble)): _*)
    q.processAllAvailable()
    // batch 1: mass collapsed into the top bin — drifted
    mem.addData((0 until 500).map(i => ("m", 480.0 + (i % 20))): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(out)
      .select("batch_id", "psi_nano").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(0L) < 200000000L, s"stable batch must not alarm: $rows")
    assert(rows(1L) >= 200000000L, s"shifted batch must alarm: $rows")
  }

  test("Drift.psiNano reproduces the q_psi_drift registry query exactly") {
    import graft.operators.Drift
    val sfDir = "/root/testdata/sf0.001"
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select("event_type", "ts", "event_id", "value")
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
    val per = ev
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
    val a = Drift.binCounts(per.filter(col("rn") * 2 <= col("n")),
      "event_type", "value")
    val b = Drift.binCounts(per.filter(col("rn") * 2 > col("n")),
      "event_type", "value")
    val got = Drift.psiNano(a, b, "event_type")
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val want = graft.Queries.byName("q_psi_drift")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == want, s"operator vs registry:\n$got\n$want")
  }

  test("streaming gram moments: batch feed merges to the whole-stream answer") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = Files.createTempDirectory("graft-gram-out").toString + "/g"
    val ckpt = Files.createTempDirectory("graft-gram-ck").toString
    val q = Ingest.gramStream(mem.toDF.toDF("id", "vec"), "vec", out, ckpt)
    val b0 = Seq((1L, Seq(0.1f, -0.2f, 0.3f)), (2L, Seq(0.2f, 0.1f, -0.1f)))
    val b1 = Seq((3L, Seq(-0.3f, 0.25f, 0.05f)))
    mem.addData(b0: _*); q.processAllAvailable()
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    val feed = spark.read.parquet(out)
    assert(feed.select("batch_id").distinct().count() == 2)
    // merged moments (groupBy-sum over the feed) == one-shot GramAgg
    // over the union — the mergeability contract
    val merged = feed.groupBy("i", "j")
      .agg(sum("n").as("n"), sum("sxy").as("sxy"),
        sum("si").as("si"), sum("sj").as("sj"))
      .orderBy("i", "j").collect().toSeq
    val whole = (b0 ++ b1).toDF("id", "vec")
      .agg(graft.functions.GramAgg(col("vec"), 1e4).as("g"))
      .select(inline(col("g")))
      .orderBy("i", "j").collect().toSeq
    assert(merged.map(_.toSeq) == whole.map(_.toSeq),
      s"merged feed != whole-stream gram:\n$merged\n$whole")
  }

  test("streaming cluster-population monitor: batch feed merges to the one-shot counts") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = Files.createTempDirectory("graft-kmas-out").toString + "/k"
    val ckpt = Files.createTempDirectory("graft-kmas-ck").toString
    // static panel: centroids at (0,0) and (1,1) on the 1e4 grid
    val cents = Array(Array(0L, 0L), Array(10000L, 10000L))
    val q = Ingest.kmeansAssignStream(mem.toDF.toDF("id", "vec"), "vec",
      cents, out, ckpt)
    val b0 = Seq((1L, Seq(0.1f, 0.0f)), (2L, Seq(0.9f, 1.1f)),
      (3L, Seq(0.2f, -0.1f)))
    val b1 = Seq((4L, Seq(1.0f, 1.0f)), (5L, Seq(0.5f, 0.5f)))
    mem.addData(b0: _*); q.processAllAvailable()
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    val feed = spark.read.parquet(out)
    // per-batch rows equal the batch twin run on each batch alone
    val gotB0 = feed.filter(col("batch_id") === 0)
      .select("cid", "n").orderBy("cid")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(gotB0 == Seq((0, 2L), (1, 1L)))
    // (0.5, 0.5) is equidistant on the grid: ties break to the lower
    // cid, the same (d2, cid) order every lloyd consumer uses
    val gotB1 = feed.filter(col("batch_id") === 1)
      .select("cid", "n").orderBy("cid")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(gotB1 == Seq((0, 1L), (1, 1L)))
    // merged feed == one-shot batch twin over the union (mergeability)
    val merged = feed.groupBy("cid").agg(sum("n").as("n"))
      .orderBy("cid").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val whole = graft.operators.Similarity.assignCounts(
        (b0 ++ b1).toDF("id", "vec"), "vec", cents)
      .orderBy("cid").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(merged == whole, s"merged feed != one-shot: $merged vs $whole")
  }

  test("streaming curation with watermark evicts dedup state past horizon") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val en = "The cat sat on the mat and it was a good day for the town " +
      "to gather and talk about all of the things in the news."
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def t(s: Int) = new java.sql.Timestamp(base + s * 1000L)
    val curated = Ingest.curateStream(
      mem.toDF.toDF("doc_id", "ts", "text"), "text",
      keepLangs = Seq("en"), minQuality = 0.5,
      watermark = Some(("ts", "10 seconds")))
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curate_wm_out").start()
    mem.addData((1L, t(0), en))
    q.processAllAvailable()
    // duplicate INSIDE the horizon: dropped
    mem.addData((2L, t(5), en))
    q.processAllAvailable()
    // advance the watermark far past the horizon, then replay: the
    // evicted state no longer blocks it (the documented straggler gap a
    // periodic batch sweep closes)
    mem.addData((3L, t(1000), "An unrelated clean note about the day " +
      "and the town and the news for all of the people."))
    q.processAllAvailable()
    mem.addData((4L, t(1005), en))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT doc_id FROM curate_wm_out ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L, 4L), got.toString)
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

  test("streaming kmv: bounded bottom-k state equals batch sketch") {
    implicit val sq = spark.sqlContext
    val k = 16
    def hashed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("hex", md5(col("key").cast("string")))
      .select(concat(lit("g"), pmod(col("key"), lit(2L))).as("g"),
        expr(graft.operators.Sketch.hex52Sql("hex")).as("hv"))
    val mem = MemoryStream[Long]
    val sk = Ingest.streamingKmv(hashed(mem.toDF.toDF("key")).as[KmvIn], k)
    val q = sk.writeStream.outputMode("update")
      .format("memory").queryName("kmv_out").start()
    mem.addData(1L to 300L: _*)
    q.processAllAvailable()
    mem.addData(200L to 600L: _*) // overlap: state dedups re-seen keys
    q.processAllAvailable()
    q.stop()
    // memory sink in update mode appends each emission; the LAST row
    // per group is the final sketch
    val rows = spark.sql("SELECT g, mins FROM kmv_out").collect()
    val got = rows.zipWithIndex.groupBy(_._1.getString(0))
      .map { case (g, rs) => g -> rs.maxBy(_._2)._1.getSeq[Long](1).toSeq }
    val batch = graft.operators.Sketch.kmvSketch(
      ((1L to 300L) ++ (200L to 600L)).toDF("key")
        .withColumn("g", concat(lit("g"), pmod(col("key"), lit(2L)))),
      Seq("g"), "key", k)
      .collect().groupBy(_.getAs[String]("g"))
      .map { case (g, rs) => g -> rs.map(_.getAs[Long]("hv")).sorted.toSeq }
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got.values.forall(_.length == k), "state not at capacity k")
  }

  test("stream-stream join: time-bounded inner join equals batch") {
    // the two-stream correlation shape (order events joined to the
    // fills that land within 5s): both sides watermarked, the range
    // condition bounds the buffered state, and every emitted pair
    // equals the batch join over the same rows — inner joins emit
    // eagerly, the watermark only bounds state retention
    implicit val sq = spark.sqlContext
    val memA = MemoryStream[(Long, Long, Double)]
    val memB = MemoryStream[(Long, Long, Double)]
    val a = memA.toDF.toDF("k", "ams", "va")
      .withColumn("ats", timestamp_millis(col("ams")))
      .withWatermark("ats", "10 seconds")
    val b = memB.toDF.toDF("k2", "bms", "vb")
      .withColumn("bts", timestamp_millis(col("bms")))
      .withWatermark("bts", "10 seconds")
    val joined = a.join(b, col("k") === col("k2") &&
        col("bts") >= col("ats") &&
        col("bts") <= col("ats") + expr("interval 5 seconds"))
      .select("k", "ams", "bms", "va", "vb")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    val aRows = Seq((1L, 1000L, 1.0), (1L, 20000L, 2.0), (2L, 1000L, 3.0))
    val bRows = Seq((1L, 3000L, 10.0), (1L, 26000L, 20.0),
      (2L, 7000L, 30.0), (3L, 1000L, 40.0))
    try {
      memA.addData(aRows: _*)
      memB.addData(bRows.take(2): _*)
      q.processAllAvailable()
      memB.addData(bRows.drop(2): _*) // late-arriving second batch
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM ssj_out").collect()
        .map(_.toSeq).toSet
      val want = aRows.toDF("k", "ams", "va")
        .join(bRows.toDF("k2", "bms", "vb"),
          col("k") === col("k2") && col("bms") >= col("ams") &&
            col("bms") <= col("ams") + 5000L)
        .select("k", "ams", "bms", "va", "vb")
        .collect().map(_.toSeq).toSet
      assert(got == want, s"got $got want $want")
      // (1, 1000)-(1, 3000) matches; (1, 20000) has no fill within 5s;
      // the unmatched k=3 fill never emits
      assert(want.exists(_(1) == 1000L) && !want.exists(_(0) == 3L))
    } finally q.stop()
  }

  test("streaming pattern match: batch-parity across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val judged = Ingest.streamPatternMatch(
      mem.toDF.toDF("user", "ts", "eventId", "eventType")
        .as[graft.streaming.PatEvent])
    val q = judged.writeStream.outputMode("append")
      .format("memory").queryName("pat_out").start()
    def t(s: Int) = new java.sql.Timestamp(s * 1000L)
    try {
      // batch 1: user 1 signs up then errors; the purchase in batch 2
      // must see the error that arrived in the EARLIER batch (state
      // crosses micro-batches)
      mem.addData((1L, t(0), 1L, "signup"), (1L, t(5), 2L, "error"),
        (2L, t(1), 3L, "signup"))
      q.processAllAvailable()
      mem.addData(
        (1L, t(10), 4L, "purchase"), // error after signup → no match
        (1L, t(11), 5L, "signup"),
        (1L, t(12), 6L, "purchase"), // fresh signup → match
        (2L, t(10), 7L, "purchase"), // signup, no error → match
        // same-ts tiebreak: signup eventId 9 > purchase order position?
        // purchase id 8 at t=20 with signup id 9 at t=20: the signup
        // sorts AFTER the purchase (same ts, larger id) → not visible
        (3L, t(20), 8L, "purchase"), (3L, t(20), 9L, "signup"))
      q.processAllAvailable()
      val got = spark.sql("SELECT user, eventId, isMatch FROM pat_out")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2))
        .toMap
      assert(got == Map((1L, 4L) -> false, (1L, 6L) -> true,
        (2L, 7L) -> true, (3L, 8L) -> false))
    } finally q.stop()
  }
}
