package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** One event for the custom sessionizer ([[Ingest.sessionize]]). */
final case class SessEvent(user: Long, ts: java.sql.Timestamp, value: Double)

/** Sessionizer state kept per user between micro-batches. */
final case class SessState(startMs: Long, lastMs: Long, n: Long, sum: Double)

/** One closed session emitted by [[Ingest.sessionize]]. */
final case class Session(user: Long, startMs: Long, endMs: Long, n: Long,
    sumValue: Double)

/** One hashed key for the streaming KMV sketch ([[Ingest.streamingKmv]]). */
final case class KmvIn(g: String, hv: Long)

/** One event for the streaming pattern matcher
  * ([[Ingest.streamPatternMatch]]).
  */
final case class PatEvent(user: Long, ts: java.sql.Timestamp,
    eventId: Long, eventType: String)

/** Pattern-matcher state per user: the (epochMs, eventId) order key of
  * the most recent signup / error seen; −1 sentinels = none yet.
  */
final case class PatState(sTs: Long, sId: Long, eTs: Long, eId: Long)

/** One purchase judged by [[Ingest.streamPatternMatch]]. */
final case class PatMatch(user: Long, eventId: Long, isMatch: Boolean)

/** Per-group bottom-k sketch emitted each micro-batch: `mins` ascending. */
final case class KmvSketchRow(g: String, mins: Seq[Long])

/** Structured-Streaming ingest — the Spark-native replacement for the
  * reference's async/batch insert protocol (SURVEY.md §2.8): pipelined
  * batches become micro-batches, blind FDB upserts become append-log
  * writes resolved last-write-wins on read, and the response path is a
  * streaming sink.
  */
object Ingest {
  /** Upsert a micro-batch into an append-log table dir as a BLIND
    * APPEND — the FDB-upsert analog (reference query.go:294-307
    * one-txn-batch): the write path never reads, aggregates, or
    * shuffles. Rows are stamped with the micro-batch id (monotonic per
    * query) plus their in-batch position, and [[readUpserted]] resolves
    * last-write-wins over BOTH stamps, so replays, cross-batch PK
    * overwrites, and in-batch duplicates all resolve at read with the
    * same winner the old write-side window picked ("last write in the
    * batch wins", position = `monotonically_increasing_id`, exactly the
    * order key the previous in-write window used).
    *
    * Moving the LWW window out of the hot write path removes the one
    * per-batch shuffle ingest had (measured 0.27 s/batch of the
    * streaming-vs-batch gap in BENCH_FULL_r9's decomposition); the read
    * side was already paying a window over the log, which now just
    * orders by two stamps instead of one. The log retains in-batch
    * duplicate keys until compaction — the standard LSM trade: blind
    * fast writes, resolve-on-read, merge in the background.
    */
  def upsertBatch(batch: DataFrame, batchId: Long, path: String,
      keys: Seq[String]): Unit =
    batch
      .withColumn("__seq", lit(batchId))
      .withColumn("__pos", monotonically_increasing_id())
      .write.mode("append").parquet(path)

  /** Start a streaming upsert into `path`, keyed by `keys`; read back
    * with [[readUpserted]].
    */
  def streamUpsert(stream: DataFrame, path: String, keys: Seq[String],
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: Dataset[Row], id: Long) =>
        upsertBatch(batch.toDF(), id, path, keys))
      .start()

  /** Last-write-wins view of a streamed upsert log: latest batch wins,
    * ties within a batch broken by in-batch position (see
    * [[upsertBatch]] — the write is a blind append, so this window is
    * where ALL conflict resolution happens).
    */
  def readUpserted(spark: SparkSession, path: String,
      keys: Seq[String]): DataFrame = {
    val raw = spark.read.parquet(path)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__seq").desc, col("__pos").desc)
    raw.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__seq", "__pos")
  }

  /** Background COMPACTION for a blind-append upsert log — the merge
    * leg of the LSM trade [[upsertBatch]] makes: rewrite the log at
    * `destPath` keeping only each key's last-write-wins winner. Winners
    * keep their ORIGINAL (__seq, __pos) stamps, so the compacted log is
    * semantically indistinguishable from the original under
    * [[readUpserted]]: any future micro-batch (higher __seq) still
    * wins, and any replayed old batch still loses, exactly as it would
    * have against the uncompacted log. One window shuffle on the key —
    * the same plan shape as a read, amortized across every read that
    * follows instead of paid per micro-batch on the write path.
    */
  def compactUpserted(spark: SparkSession, path: String,
      destPath: String, keys: Seq[String]): Unit = {
    val raw = spark.read.parquet(path)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__seq").desc, col("__pos").desc)
    raw.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .write.mode("overwrite").parquet(destPath)
  }

  /** Event-time deduplication on PK within the watermark horizon —
    * exactly-once-per-key ingest for at-least-once sources.
    */
  def dedupWithinWatermark(stream: DataFrame, tsCol: String,
      watermark: String, keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicates(keys :+ tsCol)

  /** STREAMING corpus curation: [[graft.operators.Curate]]'s filter
    * chain over an unbounded document stream. Language/quality/PII
    * stages are stateless expressions (identical plan streaming or
    * batch) and run BEFORE the stateful dedup, so state only accrues
    * for documents that survive the filters. Exact dedup keys on the
    * normalized-content hash:
    *
    *  - `watermark = Some((tsCol, horizon))` → content-hash state is
    *    EVICTED once the watermark passes (Spark's
    *    `dropDuplicatesWithinWatermark`) — the 100 TB configuration:
    *    bounded state, duplicates caught within the horizon, a
    *    periodic batch [[graft.operators.Curate.curate]] sweep catches
    *    stragglers beyond it;
    *  - `watermark = None` → global dedup state (exact, unbounded —
    *    only for bounded backfills).
    *
    * Emits the input columns plus (lang_pred, quality_score, n_chars,
    * n_tokens, n_emails, redacted); no `n_copies` (a per-group count
    * needs the batch form's window — streaming drops, not counts).
    */
  def curateStream(stream: DataFrame, textCol: String,
      keepLangs: Seq[String] = Seq("en"), minQuality: Double = 0.3,
      watermark: Option[(String, String)] = None): DataFrame = {
    import graft.operators.{Curate, TextAnalysis}
    // the ONE shared stateless prefix — batch and streaming curation
    // cannot drift
    val kept = Curate.filterChain(stream, textCol, keepLangs, minQuality)
    val deduped = watermark match {
      case Some((tsCol, horizon)) =>
        kept.withWatermark(tsCol, horizon)
          .dropDuplicatesWithinWatermark("__h")
      case None => kept.dropDuplicates("__h")
    }
    deduped
      .drop("__h", "alpha_ratio", "digit_ratio", "punct_ratio",
        "avg_token_len")
      .withColumn("n_emails",
        size(regexp_extract_all(col(textCol),
          lit(TextAnalysis.emailRe), lit(0))))
      .withColumn("redacted",
        regexp_replace(col(textCol), TextAnalysis.emailRe, "<EMAIL>"))
  }

  /** STREAMING classifier gate: score every arriving document with the
    * hashed-feature linear model and keep those at or above
    * `minScore`. [[graft.operators.TextAnalysis.classifierScore]] is a
    * pure per-row array fold (zero shuffles, zero state), so the SAME
    * operator runs on the stream unchanged — batch and streaming
    * quality gates cannot drift, and the stream needs no watermark for
    * it. Emits the scored projection (id, n_toks, sum_w1000, score,
    * label) for surviving documents.
    */
  def streamClassify(stream: DataFrame, idCol: String, textCol: String,
      minScore: Double): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.classifierScore(stream, idCol, textCol)
      .filter(col("score") >= minScore)
  }

  /** STREAMING near-dup detection against a persisted
    * [[graft.operators.Dedup.minhashIndexWrite]] corpus index: each
    * micro-batch runs [[graft.operators.Dedup.minhashDedupIncremental]]
    * (the batch's banded buckets broadcast against the index scan) and
    * appends flagged (id_new, id_old, jaccard) pairs to `outPath`. No
    * streaming state accrues — the state IS the on-disk index,
    * maintained by periodic batch rebuilds — so this runs forever at
    * any corpus size: per micro-batch cost scales with the batch, not
    * the corpus.
    */
  def streamMinhashDedup(stream: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, checkpoint: String,
      shingleSize: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.6): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // the shingleSize/numHashes/bands MUST match the ones the index
        // was built with — mismatched banding finds zero candidates
        val newSh = graft.operators.Dedup
          .shingles(batch.toDF(), idCol, textCol, shingleSize)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // persist/unpersist per micro-batch: a forever-running stream
        // must not accrue cached shingle blocks batch after batch
        try graft.operators.Dedup
          .minhashDedupFromShingles(newSh, indexPath, numHashes, bands,
            threshold)
          .write.mode("append").parquet(outPath)
        finally newSh.unpersist()
      }
      .start()

  /** STREAMING distribution-drift monitor: per micro-batch PSI of
    * `valueCol` against a STATIC baseline histogram (a
    * [[graft.operators.Drift.binCounts]] artifact — built once from a
    * reference window, broadcast-small at ≤ groups·nBins rows). Each
    * batch appends (batch_id, groupCol, n_a, n_b, psi_nano) rows to
    * `outPath` — the alarm feed a pipeline tails (psi_nano ≥ 2e8 is
    * the conventional "distribution moved" line).
    *
    * No streaming state at all — the state IS the baseline artifact
    * (the [[streamMinhashDedup]] pattern): per-batch cost is one
    * map-side-combined histogram of the batch plus a tiny join, so the
    * monitor runs forever at any corpus size and re-baselining is just
    * swapping the artifact.
    */
  def psiStream(stream: DataFrame, groupCol: String, valueCol: String,
      baselineCounts: DataFrame, outPath: String, checkpoint: String,
      binWidth: Double = 50.0, nBins: Int = 10): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        graft.operators.Drift
          .psiNano(baselineCounts,
            graft.operators.Drift.binCounts(batch.toDF(), groupCol,
              valueCol, binWidth, nBins),
            groupCol, nBins)
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** STREAMING embedding-moment monitor: per micro-batch integer GRAM
    * MOMENTS of `vecCol` via the native
    * [[graft.functions.GramAgg]] aggregate, appended to `outPath` as
    * (batch_id, i, j, n, sxy, si, sj) rows. Because the moments are
    * MERGEABLE (elementwise integer sums), the running covariance of
    * the whole stream — or of any batch window — reconstructs
    * downstream with one groupBy-sum over this feed
    * ([[graft.operators.Incremental]]-style), no reprocessing: the
    * incremental covariance/whitening statistic a training pipeline
    * keeps current as embeddings arrive.
    *
    * No streaming state ([[psiStream]]'s pattern): per-batch cost is
    * one scan of the batch into a single long[] buffer per partition,
    * and the appended artifact is dim²/2 rows per batch regardless of
    * batch size.
    */
  def gramStream(stream: DataFrame, vecCol: String, outPath: String,
      checkpoint: String, grid: Double = 1e4): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        batch.toDF()
          .agg(graft.functions.GramAgg(col(vecCol), grid).as("g"))
          .select(inline(col("g")))
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** STREAMING cluster-population monitor: per micro-batch assignment
    * counts of incoming embeddings against a STATIC centroid panel (a
    * [[graft.operators.Similarity.kmeansLloyd]] fit), appended to
    * `outPath` as (batch_id, cid, n) rows — the "is new data drifting
    * off my semantic shard layout" probe a training-data pipeline
    * keeps running as a corpus grows. Per-batch cost is one scan-local
    * codegen'd argmin over centroid LITERALS plus a k-group count;
    * counts are MERGEABLE integer sums, so any window's population
    * histogram reconstructs downstream with one groupBy-sum over this
    * feed, and the whole-stream totals equal the one-shot batch twin
    * ([[graft.operators.Similarity.assignCounts]]) exactly.
    *
    * No streaming state ([[psiStream]]'s pattern): the appended feed
    * IS the artifact, k rows per batch regardless of batch size.
    */
  def kmeansAssignStream(stream: DataFrame, vecCol: String,
      centroids: Array[Array[Long]], outPath: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        graft.operators.Similarity.assignCounts(batch.toDF(), vecCol,
            centroids)
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** STREAMING embedding near-dup detection against a STATIC quantized
    * corpus, as a TRUE stream-static equi-join (no foreachBatch, no
    * streaming state): the stream side packs sign bits
    * ([[graft.operators.Similarity.signBits]] — pure expressions, fully
    * stream-safe), candidates block on agreement of one 32-bit sign
    * WORD (near-colinear vectors agree on whole words with high
    * probability — the Hamming analog of the minhash band), and the
    * exact integer Hamming distance verifies. Per-batch cost scales
    * with batch × bucket size, never the corpus. A pair surfaces once
    * per agreeing word (bounded by dim/32 — dedup downstream if
    * exactly-once pairs matter; a stateless stream can't distinct).
    */
  def streamHammingDedup(stream: DataFrame, static: DataFrame,
      idCol: String, vecCol: String, dim: Int,
      maxHamming: Int): DataFrame = {
    import graft.operators.Similarity.signBits
    def banded(df: DataFrame, prefix: String): DataFrame =
      df.select(col(idCol).as(s"${prefix}_id"),
          signBits(col(vecCol), dim).as(s"${prefix}_bits"))
        .select(col(s"${prefix}_id"), col(s"${prefix}_bits"),
          posexplode(col(s"${prefix}_bits"))
            .as(Seq("word_idx", s"${prefix}_word")))
    val s = banded(stream, "new")
    val c = banded(static, "old")
    val hamming = aggregate(
      zip_with(col("new_bits"), col("old_bits"),
        (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    s.join(c, Seq("word_idx")).filter(
        col("new_word") === col("old_word") &&
        col("new_id") =!= col("old_id"))
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select("new_id", "old_id", "hamming")
  }

  /** Session-window aggregation: events within `gap` of each other merge
    * into one session per key; closed sessions emit when the watermark
    * passes (append mode).
    */
  def sessionAgg(stream: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String], gap: String, valueCol: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy((keys.map(col) :+ session_window(col(tsCol), gap)): _*)
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))

  /** Custom stateful operator (flatMapGroupsWithState): per-user
    * sessionization with explicit state and event-time timeout — the
    * extension point for stateful logic session_window can't express
    * (e.g. value-dependent session splits). Emits a [[Session]] when the
    * gap timeout fires.
    */
  def sessionize(events: Dataset[SessEvent], gapMs: Long,
      watermark: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.startMs, s.lastMs, s.n, s.sum))
          } else {
            val evs = it.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            for (e <- evs) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(SessState(s.startMs, math.max(s.lastMs, t),
                    s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += Session(user, s.startMs, s.lastMs, s.n, s.sum)
                  cur = Some(SessState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming MATCH_RECOGNIZE-lite: q_pattern_match's
    * signup→purchase-with-no-error-between rule as an incremental
    * stateful operator — per user, state is just the ORDER KEY
    * ((epochMs, eventId) lexicographic) of the latest signup and
    * latest error (four longs, bounded by the user population; no
    * event buffer, no timeout needed), and each arriving purchase is
    * judged against it immediately. Events inside a micro-batch are
    * applied in (ts, eventId) order, so the judgment matches the batch
    * window exactly whenever per-user arrival respects event order at
    * batch granularity (the append-log replay case); a purchase at the
    * same timestamp as a signup sees it only if the signup's eventId
    * is smaller — the batch query's strict "preceding rows" frame.
    */
  def streamPatternMatch(events: Dataset[PatEvent]): Dataset[PatMatch] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user)
      .flatMapGroupsWithState[PatState, PatMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[PatEvent], state: GroupState[PatState]) =>
          var st = state.getOption.getOrElse(PatState(-1L, -1L, -1L, -1L))
          val out = Seq.newBuilder[PatMatch]
          for (e <- it.toSeq.sortBy(ev => (ev.ts.getTime, ev.eventId))) {
            val t = e.ts.getTime
            e.eventType match {
              case "purchase" =>
                val matched = st.sTs >= 0 &&
                  (st.eTs < 0 ||
                    st.sTs > st.eTs ||
                    (st.sTs == st.eTs && st.sId > st.eId))
                out += PatMatch(user, e.eventId, matched)
              case "signup" => st = PatState(t, e.eventId, st.eTs, st.eId)
              case "error" => st = PatState(st.sTs, st.sId, t, e.eventId)
              case _ => ()
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming KMV distinct sketch: per-group bottom-k hash minima
    * maintained by mapGroupsWithState in a sorted array of ≤ k longs —
    * bounded state REGARDLESS of stream length or key cardinality, the
    * property that makes sketches the right streaming distinct counter
    * (same discipline as the streamed count-min/HLL parity specs).
    * Emits the updated sketch every micro-batch (Update mode); the
    * final emission per group equals the batch
    * [[graft.operators.Sketch.kmvSketch]] over the same rows, so
    * stream and batch estimates agree exactly.
    */
  def streamingKmv(rows: Dataset[KmvIn], k: Int): Dataset[KmvSketchRow] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.g)
      .mapGroupsWithState[Array[Long], KmvSketchRow](
        GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[KmvIn], state: GroupState[Array[Long]]) =>
          val merged = (state.getOption.getOrElse(Array.empty[Long])
              .iterator ++ it.map(_.hv))
            .toArray.distinct.sorted.take(k)
          state.update(merged)
          KmvSketchRow(g, merged.toSeq)
      }
  }

  /** Streaming corporate-action adjustment: live bars stream in while
    * the engine's `_adj_` table keeps changing. Every micro-batch
    * re-reads the (small, bounded) factor table, rebuilds the broadcast
    * factor map, and applies the codegen multiplier
    * ([[graft.functions.AdjMultiplier]]) — so an `_adj_` insert landing
    * mid-stream adjusts every later micro-batch. This is the streaming
    * form of the reference's adjCache invalidation (reference
    * adj.go:34-47): per-batch re-broadcast instead of cache eviction.
    *
    * `which` 1=price 2=volume; `tmCol` must be a timestamp column.
    */
  def streamAdjusted(stream: DataFrame, engine: graft.engine.Engine,
      db: String, secCol: String, tmCol: String, valueCol: String,
      which: Int, backward: Boolean, outPath: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val adjTd = engine.catalog.getSchema(db, "_adj_")
        val factors =
          graft.operators.Adj.factors(engine.catalog.readTable(adjTd))
        val bc = spark.sparkContext.broadcast(factors)
        batch.toDF()
          .withColumn(s"adj_$valueCol",
            graft.operators.Adj.adjusted(spark, bc, col(valueCol),
              col(secCol), col(tmCol), which, backward))
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** Streaming OHLCV bars: tumbling event-time windows with a watermark;
    * min_by/max_by keep open/close without a sort. Append-mode emits
    * each bar once, when the watermark passes the window end.
    */
  /** Streaming VWAP bars: tumbling event-time windows emit once the
    * watermark passes; price×volume and volume sum in the aggregation
    * state (map-side combined per micro-batch), the VWAP divides at
    * emit. The streaming sibling of
    * [[graft.operators.Resample.vwap]].
    */
  def streamingVwap(stream: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String], valueCol: String, volCol: String,
      windowDur: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy((keys.map(col) :+ window(col(tsCol), windowDur)): _*)
      .agg(
        sum(col(valueCol) * col(volCol)).as("sum_pv"),
        sum(col(volCol)).as("sum_vol"),
        count(lit(1)).as("n_events"))
      .withColumn("vwap", col("sum_pv") / col("sum_vol"))

  def streamingOhlcv(stream: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String], valueCol: String, tieBreak: String,
      windowDur: String): DataFrame = {
    val ord = struct(col(tsCol), col(tieBreak))
    stream
      .withWatermark(tsCol, watermark)
      .groupBy((keys.map(col) :+ window(col(tsCol), windowDur)): _*)
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
  }
}
