package graft.engine

import org.apache.spark.sql.DataFrame
import java.time.Instant

/** Client-side helpers from the reference SDKs, kept for API parity.
  *
  * [[splitRange]] mirrors client/opentick.go:63-127: split [start, end]
  * into `n` contiguous sub-ranges (integer division semantics — the last
  * part absorbs the remainder). In the reference this drives scatter-
  * gather parallel range queries; on Spark a single range filter already
  * scans in parallel (SURVEY.md §3.3), so this exists for conformance
  * and for callers that genuinely want n independent queries.
  */
object Client {
  /** Integer split, reference semantics: d = (b-a)/n truncated. */
  def splitRange(start: Long, end: Long, n: Int): Seq[(Long, Long)] = {
    if (n <= 1) return Nil
    val d = (end - start) / n
    val parts = (0 until n).map { i =>
      val lo = start + i * d
      (lo, lo + d)
    }
    parts.init :+ (parts.last._1, end)
  }

  def splitRange(start: Double, end: Double, n: Int): Seq[(Double, Double)] = {
    if (n <= 1) return Nil
    val d = (end - start) / n
    val parts = (0 until n).map { i =>
      val lo = start + i * d
      (lo, lo + d)
    }
    parts.init :+ (parts.last._1, end)
  }

  /** Instant split, reference semantics: cumulative addition of the
    * truncated per-part duration (client/opentick.go:114-124).
    */
  def splitRange(start: Instant, end: Instant, n: Int): Seq[(Instant, Instant)] = {
    if (n <= 1) return Nil
    val total = java.time.Duration.between(start, end).toNanos
    val d = java.time.Duration.ofNanos(total / n)
    var cur = start
    val parts = (0 until n).map { _ =>
      val next = cur.plus(d)
      val p = (cur, next)
      cur = next
      p
    }
    parts.init :+ (parts.last._1, end)
  }

  /** Scatter-gather execution of a 2-placeholder range query over split
    * sub-ranges, boundary row deduped like the reference client's merge
    * (client/opentick.go:302-317; ranges are inclusive on both ends so
    * each shared boundary row appears twice).
    */
  def executeRanges(engine: Engine, sql: String,
      parts: Seq[(Any, Any)]): DataFrame = {
    require(parts.nonEmpty, "empty range split")
    val dfs = parts.map { case (lo, hi) =>
      engine.execute(sql, Seq(lo, hi))
    }
    dfs.reduce(_ union _).dropDuplicates()
  }
}
