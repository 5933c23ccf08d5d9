package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded per-group top-k WITHOUT sorting whole groups.
  *
  * The textbook plan — `row_number() OVER (PARTITION BY g ORDER BY v
  * DESC) <= k` — must shuffle every row of every group to one task and
  * SORT the full group before it can discard anything: at 100 TB a
  * hot group is a straggler sort of billions of rows for a k-row
  * answer. This Aggregator keeps AT MOST `k` candidates per group in
  * each partial buffer, so the map side already discards, partials
  * merge in O(k), and nothing ever materializes a full group — the
  * same exchange count as any hash aggregation, with map-side combine
  * doing the heavy deletion. Output order inside a group and across
  * ties is deterministic: (ord DESC, key ASC).
  */
object GroupTopK {
  /** One candidate: ordering value + deterministic tiebreak key. */
  final case class OrdKey(ord: Double, key: Long)

  /** Aggregation buffer / result: bounded candidate list. A wrapper
    * case class (not a bare Seq) so `Encoders.product` applies.
    */
  final case class TopBuf(items: Seq[OrdKey])

  private def ordering: Ordering[OrdKey] =
    Ordering.by((o: OrdKey) => (-o.ord, o.key))

  /** Keep the winning k: sort by (ord DESC, key ASC), truncate. */
  private def trim(items: Seq[OrdKey], k: Int): Seq[OrdKey] =
    items.sorted(ordering).take(k)

  /** Partial-aggregating top-k: buffers hold ≤ 2k items between trims
    * (amortized O(log k) per row), merge trims immediately, finish
    * emits exactly the top k in (ord DESC, key ASC) order.
    */
  final class TopKAgg(k: Int) extends Aggregator[OrdKey, TopBuf, TopBuf] {
    require(k >= 1, s"k must be positive, got $k")
    override def zero: TopBuf = TopBuf(Vector.empty)
    override def reduce(b: TopBuf, a: OrdKey): TopBuf = {
      val grown = b.items :+ a
      // trim lazily at 2k: sorting every insert would make the map
      // side O(n·k log k); amortized this is one sort per k inserts
      TopBuf(if (grown.size >= 2 * k) trim(grown, k) else grown)
    }
    override def merge(x: TopBuf, y: TopBuf): TopBuf =
      TopBuf(trim(x.items ++ y.items, k))
    override def finish(b: TopBuf): TopBuf = TopBuf(trim(b.items, k))
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  }

  /** Top `k` rows per group of `groupCols`, ranked by `ordCol` DESC
    * with `keyCol` ASC as the deterministic tiebreak. Emits
    * (groupCols…, rank, key, ord) — rank is 1-based within the group.
    * `ordCol` must cast losslessly to double and `keyCol` to long
    * (ints, dates, exact decimals ≤ 2^53 all qualify).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], ordCol: String,
      keyCol: String, k: Int): DataFrame = {
    val tk = udaf(new TopKAgg(k), Encoders.product[OrdKey])
    df.select((groupCols.map(col) :+
        col(ordCol).cast("double").as("__ord") :+
        col(keyCol).cast("long").as("__key")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(tk(col("__ord"), col("__key")).as("__top"))
      .select((groupCols.map(col) :+
        posexplode(col("__top.items")).as(Seq("__pos", "__ok"))): _*)
      .select((groupCols.map(col) :+
        (col("__pos") + 1).cast("int").as("rank") :+
        col("__ok.key").as("key") :+
        col("__ok.ord").as("ord")): _*)
  }
}
