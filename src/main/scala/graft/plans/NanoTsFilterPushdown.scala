package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Restores parquet scan pruning for time-range predicates over the
  * epoch-nanos `ts` contract.
  *
  * [[graft.Tables.normalizeTs]] surfaces a µs-timestamp parquet column
  * as `unix_micros(cast(ts)) * 1000` — which means a user filter like
  * `ts >= 1.7e18` compares a DERIVED expression, and neither Catalyst
  * nor the parquet reader can prune row groups with it (the r5→r6
  * testdata re-encode silently traded pushdown away; at 100 TB that is
  * a full scan where a time-partitioned read was intended).
  *
  * This rule rewrites, inside Filter conditions only, any comparison
  * between that exact derived shape and a long literal into the
  * equivalent comparison on the UNDERLYING timestamp column against a
  * µs literal — the form `FileSourceStrategy` translates into parquet
  * row-group filters. Because the derived value is always a multiple
  * of 1000, each bound maps exactly:
  *
  *   t·1000 ≥ L  ⟺  t ≥ ⌈L/1000⌉        t·1000 > L  ⟺  t > ⌊L/1000⌋
  *   t·1000 ≤ L  ⟺  t ≤ ⌊L/1000⌋        t·1000 < L  ⟺  t < ⌈L/1000⌉
  *   t·1000 = L  ⟺  t = L/1000 when 1000 | L (left unrewritten
  *   otherwise: `false` would flip NULL → FALSE under an enclosing NOT)
  *
  * Null semantics are preserved (both sides are NULL exactly when `ts`
  * is NULL), so the rewrite is valid anywhere in the boolean tree.
  * TIMESTAMP_NTZ columns compare against an NTZ literal — value-exact
  * only because the session timezone is pinned UTC (the cast is
  * shift-free); the extractor refuses any other zone.
  */
object NanoTsFilterPushdown extends Rule[LogicalPlan] {

  /** Matches `unix_micros(ts) * 1000` / `1000 * unix_micros(ts)` where
    * `ts` is a timestamp attribute (possibly behind the shim's
    * NTZ→timestamp cast under a UTC zone). Yields (column, literal
    * builder for a µs bound).
    */
  private object NanoTs {
    def unapply(e: Expression): Option[(Expression, Long => Literal)] = {
      val inner = e match {
        case Multiply(UnixMicros(c), Literal(1000L, LongType), _) => Some(c)
        case Multiply(Literal(1000L, LongType), UnixMicros(c), _) => Some(c)
        case _ => None
      }
      inner.flatMap {
        // the NTZ→timestamp cast strips FIRST (a Cast's dataType is
        // TimestampType too): comparing the bare NTZ column against an
        // NTZ literal is what the parquet reader can push
        case Cast(c, TimestampType, tz, _)
            if c.dataType == TimestampNTZType &&
              tz.forall(z => z == "UTC" || z == "Etc/UTC" || z == "Z") =>
          Some((c, (us: Long) => Literal(us, TimestampNTZType)))
        case c if c.dataType == TimestampType =>
          Some((c, (us: Long) => Literal(us, TimestampType)))
        case _ => None
      }
    }
  }

  private def ceilDiv(l: Long): Long = Math.floorDiv(l + 999L, 1000L)
  private def floorDiv(l: Long): Long = Math.floorDiv(l, 1000L)

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case GreaterThanOrEqual(NanoTs(ts, lit), Literal(l: Long, LongType)) =>
      GreaterThanOrEqual(ts, lit(ceilDiv(l)))
    case GreaterThan(NanoTs(ts, lit), Literal(l: Long, LongType)) =>
      GreaterThan(ts, lit(floorDiv(l)))
    case LessThanOrEqual(NanoTs(ts, lit), Literal(l: Long, LongType)) =>
      LessThanOrEqual(ts, lit(floorDiv(l)))
    case LessThan(NanoTs(ts, lit), Literal(l: Long, LongType)) =>
      LessThan(ts, lit(ceilDiv(l)))
    case EqualTo(NanoTs(ts, lit), Literal(l: Long, LongType))
        if l % 1000L == 0L =>
      EqualTo(ts, lit(l / 1000L))
    // literal-on-the-left mirrors
    case GreaterThanOrEqual(Literal(l: Long, LongType), NanoTs(ts, lit)) =>
      LessThanOrEqual(ts, lit(floorDiv(l)))
    case GreaterThan(Literal(l: Long, LongType), NanoTs(ts, lit)) =>
      LessThan(ts, lit(ceilDiv(l)))
    case LessThanOrEqual(Literal(l: Long, LongType), NanoTs(ts, lit)) =>
      GreaterThanOrEqual(ts, lit(ceilDiv(l)))
    case LessThan(Literal(l: Long, LongType), NanoTs(ts, lit)) =>
      GreaterThan(ts, lit(floorDiv(l)))
    case EqualTo(Literal(l: Long, LongType), NanoTs(ts, lit))
        if l % 1000L == 0L =>
      EqualTo(ts, lit(l / 1000L))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter =>
      val r = rewrite(f.condition)
      if (r fastEquals f.condition) f else Filter(r, f.child)
  }
}
