package graft.plans

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The epoch-nanos ts contract must not cost parquet pruning: a range
  * filter on the DERIVED `unix_micros(ts)*1000` column rewrites (via
  * [[NanoTsFilterPushdown]]) into a pushable predicate on the
  * underlying timestamp column — and the rewrite is value-exact on
  * every bound shape, including non-multiple-of-1000 literals.
  */
class NanoTsPushdownSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plannedScan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("ts range filter reaches the parquet scan as PushedFilters") {
    val ev = Tables.load(spark, sf, "events")
    val mid = ev.agg(expr("percentile_approx(ts, 0.5)")).head().getLong(0)
    val plan = plannedScan(ev.filter(col("ts") >= mid && col("ts") < mid + 3600L * 1000000000L))
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThanOrEqual(ts,") &&
      plan.contains("LessThan(ts,"),
      s"ts bounds not pushed:\n${plan.take(1200)}")
  }

  test("rewrite is value-exact for every comparison and rounding case") {
    val ev = Tables.load(spark, sf, "events").select("ts")
    // driver-side reference: the raw nanos values, compared in Scala —
    // no plan, no rule, nothing to rewrite
    val all = ev.collect().map(_.getLong(0))
    val anchor = all.sorted.apply(all.length / 2)
    // bounds that are multiples of 1000, and deliberately-misaligned
    // ones that exercise the ceil/floor mapping
    val bounds = Seq(anchor, anchor + 1L, anchor - 1L, anchor + 999L,
      anchor + 1000L, anchor - 999L)
    val ops: Seq[(String, (Long, Long) => Boolean)] = Seq(
      (">=", _ >= _), (">", _ > _), ("<=", _ <= _), ("<", _ < _),
      ("=", _ == _))
    for (b <- bounds; (op, f) <- ops) {
      val got = ev.filter(expr(s"ts $op ${b}L")).count()
      val want = all.count(v => f(v, b)).toLong
      assert(got == want, s"ts $op $b: rewrite gives $got, expected $want")
    }
  }

  test("NULL semantics survive under NOT (no rewrite to bare false)") {
    import spark.implicits._
    val withNull = Seq[(java.lang.Long, java.lang.Long)]((1L, null))
      .toDF("id", "us")
      .select(col("id"),
        (unix_micros(col("us").cast("timestamp")) * lit(1000L)).as("ts"))
    // ts = <non-multiple of 1000> must stay NULL for NULL ts: NOT(NULL)
    // filters the row, while a naive `false` rewrite would keep it
    val kept = withNull.filter(not(col("ts") === 1001L)).count()
    assert(kept == 0L, "NOT(NULL = literal) must filter the row")
  }
}
