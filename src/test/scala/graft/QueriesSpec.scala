package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-test-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Tables.configure(s)
  }
}

class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique (byName silently last-wins on duplicates)") {
    // a duplicated QueryDef name shadows the earlier definition in
    // byName/oracles with no error — caught once in round 10
    // (q_cluster_reps); this pins the invariant
    val names = Queries.allDefs.map(_.name)
    val dups = names.groupBy(identity).collect {
      case (n, g) if g.size > 1 => n
    }
    assert(dups.isEmpty, s"duplicate registry names: $dups")
  }

  test("every registered query runs non-empty on sf0.001") {
    val empties = Queries.allDefs.filter { d =>
      d.fn(spark, sf).limit(1).count() == 0
    }.map(_.name)
    assert(empties.isEmpty, s"empty results: $empties")
  }

  test("every oracle aliases match the Spark result columns") {
    // The driver's compare sorts columns by name; a silent alias drift
    // between queries() and oracleSql would hash-mismatch. Guard the
    // Spark side: no default agg names like sum(x) may leak through.
    for (d <- Queries.allDefs) {
      val cols = d.fn(spark, sf).columns
      val bad = cols.filter(c => c.contains("(") || c.contains(" "))
      assert(bad.isEmpty, s"${d.name}: unaliased columns ${bad.toSeq}")
    }
  }

  test("no registered query emits a raw DECIMAL column") {
    // The registry exactness rule (Queries.scala top doc): decimal
    // aggregates must CAST AS DOUBLE before leaving the query — Spark's
    // decimal(28,2) vs DuckDB's DECIMAL(38,2) hash-differ on identical
    // values (q_wow_growth, round 5's one red row). Schema-only check,
    // nothing executes.
    import org.apache.spark.sql.types.DecimalType
    for (d <- Queries.allDefs) {
      val bad = d.fn(spark, sf).schema.fields
        .filter(_.dataType.isInstanceOf[DecimalType]).map(_.name)
      assert(bad.isEmpty, s"${d.name}: raw DECIMAL columns ${bad.toSeq}")
    }
  }

  test("no registered query plans a global (empty-partition) window") {
    // an empty partitionSpec moves ALL rows to one task — the straggler
    // that killed q_ntile's first form. Guard the whole registry so the
    // next windowed query can't reintroduce one. Exemption: a window
    // whose input sits under a literal GlobalLimit ≤ 10k sees a
    // scale-constant row count (q_zipf_fit ranks the top-100 unigrams
    // of a TakeOrdered), so the single task is bounded by construction
    // — the same blessed shape as a bounded driver-side collect.
    import org.apache.spark.sql.catalyst.plans.logical.{
      Window => LWindow, GlobalLimit}
    import org.apache.spark.sql.catalyst.expressions.Literal
    for (d <- Queries.allDefs) {
      val plan = d.fn(spark, sf).queryExecution.optimizedPlan
      val bad = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty &&
            w.child.collectFirst {
              case GlobalLimit(Literal(n: Int, _), _) if n <= 10000 => ()
            }.isEmpty => w
      }
      assert(bad.isEmpty, s"${d.name}: global single-partition window " +
        "over an unbounded input")
    }
  }

  test("no registered query plans an unbounded nested-loop or cartesian join") {
    // a BroadcastNestedLoopJoin / CartesianProduct over row counts that
    // scale with the data is the plan that works at sf0.01 and melts at
    // 100 TB. Condition-free/cross joins pass ONLY when one side is a
    // grouped aggregate with no grouping columns (exactly one row at
    // any scale — funnel stage counts, containment-gate superset
    // counts). The single exemption is the deliberate fixed-dimension
    // cross-join demo (region x nation = 125 rows).
    val allowed = Set("q_cross_join")
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.Cross
    for (d <- Queries.allDefs if !allowed(d.name)) {
      val plan = d.fn(spark, sf).queryExecution.optimizedPlan
      val bad = plan.collect {
        case j: Join if j.condition.isEmpty || j.joinType == Cross =>
          // condition-free / cross joins are fine ONLY under a
          // row-bounded side: a grouped aggregate with no grouping
          // columns yields exactly one row at any scale
          val bounded = Seq(j.left, j.right).exists {
            _.collectFirst {
              case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
                  if a.groupingExpressions.isEmpty => a
            }.isDefined
          }
          if (bounded) None else Some(j)
      }.flatten
      assert(bad.isEmpty,
        s"${d.name}: unbounded cartesian/condition-free join")
    }
  }

  test("q1_agg values match the known sf0.001 aggregate") {
    val r = Queries.byName("q1_agg")(spark, sf).collect()
    assert(r.length > 0 && r.length <= 8) // few flag/status combos
    val total = r.map(_.getAs[Long]("count_order")).sum
    assert(total == 6000L, s"expected 6000 lineitem rows, got $total")
  }

  test("q_reverse_limit is descending by PK") {
    val rows = Queries.byName("q_reverse_limit")(spark, sf).collect()
    val keys = rows.map(r => (r.getAs[Long]("l_orderkey"),
      r.getAs[Int]("l_linenumber")))
    assert(keys.sameElements(keys.sortBy(k => (-k._1, -k._2))))
  }

  test("approx sketches land within 10% of exact") {
    val df = Queries.byName("q_approx_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, sf, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, ex) <- exact) {
      val ap = df(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.1,
        s"$k: approx $ap vs exact $ex")
    }
  }
}
