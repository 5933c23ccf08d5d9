package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed join elides exchanges") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")
    val o = graft.Tables.load(spark, dir, "orders")
    val c = graft.Tables.load(spark, dir, "customer")
    Layout.writeBucketed(o.select("o_custkey", "o_orderkey", "o_totalprice"),
      "b_orders", 4, Seq("o_custkey"))
    Layout.writeBucketed(c.select($"c_custkey".as("o_custkey"), $"c_name"),
      "b_cust", 4, Seq("o_custkey"))
    // disable broadcast so the planner actually uses the bucketed layout
    // (at real scale neither side broadcasts)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.bucketedJoin(spark, "b_orders", "b_cust",
        Seq("o_custkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan must use the bucketed layout:\n$plan")
      assert(joined.count() == o.count()) // every order has a customer
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("q_bucket_join plans one exchange total (group-by only, join co-located)") {
    val dir = "/root/testdata/sf0.001"
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = graft.Queries.byName("q_bucket_join")(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // the plan string carries both the AQE initial and final plans, so
      // count by exchange KEY: the group-by key may shuffle (final agg),
      // the join keys must not (that's what the bucketed layout buys)
      assert(!plan.contains("hashpartitioning(o_custkey") &&
        !plan.contains("hashpartitioning(c_custkey"),
        s"bucketed join must not shuffle on the join key:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan must use the bucketed layout:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("salted join returns exactly the plain-join rows") {
    val dir = "/root/testdata/sf0.001"
    val o = graft.Tables.load(spark, dir, "orders")
      .select("o_custkey", "o_orderkey")
    val c = graft.Tables.load(spark, dir, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_nationkey")
    val plain = o.join(c, Seq("o_custkey"))
      .select("o_orderkey", "c_nationkey").collect().toSet
    val salted = Layout.saltedJoin(o, c, Seq("o_custkey"), "o_orderkey", 8)
      .select("o_orderkey", "c_nationkey").collect().toSet
    assert(salted == plain)
  }

  test("banded range join: equals naive band join, plans NO nested loop") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "ts", "event_id").limit(2000)
    val delta = 1000000000L
    val banded = Layout.bandedRangeJoin(e, e, Seq("user_id"), "ts", delta)
      .filter($"l_event_id" < $"r_event_id")
    // the naive non-equi formulation (ground truth, NLJ plan)
    val l = e.select($"user_id".as("lu"), $"ts".as("lt"), $"event_id".as("le"))
    val r = e.select($"user_id".as("ru"), $"ts".as("rt"), $"event_id".as("re"))
    val naive = l.join(r, $"lu" === $"ru" &&
        org.apache.spark.sql.functions.abs($"lt" - $"rt") <= delta &&
        $"le" < $"re")
      .select($"le", $"re").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val got = banded.select($"l_event_id", $"r_event_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == naive, s"${got.size} vs ${naive.size} pairs")
    // the whole point: the banded plan is hash/sort-merge, never a
    // nested loop or cartesian
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("spark SQL passthrough over engine views") {
    val wh = java.nio.file.Files.createTempDirectory("graft-sv-wh").toString
    val e = new graft.engine.Engine(spark, wh)
    e.execute("create database sv")
    e.execute("create table sv.t(sec int, tm timestamp, px double, primary key(sec, tm))")
    e.batchInsert("insert into sv.t values(?, ?, ?)",
      (0 until 100).map(i => Seq[Any](i % 3, i.toLong, i * 1.0)))
    val views = e.registerViews("sv")
    assert(views.contains("sv_t"))
    val agg = e.sparkSql(
      "SELECT sec, count(*) AS n, sum(px) AS s FROM sv_t GROUP BY sec ORDER BY sec")
      .collect()
    assert(agg.length == 3 && agg.map(_.getLong(1)).sum == 100)
  }

  test("z-order clustering skips files on the second dimension; linear sort can't") {
    import org.apache.spark.sql.functions._
    // 64x64 grid with a value DOMAIN far wider than 2^bits (x, y in
    // [17, 63017] step 1000): the writer's monotonic range bucketing —
    // not a modulo fold — is what keeps file min/max stats tight
    val grid = spark.range(64L * 64)
      .select(((col("id") % 64) * 1000 + 17).as("x"),
        ((col("id") / 64) * 1000 + 17).as("y"),
        col("id").as("v"))
    val base = java.nio.file.Files.createTempDirectory("graft-z").toString
    // AQE would coalesce the small range partitions into one file and
    // hide the layout difference (test-scale artifact only)
    val saved = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      Layout.writeZOrdered(grid, Seq("x", "y"), bits = 6, nFiles = 16,
        base + "/z")
      grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
        .write.parquet(base + "/linear")
      def filesHit(path: String): Long = spark.read.parquet(path)
        .filter(col("y") < 8017) // second-dimension box query (y bucket < 8)
        .select(input_file_name()).distinct().count()
      val zTotal = spark.read.parquet(base + "/z")
        .select(input_file_name()).distinct().count()
      assert(zTotal >= 8, s"want a many-file z layout, got $zTotal")
      // z-curve: y<8 is 1/8 of the space -> a few contiguous z ranges
      assert(filesHit(base + "/z") <= zTotal / 2,
        s"z layout must cluster y: hit ${filesHit(base + "/z")} of $zTotal")
      // x-sorted files each contain ALL y values -> no skipping possible
      assert(filesHit(base + "/linear") == 16L)
      // z-order is a permutation: nothing lost
      assert(spark.read.parquet(base + "/z").count() == 64L * 64)
    } finally
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", saved)
  }

  test("bloom prefilter join: prunes the fact scan, equals the plain join") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val fact = graft.Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey")
    // selective dim: only a fraction of custkeys survive
    val dim = graft.Tables.load(spark, dir, "customer")
      .filter($"c_acctbal" > 9000.0).select("c_custkey", "c_name")
    val bits = 1 << 16
    val bm = Layout.bloomBitmap(dim, "c_custkey", bits, 5)
    val bmRow = bm.head().getSeq[Long](0)
    assert(bmRow.length == bits / 64)
    assert(bmRow.exists(_ != 0L), "bitmap must have set bits")
    // the probe actually prunes: far fewer fact rows survive than exist
    val kept = Layout.bloomFilterProbe(fact, "o_custkey", bm, bits, 5)
    val nFact = fact.count()
    val nKept = kept.count()
    assert(nKept < nFact, s"no pruning: $nKept of $nFact")
    // no false negatives: result row-identical to the plain join
    val got = Layout.bloomPrefilterJoin(fact, "o_custkey", dim,
        "c_custkey", bits, 5)
      .select("o_orderkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val want = fact.join(dim, $"o_custkey" === $"c_custkey")
      .select("o_orderkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want, s"${got.size} vs ${want.size} rows")
  }

  test("compaction plan: bins are ordered, contiguous, and sized near target") {
    import org.apache.spark.sql.functions._
    // files of size 10..400; target 500 -> greedy cut when cumsum crosses
    val files = spark.range(40)
      .select(lit("g").as("grp"), $"id".as("f"),
        (($"id" % 8) * 50 + 10).as("sz"))
    val plan = Layout.compactionPlan(files, "grp", "f", "sz", 500L)
      .orderBy("bin").collect()
    val total = files.agg(sum($"sz")).head().getLong(0)
    assert(plan.map(_.getAs[Long]("bytes")).sum == total, "bytes conserved")
    assert(plan.map(_.getAs[Long]("n_files")).sum == 40L, "files conserved")
    // bins cover the order contiguously: bin i's last_file + 1 == bin
    // i+1's first_file
    val ranges = plan.map(r => (r.getAs[Long]("first_file"),
      r.getAs[Long]("last_file")))
    for (Array(a, b) <- ranges.sliding(2))
      assert(a._2 + 1 == b._1, s"gap between $a and $b")
    // every bin but the last crosses target only by its own last file
    for (r <- plan.init)
      assert(r.getAs[Long]("bytes") >= 500L - 400L,
        s"undersized non-final bin: $r")
  }

  test("skew diagnostics: shares sum to 1, hot flag matches definition") {
    import org.apache.spark.sql.functions._
    // 3 keys: 80/15/5 rows -> key a is hot at 2x uniform (cnt*k > tot*2)
    val df = spark.range(100)
      .select(when($"id" < 80, "a").when($"id" < 95, "b")
        .otherwise("c").as("k"))
    val out = Layout.skewDiagnose(df, "k", hotFactor = 2.0)
      .orderBy("k").collect()
    assert(out.map(_.getAs[Double]("share")).sum == 1.0)
    val byKey = out.map(r => r.getAs[String]("k") ->
      (r.getAs[Long]("cnt"), r.getAs[Boolean]("is_hot"))).toMap
    assert(byKey("a") == (80L, true))   // 80*3 > 100*2
    assert(byKey("b") == (15L, false))
    assert(byKey("c") == (5L, false))
  }

  test("intervalJoin: equals naive non-equi join, no nested-loop plan") {
    import org.apache.spark.sql.functions._
    // intervals of mixed lengths incl. one LONGER than maxLen (spans
    // 3+ buckets — replication must still cover it), touching bucket
    // edges; points on boundaries (start inclusive, end exclusive)
    val pts = Seq((1, 1L, 0L), (1, 2L, 50L), (1, 3L, 100L),
      (1, 4L, 250L), (2, 5L, 50L)).toDF("k", "pid", "t")
    val ivs = Seq((1, 10L, 0L, 100L), (1, 11L, 40L, 360L),
      (2, 12L, 50L, 51L)).toDF("k", "iid", "s", "e")
    val out = Layout.intervalJoin(pts, ivs, Seq("k"), "t", "s", "e",
      maxLen = 100L)
    val got = out.select("p_pid", "i_iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pts.as("p").join(ivs.as("i"),
        col("p.k") === col("i.k") && col("i.s") <= col("p.t") &&
          col("p.t") < col("i.e"))
      .select(col("p.pid"), col("i.iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"got $got want $want")
    // boundary semantics: t=0 in [0,100) yes; t=100 not in [0,100);
    // t=50 in the 1-tick interval [50,51); long interval catches t=250
    assert(got.contains((1L, 10L)) && !got.contains((3L, 10L)))
    assert(got.contains((5L, 12L)) && got.contains((4L, 11L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
  }

  test("zValue interleaves bits exactly") {
    import org.apache.spark.sql.functions._
    // x=0b101 (5), y=0b011 (3) at 3 bits -> z bit (i*2+j) = bit i of
    // col j: x (j=0) sets positions 0,4; y (j=1) sets 1,3
    // z = 0b011011 = 27
    val r = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .head().getLong(0)
    assert(r == 27L, s"z=$r")
    // bijection on the full 16x16 grid: every z in [0, 256) hit once
    val zs = spark.range(256)
      .select((col("id") % 16).as("x"), (col("id") / 16).as("y"))
      .select(Layout.zValue(Seq(col("x"), col("y")), 4).as("z"))
      .collect().map(_.getLong(0)).sorted
    assert(zs.toSeq == (0L until 256L))
  }
}
