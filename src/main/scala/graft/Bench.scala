package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line (driver contract).
  * Full plans are executed via the `noop` sink (no driver collect).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators that self-join persist intermediates; drop them so one
      // query's cache doesn't pressure the next query's memory
      spark.catalog.clearCache()
      dt
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    // Warm-up: pay JVM/Janino startup before timing. One query is not
    // enough — round-1 showed a ~7 s one-off codegen-compilation hit
    // landing on whichever query first exercised a codegen family
    // (q_rollup at 8.78 s vs 1.2-1.6 s steady-state, BENCH_r01 vs the
    // r2 rerun). Warm one representative per family: decimal hash agg,
    // grouping-sets Expand, window, sort-merge join, native as-of,
    // broadcast hash join and json-path codegen (the two r3
    // counter-trend queries — both plans are textbook, so the 2x was
    // almost certainly first-exercise JIT landing on them after the
    // registry grew; warming the family removes that from the timing).
    Seq(names.head, "q1_agg", "q_rollup", "q_window_rank", "q_self_join",
      "q_asof_native", "q_stats_moments", "q_join_broadcast",
      "q_json_extract").distinct.foreach(run)
    // Best-of-2 per query: machine-load noise poisoned BENCH_r02 (trivial
    // queries inflated 3-5x under a concurrent build). The best of two
    // runs is robust to one-sided load spikes; the canary below makes a
    // still-poisoned run self-evident to the reader.
    val nRuns = 2
    val results = names.map { n =>
      n -> (0 until nRuns).map(_ => run(n)).filter(_ >= 0)
        .minOption.getOrElse(-1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val (ingestS, scanS) = {
      val runs = (0 until nRuns).map(_ => baselineLoops(spark))
      (runs.map(_._1).min, runs.map(_._2).min)
    }
    // canary: a point get is ~0.2 s idle at any SF; a multiple of that
    // budget means the machine was loaded and the numbers are suspect
    val canaryBudget = 0.6
    // a failed run (-1 sentinel) must read as SUSPECT, not healthy
    val canary = (0 until nRuns).map(_ => run("q_point_get"))
      .filter(_ >= 0).minOption.getOrElse(-1.0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$nRuns,""" +
      s""""queries":$qs,""" +
      s""""canary_point_get_s":$canary,"canary_budget_s":$canaryBudget,""" +
      s""""load_suspect":${canary < 0 || canary > canaryBudget},""" +
      s""""ingest_100k_ohlcv_s":$ingestS,"scan_100k_ohlcv_s":$scanS,""" +
      s""""ingest_rows_per_s":${(100000 / ingestS).toLong},""" +
      s""""scan_rows_per_s":${(100000 / scanS).toLong},"sf":"$sfDir"}""")
    spark.stop()
  }

  /** The reference's own benchmark shape (BASELINE.md; reference
    * bindings/go/test.go:23-124): 100k OHLCV bars into
    * test(sec,interval,tm, o,h,l,c,v,vwap) via 10 batch inserts of 10k,
    * then one ranged retrieve of all 100k rows. Targets: ~1.14 s ingest,
    * ~1.42 s single-stream retrieve.
    */
  private def baselineLoops(spark: SparkSession): (Double, Double) = {
    val e = new graft.engine.Engine(spark,
      java.nio.file.Files.createTempDirectory("graft-bench-wh").toString)
    e.execute("create database bench")
    e.execute("create table bench.t(sec int, interval int, tm timestamp, " +
      "open double, high double, low double, close double, vol double, " +
      "vwap double, primary key(sec, interval, tm))")
    val t0 = System.nanoTime()
    for (b <- 0 until 10) {
      val rows = (0 until 10000).map { i =>
        val k = b * 10000 + i
        Seq[Any](1, k % 100, k.toLong, 2.2, 2.4, 2.1, 2.3, 1000000.0, 2.25)
      }
      e.batchInsert("insert into bench.t values(?, ?, ?, ?, ?, ?, ?, ?, ?)", rows)
    }
    val t1 = System.nanoTime()
    val n = e.execute("select * from bench.t where sec=1").collect().length
    val t2 = System.nanoTime()
    require(n == 100000, s"expected 100k rows, got $n")
    ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
  }
}
