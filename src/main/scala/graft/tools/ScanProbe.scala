package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone scan-path profiler: builds the bench OHLCV table
  * (reference loop shape) and times each named component of the
  * ranged retrieve — the same decomposition Bench emits as
  * `scan_profile`, runnable in isolation when iterating on the read
  * path. Best-of-3 after one warm run per leg.
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = new graft.engine.Engine(spark,
      java.nio.file.Files.createTempDirectory("graft-probe-wh").toString)
    e.execute("create database bench")
    e.execute("create table bench.t(sec int, interval int, tm timestamp, " +
      "open double, high double, low double, close double, vol double, " +
      "vwap double, primary key(sec, interval, tm))")
    for (b <- 0 until 10) {
      val rows = (0 until 10000).map { i =>
        val k = b * 10000 + i
        Seq[Any](1, k % 100, k.toLong, 2.2, 2.4, 2.1, 2.3, 1000000.0, 2.25)
      }
      e.batchInsert("insert into bench.t values(?, ?, ?, ?, ?, ?, ?, ?, ?)", rows)
    }
    def time(tag: String)(body: => Unit): Unit = {
      // warm once, then best of 3
      body
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-40s ${ts.min}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val td = e.catalog.getSchema("bench", "t")
    val dataDir = e.catalog.dataPath(td)
    val pushed = Seq(org.apache.spark.sql.sources.EqualTo("sec", 1))
    time("dirty engine select noop") {
      noop(e.execute("select * from bench.t where sec=1")) }
    time("dirty engine select collect") {
      e.execute("select * from bench.t where sec=1").collect() }
    time("raw vectorized scan noop") {
      noop(spark.read.parquet(dataDir).filter(col("sec") === 1)) }
    time("raw scan no-ns noop") {
      noop(spark.read.parquet(dataDir).filter(col("sec") === 1)
        .select(td.cols.map(c => col(c.name)): _*)) }
    time("lww fold noop") { noop(e.catalog.readTableKeepNs(td)) }
    e.catalog.compact(td)
    time("compacted engine select noop") {
      noop(e.execute("select * from bench.t where sec=1")) }
    time("compacted engine select collect") {
      e.execute("select * from bench.t where sec=1").collect() }
    time("ordered scan vectorized noop") {
      e.catalog.readTableOrdered(td, false, pushed).foreach(noop) }
    spark.conf.set("spark.graft.orderedScan.vectorized", "false")
    time("ordered scan rowbased noop") {
      e.catalog.readTableOrdered(td, false, pushed).foreach(noop) }
    spark.conf.unset("spark.graft.orderedScan.vectorized")
    spark.stop()
  }
}
