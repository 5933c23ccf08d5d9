package graft

import org.apache.spark.sql.SparkSession

/** One-off query timer: run named registry queries through the same
  * noop sink Bench uses (no Verify coalesce/write skew), print
  * per-run wall seconds. Usage:
  *   runMain graft.TimeQuery <sfDir> <name>[,<name>…] [runs]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    val explain = sys.env.contains("TIMEQUERY_EXPLAIN")
    for (name <- names; r <- 1 to runs) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      if (explain && r == runs) println(df.queryExecution.executedPlan)
      spark.catalog.clearCache()
      println(f"[time] $name run$r $dt%.3f s")
    }
    spark.stop()
  }
}
