// Optimization-round measurement tool (guide §1): run named registry
// queries through the noop sink and dump EVERY executed action's
// formatted physical plan plus its wall time — iterative operators
// (pagerank, bpe, kcore…) execute many sub-actions (round checkpoints,
// argmax collects) whose plans never appear in a final explain(), and
// this is where their time actually goes.
//   sbt "runMain graft.tools.ExplainExec q_pagerank,q_hits [sfDir [outDir]]"
// Writes <outDir>/<query>_exec.txt; env SPARK_GRAFT_CPUS (default 32).
package graft.tools

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.SparkSession

object ExplainExec {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) args(2) else "/tmp/plans_exec"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.configure(spark)
    new java.io.File(outDir).mkdirs()
    for (n <- names) {
      val sb = new StringBuilder
      val listener = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = sb.synchronized {
          sb.append(f"%n== action: $funcName  wall=${durationNs / 1e9}%.3f s ==%n")
          sb.append(qe.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        }
        override def onFailure(funcName: String, qe: QueryExecution,
            e: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      val t0 = System.nanoTime()
      graft.Queries.byName(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(2000) // QueryExecutionListener delivery is async
      spark.listenerManager.unregister(listener)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_exec.txt"),
        f"query: $n  total_wall=$wall%.3f s  sf=$dir  cpus=$cpus%n" + sb)
      println(f"WROTE $outDir/${n}_exec.txt  total=$wall%.3f s")
    }
    spark.stop()
  }
}
