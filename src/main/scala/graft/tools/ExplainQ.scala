// Plan-audit scratch runner: prints the formatted physical plan of the
// named registry queries at sf0.001.
//   sbt "runMain graft.tools.ExplainQ q_tpch_q6,q_tpch_q19"
package graft.tools

import org.apache.spark.sql.SparkSession

object ExplainQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.configure(spark)
    for (n <- names) {
      println(s"\n===== $n =====")
      graft.Queries.byName(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
