// Optimization-round scratch probe: time each stage of the
// q_corpus_build pipeline (guide §1 — attribute before changing).
//   sbt "runMain graft.tools.PipelineProbe [sfDir]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.configure(spark)
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    val aug = docs.union(docs.select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" zz")).as("text")))
    val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      .select((col("doc_id") + 500000L).as("bench_id"),
        concat_ws(" ", slice(graft.operators.Dedup.tokens(col("text")), 6, 20))
          .as("text"))
    for (round <- 1 to 2) {
      println(s"--- round $round")
      // stage 1: curate + re-join (kept)
      val curated = graft.operators.Curate.curate(aug, "doc_id", "text",
        Seq("en"), 0.91)
      val kept = aug.join(curated.select(col("doc_id")), Seq("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("curate+kept")(noop(kept))
      // stage 2: minhash near-dup pairs over kept
      val nearDups = graft.operators.Dedup.minhashLSH(kept, "doc_id",
        "text", threshold = 0.5)
      time("minhashLSH pairs")(noop(nearDups))
      val dropIds = nearDups.select(col("id_b").as("doc_id")).distinct()
      val afterDedup = kept.join(dropIds, Seq("doc_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("anti-join afterDedup")(noop(afterDedup))
      // stage 3: decontaminate
      val cont = graft.operators.Curate.decontaminate(afterDedup,
        "doc_id", "text", bench, "bench_id", "text", n = 5)
      time("decontaminate")(noop(cont))
      val clean = afterDedup.join(
        cont.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      // stage 4: pack
      val packs = graft.operators.Sampling.packSequences(clean, "doc_id",
        "text", 512, 8)
      time("packSequences")(noop(packs))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
