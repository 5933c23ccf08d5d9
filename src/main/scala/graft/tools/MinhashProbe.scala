// Optimization-round scratch probe: attribute minhashLSH stage costs
// (guide §1). Runs each stage cumulatively through the noop sink.
//   sbt "runMain graft.tools.MinhashProbe [sfDir]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object MinhashProbe {
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
      println(f"STAGE $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    val aug = docs.union(docs.select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" zz")).as("text")))
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val sh = graft.operators.Dedup.shingles(aug, "doc_id", "text", 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("shingles")(noop(sh))
      // replicate bandedBuckets (private): same expressions
      val numHashes = 64; val bands = 16; val r = numHashes / bands
      val exploded = sh.withColumn("__h", xxhash64(col("shingle")))
      val minCols = (0 until numHashes).map(i =>
        min(xxhash64(col("__h"), lit(i))).as(s"__h$i"))
      val sigs = exploded.groupBy("id").agg(minCols.head, minCols.tail: _*)
        .withColumn("sig",
          array((0 until numHashes).map(i => col(s"__h$i")): _*))
      val banded0 = sigs.select(col("id"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(concat_ws(",", slice(col("sig"), b * r + 1, r)
            .cast("array<string>")))): _*)).as(Seq("band", "bucket")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("bandedBuckets")(noop(banded0))
      val bucketSizes = banded0.groupBy("band", "bucket")
        .agg(count(lit(1)).as("__bsz"))
      val banded = banded0.join(
        bucketSizes.filter(col("__bsz") <= 10000L)
          .select("band", "bucket"), Seq("band", "bucket"))
      val candIds = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      time("candIds")(noop(candIds))
      val full = graft.operators.Dedup.minhashLSH(aug, "doc_id", "text",
        threshold = 0.5)
      time("full minhashLSH")(noop(full))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
