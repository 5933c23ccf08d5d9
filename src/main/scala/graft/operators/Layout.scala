package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB path: bucketed co-located
  * joins (no shuffle at read time) and salted joins for skewed keys.
  */
object Layout {
  /** Write `df` as a bucketed+sorted managed table: repeated joins or
    * aggregations on `keys` then run shuffle-free (both sides already
    * hash-partitioned by bucket id). This is the batch analog of
    * pre-partitioning a 100 TB fact table once to serve many queries.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys — planner elides both
    * exchanges when bucket specs line up.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)

  /** Skew-safe equi-join: left rows get a deterministic salt derived
    * from `saltSource` (any well-distributed left column), the right
    * side is replicated `n`× — a hot key spreads over n reducers
    * instead of one straggler. Equivalent rows to a plain inner join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltSource: String, n: Int): DataFrame = {
    val salted = left.withColumn("__salt", pmod(xxhash64(col(saltSource)), lit(n)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until n).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
