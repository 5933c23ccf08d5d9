package org.apache.spark.sql.graftshim

import org.apache.hadoop.conf.Configuration
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** The minimal `private[sql]` surface graft's ordered scan needs,
  * exposed from an `org.apache.spark.sql` subpackage — the standard
  * technique Spark connector libraries use to reach the file-source
  * internals the planner itself builds scans from. Kept to two members
  * on purpose; everything else in graft goes through public APIs.
  */
object GraftSqlShims {
  /** DataFrame over an RDD of InternalRow (no Row round-trip; the plan
    * is a single LogicalRDD node regardless of how many files feed the
    * RDD).
    */
  def internalDf(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** The parquet readFunction FileSourceScanExec itself uses — pushed
    * `filters` prune row groups via parquet min/max stats executor-side.
    */
  def parquetReader(spark: SparkSession, dataSchema: StructType,
      requiredSchema: StructType, filters: Seq[Filter],
      options: Map[String, String], hadoopConf: Configuration)
      : PartitionedFile => Iterator[InternalRow] =
    new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, dataSchema, new StructType(), requiredSchema, filters,
      options, hadoopConf)

  def hadoopConf(spark: SparkSession): Configuration =
    spark.sessionState.newHadoopConfWithOptions(Map.empty)

  /** Whether the parquet reader can return ColumnarBatch for this
    * schema (all-atomic columns + vectorized reader enabled) — the
    * same gate FileSourceScanExec consults before requesting batches.
    */
  def parquetSupportsBatch(spark: SparkSession,
      schema: StructType): Boolean =
    new ParquetFileFormat().supportBatch(spark, schema)
}
