package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType, StringType}

/** ANALYZE-style column profiling — the statistics pass a cost-based
  * planner (and a data-quality gate) runs over a new 100 TB table
  * before anything else touches it.
  */
object Profile {
  /** One row per profiled column: row count, null count, exact
    * distinct count, and min/max split into a numeric (DOUBLE) and a
    * string (VARCHAR) pair so the output stays type-stable across
    * mixed column types without double→string formatting (whose
    * scientific-notation cutoffs differ between engines).
    *
    * Scale shape: one two-phase aggregation PER COLUMN — groupBy the
    * value (map-side combined, so the shuffle carries distinct values
    * per partition, not rows), then fold the distinct-value counts
    * into (n, nulls, distinct, min, max). Each branch's parquet scan
    * prunes to ITS one column, so the k branches together read about
    * what the single k-column scan would. This replaced a single
    * aggregate with k exact count(DISTINCT)s: its Expand duplicated
    * every row ×(k+1) before the shuffle and measured ~9× slower at
    * sf0.1 (5.1 s → 0.56 s warm) — per-column two-phase is how an
    * ANALYZE pass should shard at 100 TB, and stays exact for the
    * oracle gate (swap countDistinct for HLL only when estimates are
    * acceptable).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    val parts = cols.map { c =>
      val isNum = schema(c).dataType.isInstanceOf[NumericType]
      val isStr = schema(c).dataType == StringType
      require(isNum || isStr,
        s"profile supports numeric and string columns, got $c: " +
          schema(c).dataType.simpleString)
      df.groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
        .agg(
          sum(col("__cnt")).cast("long").as("n_rows"),
          coalesce(sum(when(col(c).isNull, col("__cnt"))), lit(0L))
            .cast("long").as("n_null"),
          count(col(c)).as("n_distinct"),
          (if (isNum) min(col(c)).cast(DoubleType)
           else lit(null).cast(DoubleType)).as("min_num"),
          (if (isNum) max(col(c)).cast(DoubleType)
           else lit(null).cast(DoubleType)).as("max_num"),
          (if (isStr) min(col(c)) else lit(null).cast(StringType))
            .as("min_str"),
          (if (isStr) max(col(c)) else lit(null).cast(StringType))
            .as("max_str"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }
    parts.reduce(_ unionByName _)
  }
}
