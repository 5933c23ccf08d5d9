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
    * Scale shape: ONE scan. All k columns' counts, distincts, and
    * extrema compute in a single aggregation; the multiple exact
    * count(DISTINCT) aggregates make Catalyst plan an Expand (data
    * duplicated ×(k+1) pre-shuffle) — the price of exactness, paid in
    * map-side-combined partial rows, not in extra scans. At 100 TB
    * you'd swap `countDistinct` for `approx_count_distinct` (HLL, one
    * Expand-free pass) — kept exact here because the oracle gate
    * hash-compares cells. The final per-column unpivot is over one
    * 5k-wide row — driver-trivial.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    val aggs = cols.flatMap { c =>
      val isNum = schema(c).dataType.isInstanceOf[NumericType]
      val isStr = schema(c).dataType == StringType
      require(isNum || isStr,
        s"profile supports numeric and string columns, got $c: " +
          schema(c).dataType.simpleString)
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        (if (isNum) min(col(c)).cast(DoubleType)
         else lit(null).cast(DoubleType)).as(s"__minn_$c"),
        (if (isNum) max(col(c)).cast(DoubleType)
         else lit(null).cast(DoubleType)).as(s"__maxn_$c"),
        (if (isStr) min(col(c)) else lit(null).cast(StringType))
          .as(s"__mins_$c"),
        (if (isStr) max(col(c)) else lit(null).cast(StringType))
          .as(s"__maxs_$c"))
    }
    // explicit pruning: the Expand that multiple count(DISTINCT)s plan
    // duplicates its input ×(k+1) — carrying only the profiled columns
    // into it matters more than usual column pruning
    val wide = df.select(cols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_rows"),
        (col(s"__n_$c") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__minn_$c").as("min_num"), col(s"__maxn_$c").as("max_num"),
        col(s"__mins_$c").as("min_str"), col(s"__maxs_$c").as("max_str"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }
}
