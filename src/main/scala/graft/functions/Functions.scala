package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SQL-surface registration for graft's native expressions, so engine
  * users can call them from `spark.sql` text as well as the Column API.
  */
object Functions {
  /** Register all graft SQL functions on a session. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_to_query", buildCosine, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hex52", { exprs: Seq[Expression] =>
        require(exprs.length == 1, "hex52(str) takes 1 argument")
        Hex52(exprs.head)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_pair", { exprs: Seq[Expression] =>
        require(exprs.length == 2, "cosine_pair(a, b) takes 2 arguments")
        CosinePair(exprs(0), exprs(1))
      }, "built-in")
  }

  private def buildCosine(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      "cosine_to_query(vec, query_array_literal) takes 2 arguments")
    // accept any foldable numeric array (SQL `array(0.25, ...)` arrives
    // as CreateArray of decimal literals before constant folding)
    val q = exprs(1) match {
      case e if e.foldable => (e.eval(), e.dataType) match {
        case (arr: ArrayData, ArrayType(et, _)) =>
          val n = arr.numElements()
          Array.tabulate(n) { i =>
            et match {
              case DoubleType => arr.getDouble(i)
              case FloatType => arr.getFloat(i).toDouble
              case d: DecimalType =>
                arr.getDecimal(i, d.precision, d.scale).toDouble
              case IntegerType => arr.getInt(i).toDouble
              case LongType => arr.getLong(i).toDouble
              case ShortType => arr.getShort(i).toDouble
              case ByteType => arr.getByte(i).toDouble
              case other => throw new IllegalArgumentException(
                s"cosine_to_query: non-numeric query element type $other")
            }
          }
        case (v, t) => throw new IllegalArgumentException(
          s"cosine_to_query: need a numeric array literal, got $t = $v")
      }
      case other => throw new IllegalArgumentException(
        s"cosine_to_query: second argument must be a constant array, got $other")
    }
    CosineToQuery(exprs.head, q)
  }
}
