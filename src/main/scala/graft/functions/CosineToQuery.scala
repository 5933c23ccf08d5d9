package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity between an embedding
  * column (`array<float>` / `array<double>`) and a fixed query vector.
  *
  * Equivalent to `aggregate(zip_with(v, q, (a,b) -> a*b), 0D, +) /
  * (norm(v) * norm(q))` but with `doGenCode` emitting a single primitive
  * loop — no per-row lambda closures, no intermediate arrays — so the
  * brute-force scan stays inside whole-stage codegen at full width. The
  * accumulation order (index 0..n-1, double) matches the expression
  * formulation bit-for-bit.
  */
case class CosineToQuery(child: Expression, query: Array[Double])
    extends UnaryExpression {
  private val qNorm: Double = math.sqrt(query.map(x => x * x).sum)

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_to_query needs array<float|double>, got $other")
  }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), query.length)
    var dot = 0.0
    var norm = 0.0
    var i = 0
    val isF = elemIsFloat
    while (i < n) {
      val x: Double = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
      dot += x * query(i)
      norm += x * x
      i += 1
    }
    dot / (math.sqrt(norm) * qNorm)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("qvec", query, "double[]")
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val norm = ctx.freshName("norm")
      val x = ctx.freshName("x")
      s"""
        int $n = java.lang.Math.min($arr.numElements(), $qRef.length);
        double $dot = 0.0;
        double $norm = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) $arr.$getter($i);
          $dot += $x * $qRef[$i];
          $norm += $x * $x;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($norm) * ${qNorm}D);
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): CosineToQuery =
    copy(child = c)
}

object CosineToQuery {
  /** Column API: cosine similarity of `vec` to the literal query vector. */
  def apply(vec: Column, q: Seq[Double]): Column =
    GraftSql.column(CosineToQuery(GraftSql.expression(vec), q.toArray))
}
