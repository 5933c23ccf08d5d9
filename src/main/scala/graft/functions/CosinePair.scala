package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity between TWO embedding
  * columns (`array<float|double>` each) — the pairwise sibling of
  * [[CosineToQuery]], for join-produced vector pairs (k-NN graphs,
  * near-dup verification) where neither side is a literal.
  *
  * Bit-equivalent to the expression form
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +) /
  *  nullif(sqrt(aggregate(a, 0D, +x²)) * sqrt(aggregate(b, 0D, +y²)), 0)`
  * — same index-0..n-1 double accumulation per term, same
  * sqrt·sqrt·divide order, null on a zero norm — but `doGenCode` emits
  * ONE primitive loop: no per-row lambda closures, no intermediate
  * ArrayData, and the pair join's verify stage stays inside
  * whole-stage codegen. Length-mismatched or element-null inputs
  * return null (the fold form also nulls there via null propagation).
  */
case class CosinePair(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes() =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"cosine_pair needs two array<float|double>, got $other")
    }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val fA = isFloat(left)
    val fB = isFloat(right)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x: Double = if (fA) a.getFloat(i).toDouble else a.getDouble(i)
      val y: Double = if (fB) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) null else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val gA = if (isFloat(left)) "getFloat" else "getDouble"
    val gB = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val den = ctx.freshName("den")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $x = (double) $a.$gA($i);
            double $y = (double) $b.$gB($i);
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          double $den =
            java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
          if ($den == 0.0) { ${ev.isNull} = true; }
          else { ${ev.value} = $dot / $den; }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CosinePair = copy(left = l, right = r)
}

object CosinePair {
  /** Column API: exact pairwise cosine of two vector columns. */
  def apply(a: Column, b: Column): Column =
    GraftSql.column(CosinePair(GraftSql.expression(a),
      GraftSql.expression(b)))
}
