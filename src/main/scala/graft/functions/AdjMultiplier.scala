package graft.functions

import graft.operators.Adj
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression: the corporate-action adjustment
  * multiplier for one row, looked up by (sec, epoch-µs time) in a
  * broadcast factor map via binary search (reference adj.go:49-68,
  * 183-199 — semantics live in [[Adj.multiplier]]).
  *
  * This replaces the Scala UDF that round 1 used in the compat SELECT
  * projection: a UDF is an opaque black box to Catalyst — it blocks
  * whole-stage codegen and stops filter/projection pushdown through the
  * select. This expression stays inside codegen (`doGenCode` emits a
  * direct static call on the broadcast value), so an adj projection is
  * just another generated-code column.
  */
case class AdjMultiplier(left: Expression, right: Expression,
    factors: Broadcast[Map[Int, Array[Adj.Factor]]],
    which: Int, backward: Boolean) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes() =
    if (left.dataType == IntegerType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"adj_multiplier needs (int sec, long tmMicros), got " +
          s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(sec: Any, tm: Any): Any =
    Adj.multiplierB(factors, sec.asInstanceOf[Int], tm.asInstanceOf[Long],
      which, backward)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("adjFactors", factors,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, (sec, tm) =>
      s"""
        ${ev.value} = graft.operators.Adj.multiplierB(
          (org.apache.spark.broadcast.Broadcast) $bcRef, $sec, $tm,
          $which, $backward);
      """)
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): AdjMultiplier = copy(left = l, right = r)
}

object AdjMultiplier {
  /** Column API: multiplier keyed by (sec INT, tm epoch-µs LONG). */
  def apply(sec: Column, tmMicros: Column,
      factors: Broadcast[Map[Int, Array[Adj.Factor]]],
      which: Int, backward: Boolean): Column =
    GraftSql.column(AdjMultiplier(GraftSql.expression(sec),
      GraftSql.expression(tmMicros), factors, which, backward))
}
