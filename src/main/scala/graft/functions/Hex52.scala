package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static digest helper the codegen path calls by name — one MD5 over
  * the UTF-8 bytes, first 52 bits big-endian (= the first 13 hex
  * nibbles of `md5(s)`), so the value is BIT-IDENTICAL to the portable
  * SQL form [[graft.operators.Sketch.hex52Sql]] any engine can
  * replicate. 52 bits keeps the hash exact in a double, which the KMV
  * estimate's one multiply+divide relies on.
  */
object Hex52Impl {
  def hash52(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4 // 14 nibbles read, the spec'd value is the first 13
  }
}

/** Native Catalyst expression: the 52-bit md5-prefix hash, equal
  * bit-for-bit to the 13-term substring/instr SQL expression the
  * sketch oracles use, but one digest + shift per row instead of 13
  * substring scans over a hex string — and it stays inside
  * whole-stage codegen. The portable SQL form remains the
  * cross-engine contract; this is the same function compiled.
  */
case class Hex52(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hex52 needs a string column, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    Hex52Impl.hash52(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Hex52Impl.hash52(($s).getBytes());")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object Hex52 {
  /** Column-API entry point: `hex52(col.cast("string"))`. */
  def apply(c: Column): Column = GraftSql.column(Hex52(GraftSql.expression(c)))
}
