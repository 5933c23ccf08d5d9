package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native aggregate: integer GRAM MOMENTS of a vector column — count,
  * per-dimension element sums, and the upper-triangle outer-product
  * sums, all on a fixed quantization grid (element → ⌊x·grid⌋ as
  * int64) so partials are order-free integers and any engine replays
  * the result bit-for-bit.
  *
  * This is the covariance/PCA/whitening input statistic in the shape
  * that holds at 100 TB: each partition accumulates ONE primitive
  * long[2 + d + d(d+1)/2] buffer (≈17 KB at d=64) in a tight loop —
  * no per-term row materialization, no lambda dispatch — and partials
  * merge by elementwise add. Compare the expression-form alternative
  * (nested `transform`/`flatten`/`explode`): Spark's higher-order
  * functions evaluate interpreted per element, so the same sf0.1
  * computation measured ~4.5× slower end-to-end at sf0.1 (3.36 s vs
  * 0.74 s) while materializing rows×d²/2 intermediate rows where
  * this produces one buffer per partition.
  *
  * Emits `array<struct<i,j,n,sxy,si,sj>>` (upper triangle, i ≤ j) —
  * `inline()` it and derive covariance/correlation on whatever grid
  * the caller's exactness contract wants.
  */
case class GramAgg(child: Expression, grid: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sxy", LongType, nullable = false),
    StructField("si", LongType, nullable = false),
    StructField("sj", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"gram_agg needs array<float|double>, got $other")
  }

  // lazy: child.dataType is unresolvable while the plan is still
  // being analyzed (copy() runs during transformUp)
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // buffer layout: [dim, n, s_0..s_{d-1}, tri_0..tri_{d(d+1)/2-1}]
  // where tri holds (i,j) i<=j in row-major triangle order. Allocated
  // lazily on the first non-null vector (dim comes from the data).
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val a = v.asInstanceOf[ArrayData]
    val d = a.numElements()
    val b =
      if (buf.isEmpty) {
        val nb = new Array[Long](2 + d + d * (d + 1) / 2)
        nb(0) = d.toLong
        nb
      } else {
        require(buf(0) == d.toLong,
          s"gram_agg: vector length $d != ${buf(0)} seen earlier")
        buf
      }
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      val x: Double = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      q(i) = math.floor(x * grid).toLong
      i += 1
    }
    b(1) += 1L
    i = 0
    var t = 2 + d
    while (i < d) {
      b(2 + i) += q(i)
      val qi = q(i)
      var j = i
      while (j < d) {
        b(t) += qi * q(j)
        t += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2.isEmpty) return b1
    if (b1.isEmpty) return b2
    require(b1(0) == b2(0),
      s"gram_agg: merging buffers of dims ${b1(0)} vs ${b2(0)}")
    var i = 1
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(b: Array[Long]): Any = {
    if (b.isEmpty) return new GenericArrayData(Array.empty[Any])
    val d = b(0).toInt
    val n = b(1)
    val rows = new Array[Any](d * (d + 1) / 2)
    var i = 0
    var t = 2 + d
    var r = 0
    while (i < d) {
      var j = i
      while (j < d) {
        rows(r) = new GenericInternalRow(
          Array[Any](i, j, n, b(t), b(2 + i), b(2 + j)))
        r += 1; t += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(b.length * 8)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): GramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): GramAgg = copy(child = c.head)
}

object GramAgg {
  /** Column form: `gram_agg(vec, grid)` ready for `df.agg(...)`. */
  def apply(vec: Column, grid: Double): Column =
    GraftSql.column(
      new GramAgg(GraftSql.expression(vec), grid)
        .toAggregateExpression())
}
