package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise sum of ARRAY&lt;DOUBLE&gt; groups as a single
  * `TypedImperativeAggregate` whose buffer is ONE `Array[Double]` — the
  * wide-dimension escape hatch for q_c9's Lloyd training (PERF.md dim
  * probe): the per-dim `sum(xᵢ)` COLUMN formulation is codegen'd and
  * fastest through dim ≈ 768, but the generated aggregate's source grows
  * linearly with dim and past `spark.sql.codegen.maxFields` (pinned 1024)
  * whole-stage codegen silently drops; by dim ≈ 1536 the 1538-column
  * aggregate row is all constant-pool and setter overhead. This buffer
  * aggregate is dimension-independent: one object per group, one fused
  * add loop per row, planned as ObjectHashAggregate (partial merge on the
  * map side, exactly like a codegen'd sum — the shuffle still carries k
  * partial buffers, not data).
  *
  * Null/width semantics: NULL input rows are skipped; the first non-null
  * vector fixes the group's width and a later mismatched width raises
  * (silent truncation would corrupt centroids). Empty groups yield NULL.
  */
case class VectorSum(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_sum requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  // empty sentinel until the first vector fixes the width
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf =
      if (buffer.length == 0) new Array[Double](n)
      else {
        require(buffer.length == n,
          s"vector_sum width mismatch: ${buffer.length} vs $n")
        buffer
      }
    var i = 0
    while (i < n) { buf(i) += arr.getDouble(i); i += 1 }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b1.length == 0) return b2
    if (b2.length == 0) return b1
    require(b1.length == b2.length,
      s"vector_sum width mismatch: ${b1.length} vs ${b2.length}")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(storage)
    val out = new Array[Double](storage.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
  override def prettyName: String = "vector_sum"
}

object VectorSum {
  private val info = new ExpressionInfo(classOf[VectorSum].getName, "vector_sum")

  private[graft] val injection
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_sum"),
    info,
    (children: Seq[Expression]) => {
      require(children.length == 1, "vector_sum takes 1 argument")
      VectorSum(children.head)
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      injection._1, injection._2, injection._3)
}
