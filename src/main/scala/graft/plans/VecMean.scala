package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise mean of an array<double> column per group — the
  * "centroid" aggregate vector pipelines need constantly and vanilla
  * Spark lacks (the workaround is posexplode → (group, dim) agg →
  * re-assembly, i.e. three operators and a dim-fold shuffle blow-up).
  *
  * TypedImperativeAggregate with a primitive double[] buffer
  * (slot 0 = count): updates are a tight fused loop, partials merge
  * element-wise, and the shuffle carries one compact binary buffer per
  * group instead of dim exploded rows. Rows whose array length differs
  * from the first-seen length are ignored (counted out) rather than
  * corrupting the buffer.
  */
case class VecMean(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_mean"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_mean expects array<double>, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Double] = Array.empty[Double]

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf =
      if (buffer.isEmpty) new Array[Double](n + 1)
      else buffer
    if (buf.length != n + 1) return buf // dimension mismatch: skip row
    var i = 0
    while (i < n) { buf(i + 1) += arr.getDouble(i); i += 1 }
    buf(0) += 1.0
    buf
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.isEmpty) return buffer
    if (buffer.isEmpty) return other
    // partials that first-saw different dimensions for the same group
    // (mixed-dimension input split across partitions) cannot be added
    // element-wise: keep the count-dominant partial, mirroring
    // update()'s skip-mismatched-row rule
    if (buffer.length != other.length)
      return if (buffer(0) >= other(0)) buffer else other
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any = {
    if (buffer.isEmpty || buffer(0) == 0.0) return null
    val n = buffer.length - 1
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = buffer(i + 1) / buffer(0); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecMean =
    copy(child = newChildren.head)
}
