package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise EXACT sum of an array<long> column per group — the
  * integer sibling of [[VecMean]] and the per-dimension reduction
  * primitive for distributed linear algebra (covariance/PCA steps,
  * gradient-style accumulations): quantize per-row contributions to
  * longs map-side, then sum them order-independently here. Exact
  * integer addition is commutative/associative, so the result is
  * bit-identical across partitionings and engines — what the repo's
  * floor-quantize-then-sum determinism convention needs in vector
  * form, without posexplode → (group, dim) shuffle blow-up: the
  * shuffle carries one compact long[] buffer per group.
  *
  * Rows whose length differs from the first-seen length are skipped,
  * and mismatched partials keep the count-dominant side — the
  * [[VecMean]] rules.
  */
case class VecSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_vec_sum_long"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_sum_long expects array<bigint>, got ${t.sql}")
  }

  // slot 0 = row count, slots 1..n = element sums
  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf =
      if (buffer.isEmpty) new Array[Long](n + 1)
      else buffer
    if (buf.length != n + 1) return buf // dimension mismatch: skip row
    var i = 0
    while (i < n) { buf(i + 1) += arr.getLong(i); i += 1 }
    buf(0) += 1L
    buf
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buffer
    if (buffer.isEmpty) return other
    if (buffer.length != other.length)
      return if (buffer(0) >= other(0)) buffer else other
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    if (buffer.isEmpty || buffer(0) == 0L) return null
    val n = buffer.length - 1
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = buffer(i + 1); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumLong =
    copy(child = newChildren.head)
}
