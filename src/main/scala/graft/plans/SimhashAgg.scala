package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Fused 64-bit SimHash vote aggregate (`graft_simhash64`): per group,
  * bit j of the result is the sign of Σ over input hashes of
  * (((h >> j) & 1)·2 − 1) — Charikar's sketch computed in ONE
  * imperative aggregate with a compact long[64] buffer, where the
  * composed form needs 64 separate SUM aggregate expressions (64
  * codegen'd accumulators per row, 64 buffer slots materialized as
  * individual columns, and a 64-term bit-pack projection on top). The
  * semantics are IDENTICAL to that formulation (spec-asserted
  * bit-for-bit on the corpus); the win is per-row work — one 64-step
  * loop over a local array vs 64 independent aggregate updates — and
  * a single compact partial through the shuffle.
  *
  * The repo's ninth native extension; the update loop is imperative
  * (TypedImperativeAggregate) because 64 vote counters don't fit the
  * fixed-width mutable aggregation buffer model efficiently.
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects bigint, got ${t.sql}")
  }

  // slot 0 = row count, slots 1..64 = per-bit vote sums
  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val h = v.asInstanceOf[Long]
    var j = 0
    while (j < 64) {
      buffer(j + 1) += ((h >>> j) & 1L) * 2L - 1L
      j += 1
    }
    buffer(0) += 1L
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 65) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    if (buffer(0) == 0L) return null
    var out = 0L
    var j = 0
    while (j < 64) {
      if (buffer(j + 1) > 0L) out |= (1L << j)
      j += 1
    }
    out
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(65 * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(65)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimhashAgg =
    copy(child = newChildren.head)
}
