package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_might_contain(key, bloom_bytes)` — membership probe of a long
  * key against a pre-built [[org.apache.spark.util.sketch.BloomFilter]],
  * passed serialized as a foldable binary argument (the same shape as
  * Spark's internal `BloomFilterMightContain`, which is not exposed to
  * the public function registry).
  *
  * This is the explicit runtime-filter primitive behind
  * [[graft.operators.Bloom.prunedSemiJoin]]: at 100 TB the win is that
  * fact rows failing the probe never reach the join shuffle — the probe
  * is map-side, codegen'd, and the filter is deserialized ONCE per
  * executor (codegen reference object), not per row. May return false
  * positives (bounded by the build fpp), never false negatives — so an
  * exact join downstream restores exact semantics.
  */
case class BloomMightContain(child: Expression, bloomBytes: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = bloomBytes

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, bloomBytes.dataType) match {
      case (LongType, BinaryType) if bloomBytes.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_might_contain: bloom_bytes must be a foldable binary " +
            "(the serialized filter is plan-time constant)")
      case (k, b) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_might_contain expects (bigint, binary), got (${k.sql}, ${b.sql})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  /** Deserialized once per (driver plan / executor codegen reference);
    * BloomFilterImpl is Serializable so it ships inside the generated
    * class's reference array. */
  @transient private lazy val bloom: BloomFilter = {
    val bytes = bloomBytes.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, "graft_might_contain: bloom_bytes is null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(key: Any, ignored: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (key, _) => s"${ev.value} = $bf.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(child = newLeft, bloomBytes = newRight)
}
