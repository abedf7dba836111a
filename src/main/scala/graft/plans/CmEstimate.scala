package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `graft_cm_estimate(key, sketch_bytes)` — point-frequency query of a
  * string key against a pre-built
  * [[org.apache.spark.util.sketch.CountMinSketch]], passed serialized
  * as a foldable binary argument. Spark ships the count_min_sketch
  * AGGREGATE (mergeable binary sketches — the store-and-merge half)
  * but exposes no SQL-level point-query — this closes the read half,
  * the same registry gap [[BloomMightContain]] closes for Bloom
  * filters.
  *
  * Estimates are one-sided: estimate ≥ true count always (hash
  * collisions only ADD), with P[err > ε·N] < 1−confidence for the
  * build-time (ε, confidence). The sketch deserializes ONCE per
  * executor (codegen reference object), probes are codegen'd
  * O(depth) lookups. The key is hashed exactly as the native
  * aggregate hashes STRING inputs (UTF-8 bytes), so estimates agree
  * with what the aggregate counted.
  */
case class CmEstimate(child: Expression, sketchBytes: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = sketchBytes

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, sketchBytes.dataType) match {
      case (StringType, BinaryType) if sketchBytes.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_cm_estimate: sketch_bytes must be a foldable binary " +
            "(the serialized sketch is plan-time constant)")
      case (k, b) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_cm_estimate expects (string, binary), got (${k.sql}, ${b.sql})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cm_estimate"

  @transient private lazy val sketch: CountMinSketch = {
    val bytes = sketchBytes.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, "graft_cm_estimate: sketch_bytes is null")
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  /** The native aggregate counts STRING values by their UTF-8 bytes
    * (CountMinSketchAgg passes UTF8String.getBytes) — probe the same
    * way or estimates silently miss. */
  override def nullSafeEval(key: Any, ignored: Any): Any =
    sketch.estimateCount(key.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sk = ctx.addReferenceObj("graftCmSketch", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (key, _) =>
      s"${ev.value} = $sk.estimateCount($key.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmEstimate =
    copy(child = newLeft, sketchBytes = newRight)
}
