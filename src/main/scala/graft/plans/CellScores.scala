package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `graft_cell_scores(emb, codebook)` — cosine of one embedding against
  * EVERY centroid of a foldable codebook literal, in one fused loop.
  *
  * The composable form (an `array()` of per-centroid `graft_cosine`
  * calls) inlines `cells` separate expression trees: at 32+ cells the
  * generated method blows past JIT/codegen size limits and execution
  * degrades to interpreted per-cell dispatch — measured 1.6× SLOWER at
  * 32 cells than 16 despite doing less downstream work. This
  * expression generates one compact cells × dim loop with the codebook
  * and its precomputed norms shipped once as codegen reference objects.
  *
  * Per-cell arithmetic is EXACTLY [[CosineSimilarity]]'s (dot over
  * min-length, norms over full length, left-to-right accumulation,
  * zero-norm → 0.0), so scores are bit-identical to the composed form
  * and existing memoized IVF codebooks stay valid.
  */
case class CellScores(child: Expression, codebook: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = codebook

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, codebook.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _))
          if codebook.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_cell_scores: codebook must be foldable (a literal — it is " +
            "tiny by construction and ships once per plan)")
      case (c, b) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_cell_scores expects (array<double>, array<array<double>>), " +
            s"got (${c.sql}, ${b.sql})")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_cell_scores"

  /** Codebook rows + norms, materialized once per plan. */
  @transient private lazy val cb: Array[Array[Double]] = {
    val arr = codebook.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { c =>
      arr.getArray(c).toDoubleArray()
    }
  }
  @transient private lazy val cbNorm: Array[Double] =
    cb.map { v =>
      var s = 0.0; var j = 0
      while (j < v.length) { s += v(j) * v(j); j += 1 }
      math.sqrt(s)
    }

  private def score(emb: ArrayData): GenericArrayData = {
    var en = 0.0
    var j = 0
    val m = emb.numElements()
    while (j < m) { val x = emb.getDouble(j); en += x * x; j += 1 }
    en = math.sqrt(en)
    val out = new Array[Double](cb.length)
    var c = 0
    while (c < cb.length) {
      val cv = cb(c)
      val n = math.min(m, cv.length)
      var dot = 0.0
      j = 0
      while (j < n) { dot += emb.getDouble(j) * cv(j); j += 1 }
      val denom = en * cbNorm(c)
      out(c) = if (denom == 0.0) 0.0 else dot / denom
      c += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(emb: Any, ignored: Any): Any =
    score(emb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("graftCellScores", this, classOf[CellScores].getName)
    nullSafeCodeGen(ctx, ev, (emb, _) =>
      // delegate to the compiled score() loop: it is already monomorphic
      // primitive code; inlining it again into the generated class buys
      // nothing and keeps the generated method tiny at any cell count
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.scoreFor($emb);")
  }

  /** Codegen entry point (public for the generated class). */
  def scoreFor(emb: ArrayData): ArrayData = score(emb)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellScores =
    copy(child = newLeft, codebook = newRight)
}
