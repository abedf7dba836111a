package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd cosine similarity over two array<double> columns.
  *
  * The composable form (zip_with → aggregate) is correct but runs as
  * interpreted higher-order functions (CodegenFallback) with a
  * per-element lambda dispatch and an intermediate zipped array; this
  * expression generates a single fused primitive loop — no
  * allocation, whole-stage-codegen friendly — which is the preference
  * order SURVEY §4 sets: compose built-ins where semantics allow, drop
  * to a custom Expression where the hot loop needs it.
  *
  * Summation order (left-to-right over the array) matches the
  * aggregate() formulation and the DuckDB oracle exactly, so results
  * are bit-identical to both.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects (array<double>, array<double>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += xs.getDouble(i) * ys.getDouble(i); i += 1 }
    var na = 0.0
    i = 0
    while (i < xs.numElements()) { val x = xs.getDouble(i); na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < ys.numElements()) { val y = ys.getDouble(i); nb += y * y; i += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    // zero-norm guard: 0/0 would be NaN, and Spark sorts NaN ABOVE every
    // double, so a zero embedding would rank first in every desc top-k
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $x = $a.getDouble($i); $na += $x * $x;
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  double $y = $b.getDouble($i); $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = $denom == 0.0 ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
