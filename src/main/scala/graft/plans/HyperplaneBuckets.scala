package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native random-hyperplane LSH bucket codes: for each of `tables`
  * hash tables, packs `planes` sign bits of Rademacher projections
  * (components ±1 derived from xxhash64(t, p, j), the same family the
  * composable formulation used) into one long bucket code.
  *
  * The composable zip_with/aggregate form dispatches ~tables·planes·dim
  * interpreted lambda calls per row; here the ±1 sign matrix is built
  * once per partition (lazily, sized to the vector dimensionality) and
  * the projection is a fused primitive loop.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, planes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_buckets expects array<double>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_buckets"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val signs = HyperplaneBuckets.signMatrix(tables, planes, n)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var p = 0
      while (p < planes) {
        val row = signs(t * planes + p)
        var proj = 0.0
        var j = 0
        while (j < n) { proj += a.getDouble(j) * row(j); j += 1 }
        code = code * 2 + (if (proj > 0) 1L else 0L)
        p += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val signs = ctx.addMutableState("double[][]", "hpSigns")
      val cls = classOf[HyperplaneBuckets].getName
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val code = ctx.freshName("code")
      val proj = ctx.freshName("proj")
      val row = ctx.freshName("row")
      s"""
         |int $n = $a.numElements();
         |if ($signs == null || $signs[0].length < $n) {
         |  $signs = $cls.signMatrix($tables, $planes, $n);
         |}
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $code = 0L;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    double[] $row = $signs[$t * $planes + $p];
         |    double $proj = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $proj += $a.getDouble($j) * $row[$j];
         |    }
         |    $code = $code * 2 + ($proj > 0 ? 1L : 0L);
         |  }
         |  $out[$t] = $code;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets =
    copy(child = c)
}

object HyperplaneBuckets {
  /** ±1 components for plane (t, p), dimension j — exactly the family
    * of the composable form: the low bit of xxhash64 over the int
    * children (t, p, j) with Spark's seed 42, folded left. Cached per
    * (tables, planes, dim). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  def signMatrix(tables: Int, planes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((tables, planes, dim), { _ =>
      Array.tabulate(tables * planes) { row =>
        val t = row / planes
        val p = row % planes
        Array.tabulate(dim) { j =>
          var h = 42L
          h = XXH64.hashInt(t, h)
          h = XXH64.hashInt(p, h)
          h = XXH64.hashInt(j, h)
          if ((h & 1L) == 1L) 1.0 else -1.0
        }
      }
    })
}
