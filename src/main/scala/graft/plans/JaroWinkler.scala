package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity over two string columns — THE
  * record-linkage comparator (census/MDM matching): prefix-weighted
  * Jaro, tolerant of the transpositions and mid-field typos edit
  * distance over-penalizes. Spark ships levenshtein but no Jaro
  * family; this expression fills that hole with the exact semantics
  * of DuckDB's `jaro_winkler_similarity` (empirically pinned:
  * empty-vs-anything → 0, the Winkler prefix boost applies only when
  * jaro > 0.7, prefix capped at 4, weight 0.1), so linkage entries
  * using it stay fully oracle-gated. Codegen emits a static call into
  * [[JaroWinkler.score]] — one primitive-array pass per comparison,
  * no interpreted fallback.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaroWinkler$$.MODULE$$.score($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Exact mirror of DuckDB's jaro_winkler_similarity (see the
    * Scaladoc above for the pinned edge semantics). DuckDB compares
    * raw UTF-8 BYTES, not code points — 'héllo' vs 'hello' is 0.84
    * there, and a UTF-16 char loop scores it 0.88 — so this loop runs
    * over the UTF8String's bytes for parity on non-ASCII input too
    * (UTF8String is already UTF-8: no copy beyond the array fetch). */
  def score(ua: UTF8String, ub: UTF8String): Double = {
    val s = ua.getBytes
    val t = ub.getBytes
    val ls = s.length
    val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(0, math.max(ls, lt) / 2 - 1)
    val sM = new Array[Boolean](ls)
    val tM = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val lo = math.max(0, i - window)
      val hi = math.min(lt - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tM(j) && s(i) == t(j)) {
          sM(i) = true; tM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var trans = 0
    i = 0
    while (i < ls) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val mt = trans / 2
    val jaro = (m.toDouble / ls + m.toDouble / lt +
      (m - mt).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val pMax = math.min(4, math.min(ls, lt))
    while (p < pMax && s(p) == t(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}
