package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions with the
  * function registry, so they are callable from both the Column API
  * (call_function) and plain SQL. Installed via
  * `spark.sql.extensions=graft.plans.GraftExtensions` — see
  * [[graft.Sessions.local]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Builder-time scalar argument: accepts any foldable integral
    * expression (SQL integer literals parse as INT or BIGINT depending
    * on magnitude) and fails with a named-argument message instead of a
    * bare ClassCastException/NPE for anything else. */
  private def intArg(e: Expression, fn: String, argName: String): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument '$argName' must be a constant integer, got non-foldable ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$argName' must be a constant integer, got " +
          s"${if (other == null) "NULL" else other.toString} (${e.dataType.sql})")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in logical rewrite: natural point-in-interval joins →
    // bucketed equi-joins (see RangeJoinRewrite; fires only when
    // spark.graft.rangeJoin.bucketWidth is a positive long)
    ext.injectOptimizerRule(_ => new RangeJoinRewrite)
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "graft_hyperplane_buckets"),
      (children: Seq[Expression]) => HyperplaneBuckets(children(0),
        intArg(children(1), "graft_hyperplane_buckets", "tables"),
        intArg(children(2), "graft_hyperplane_buckets", "planesPerTable"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_vec_mean"),
      new ExpressionInfo(classOf[VecMean].getName, "graft_vec_mean"),
      (children: Seq[Expression]) => VecMean(children.head).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_vec_sum_long"),
      new ExpressionInfo(classOf[VecSumLong].getName, "graft_vec_sum_long"),
      (children: Seq[Expression]) => VecSumLong(children.head).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimhashAgg].getName, "graft_simhash64"),
      (children: Seq[Expression]) => SimhashAgg(children.head).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_cell_scores"),
      new ExpressionInfo(classOf[CellScores].getName, "graft_cell_scores"),
      (children: Seq[Expression]) => CellScores(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => BloomMightContain(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cm_estimate"),
      new ExpressionInfo(classOf[CmEstimate].getName, "graft_cm_estimate"),
      (children: Seq[Expression]) => CmEstimate(children(0), children(1))))
  }
}
