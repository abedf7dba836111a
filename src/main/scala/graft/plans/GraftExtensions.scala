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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "graft_hyperplane_buckets"),
      (children: Seq[Expression]) => HyperplaneBuckets(children(0),
        children(1).eval().asInstanceOf[Int], children(2).eval().asInstanceOf[Int])))
    ext.injectFunction((
      new FunctionIdentifier("graft_vec_mean"),
      new ExpressionInfo(classOf[VecMean].getName, "graft_vec_mean"),
      (children: Seq[Expression]) => VecMean(children.head).toAggregateExpression()))
  }
}
