package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** D39 — the classifier's structural claims: one map-side projection
  * (no shuffle anywhere in the plan), bounded scores, exact empty-doc
  * semantics. */
class ClassifierSpec extends SparkSpec {

  test("inference is one Exchange-free projection over the scan") {
    val df = Classifier.scored(
      Tables.documents(spark, sf).select("doc_id", "text"), col("text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"classifier inference must not shuffle:\n$plan")
  }

  test("scores are bounded mean weights and actually discriminate") {
    val out = Classifier.scored(
      Tables.documents(spark, sf).select("doc_id", "text"), col("text"))
      .select("score", "keep").collect()
    assert(out.nonEmpty)
    // mean of integer weights in [-500, 500] scaled by 1/1000
    assert(out.forall(r => math.abs(r.getDouble(0)) <= 0.5))
    // a constant score would mean the hash or weights are broken
    assert(out.map(_.getDouble(0)).distinct.length > 10)
    assert(out.exists(_.getBoolean(1)) && out.exists(!_.getBoolean(1)),
      "threshold 0 must split the corpus both ways")
  }

  test("token-less documents score 0.0 and never pass a >= 0 threshold") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "   "), (3L, "!!!"), (4L, "real words here"))
      .toDF("doc_id", "text")
    val out = Classifier.scored(docs, col("text"))
      .orderBy("doc_id").collect()
    out.take(3).foreach { r =>
      assert(r.getAs[Int]("n_tokens") === 0)
      assert(r.getAs[Double]("score") === 0.0)
      assert(!r.getAs[Boolean]("keep"))
    }
    assert(out(3).getAs[Int]("n_tokens") === 3)
  }
}
