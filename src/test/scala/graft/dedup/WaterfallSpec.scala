package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D87 — waterfall laws (values are oracle-gated). */
class WaterfallSpec extends SparkSpec {

  test("D87: stages chain exactly, only shrink, and end at the direct filter count") {
    val rows = Waterfall.pipelineWaterfall.fn(spark, sf).collect()
      .sortBy(_.getAs[Int]("stage"))
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_out") <= r.getAs[Long]("n_in"))
      assert(r.getAs[Long]("dropped") ===
        r.getAs[Long]("n_in") - r.getAs[Long]("n_out"))
    }
    rows.sliding(2).filter(_.length == 2).foreach { p =>
      assert(p(1).getAs[Long]("n_in") === p(0).getAs[Long]("n_out"),
        "each stage must consume exactly the previous stage's survivors")
    }
    // the final survivor count equals one direct conjunctive filter
    val docs = graft.Tables.documents(spark, sf)
      .withColumn("canon", graft.functions.Text.canonical(col("text")))
      .withColumn("ws", split(col("canon"), " "))
    val q = graft.functions.Text.qualityScoreOn(
      graft.functions.Text.qualityComponentsOn(col("text"), col("canon"),
        col("ws")).toMap)
    val direct = docs.filter(col("lang") === "en" &&
      col("n_chars").between(100, 500) && q > 0.5 &&
      size(col("ws")) >= 30).count()
    assert(rows.last.getAs[Long]("n_out") === direct)
    // the fixture must exercise every gate (each drops something)
    assert(rows.forall(_.getAs[Long]("dropped") > 0),
      "every gate should bite on this corpus")
  }
}
