package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D87 — waterfall laws (values are oracle-gated). */
class WaterfallSpec extends SparkSpec {

  test("D88: every planted mirror pair lands in its (source, mirror_feed) cell") {
    val rows = Waterfall.dedupSourceMatrix.fn(spark, sf).collect()
      .map(r => (r.getAs[String]("source_1"), r.getAs[String]("source_2"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("mean_j_ppm")))
    assert(rows.nonEmpty)
    // the planted mirror feed duplicates 1-in-25 docs verbatim-ish:
    // its pairs must dominate the matrix and pair with REAL sources
    val mirror = rows.filter(r => r._1 == "mirror_feed" ||
      r._2 == "mirror_feed")
    assert(mirror.nonEmpty, "the planted mirror must surface")
    val nPlants = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 25 === 0).count()
    assert(mirror.map(_._3).sum >= nPlants,
      "each planted copy pairs with at least its original")
    // mirror↔REAL-source cells are original-vs-copy: near-verbatim.
    // (mirror↔mirror pairs are copies of organically-similar originals
    // and only promise the τ floor.)
    mirror.filter(r => r._1 != r._2).foreach { r =>
      assert(r._4 > 800000L, s"mirror cell $r should be near-verbatim") }
    mirror.foreach { r =>
      assert(r._4 >= 750000L, s"every cell respects the tau floor: $r") }
  }

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
