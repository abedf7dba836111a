package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** E30 — record linkage: blocking recall, match quality, and the
  * honesty of the is_correct readout. */
class LinkageSpec extends SparkSpec {

  test("E30: blocking never loses the true match; accuracy is high; errors are ties") {
    val out = Linkage.link(spark, sf).cache()
    val dirtyCount = Linkage
      .dirtyFeed(Tables.customer(spark, sf).select("c_custkey", "c_name"))
      .count()
    // content blocking on the stable suffix has 100% recall here:
    // every dirty row finds candidates and links
    assert(out.count() === dirtyCount, "every dirty row must link")
    assert(out.filter(col("lev") > 2).count() === 0)
    val correct = out.filter(col("is_correct")).count()
    assert(correct.toDouble / dirtyCount > 0.9,
      s"accuracy ${correct.toDouble / dirtyCount} too low")
    // every WRONG link is a genuine ambiguity: the winning candidate's
    // distance is <= the distance to the true source (it won the
    // deterministic (lev, key) tiebreak, it didn't beat a better match)
    val base = Tables.customer(spark, sf)
      .select(col("c_custkey").as("true_key"), col("c_name").as("true_name"))
    val wrong = out.filter(!col("is_correct"))
      .withColumn("true_key", col("dirty_id") - 10000000L)
      .join(base, "true_key")
      .join(Linkage.dirtyFeed(Tables.customer(spark, sf)
        .select("c_custkey", "c_name")), Seq("dirty_id"))
      .withColumn("lev_true", levenshtein(col("dirty_name"), col("true_name")))
      .filter(col("lev") > col("lev_true"))
    assert(wrong.count() === 0,
      "a wrong link must never have beaten a strictly closer true match")
    out.unpersist()
  }
}
