package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D26 SemDeDup: planted-copy recall must be perfect (exact copies at
  * cosine 1.0 cannot be missed — same cell, above any threshold), the
  * keeper set must be exactly corpus-minus-copies on the isotropic
  * test corpus, and the per-cell population valve must bound the
  * quadratic block. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  test("dedup_semantic: every planted exact copy is dropped, originals kept") {
    val rows = graft.SparkEntry.queries("dedup_semantic")(spark, sf).collect()
    assert(rows.nonEmpty)
    val r = rows.head
    assert(r.getAs[Long]("planted_expected") > 0)
    assert(r.getAs[Double]("planted_recall") === 1.0,
      s"planted_recall=${r.getAs[Double]("planted_recall")}")
    // threshold 0.99 on isotropic noise: no natural duplicate pairs,
    // so the ONLY non-keepers are the planted copies
    assert(r.getAs[Long]("n_dropped") === r.getAs[Long]("planted_expected"))
    // per-row check: keeper-ship is exactly "not a planted copy"
    rows.foreach { row =>
      assert(row.getAs[Boolean]("is_keeper") === !row.getAs[Boolean]("is_planted_copy"),
        s"vec ${row.getAs[Long]("vec_id")}")
    }
  }

  test("planted copies cluster WITH their original (same cluster_id)") {
    val out = graft.SparkEntry.queries("dedup_semantic")(spark, sf)
      .select("vec_id", "cluster_id").filter(col("cluster_id").isNotNull)
      .as[(Long, Long)].collect().toMap
    val copies = out.keys.filter(_ >= 10000000L)
    assert(copies.nonEmpty)
    copies.foreach { c =>
      assert(out(c) === out(c - 10000000L),
        s"copy $c not in its original's cluster")
      assert(out(c) === c - 10000000L, s"cluster of $c should be labeled by the original")
    }
  }

  test("per-cell valve caps the quadratic block deterministically") {
    val rnd = new scala.util.Random(3)
    // 40 identical-cell vectors; cap at 5 → at most C(5,2)=10 pairs
    val vecs = (1L to 40L).map(i => (i, Seq.fill(4)(rnd.nextDouble()), 0))
      .toDF("vec_id", "emb", "cell")
      .withColumn("emb", col("emb").cast("array<double>"))
    val pairs = SemDedup.duplicatePairs(vecs, threshold = -1.0, maxCell = 5)
    assert(pairs.count() === 10)
    // determinism: same input → same capped sample → same pairs
    val a = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = SemDedup.duplicatePairs(vecs, threshold = -1.0, maxCell = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }
}
