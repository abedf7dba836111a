package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D91 — ranking-eval laws: metric arithmetic recomputed from the
  * ranked lists themselves, and internal consistency bounds. */
class RankingEvalSpec extends SparkSpec {

  private lazy val rows = PipelineQueries.qRankingEval.fn(spark, sf).collect()

  test("D91: metric bounds and null/zero agreement") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val at5 = r.getAs[Long]("rel_at_5"); val at10 = r.getAs[Long]("rel_at_10")
      assert(at5 >= 0 && at5 <= 5 && at10 >= at5 && at10 <= 10)
      val none = r.isNullAt(r.fieldIndex("first_rel_rank"))
      assert(none === (at10 === 0L), "no relevant hit iff zero count")
      if (none) assert(r.getAs[Long]("rr_ppm") === 0L)
      else assert(r.getAs[Long]("rr_ppm") ===
        1000000L / r.getAs[Long]("first_rel_rank"))
    }
  }

  test("D91: metrics replay exactly from the underlying top-10 lists") {
    val emb = graft.Tables.embeddings(spark, sf)
    val lbl = emb.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val ranked = graft.similarity.Ann
      .bruteForceTopK(emb, PipelineQueries.boundedQueries(emb), 10)
      .collect()
      .groupBy(_.getAs[Long]("q_id"))
    rows.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val hits = ranked(q).sortBy(_.getAs[Int]("rnk"))
        .map(x => (x.getAs[Int]("rnk"), lbl(x.getAs[Long]("vec_id"))))
      val ql = r.getAs[Int]("q_label")
      assert(lbl(q) === ql)
      val firstRel = hits.collectFirst { case (rk, l) if l == ql => rk.toLong }
      assert(Option(r.getAs[java.lang.Long]("first_rel_rank"))
        .map(_.toLong) === firstRel)
      assert(r.getAs[Long]("rel_at_10") === hits.count(_._2 == ql).toLong)
      assert(r.getAs[Long]("rel_at_5") ===
        hits.count { case (rk, l) => rk <= 5 && l == ql }.toLong)
    }
  }
}
