package graft.dedup

import graft.SparkSpec

/** D112 — RRF fusion laws over the two retrieval legs. */
class HybridRetrievalSpec extends SparkSpec {

  private lazy val rows =
    HybridRetrieval.textHybridRrf.fn(spark, sf).collect()

  private def leg(r: org.apache.spark.sql.Row, c: String): Option[Int] =
    if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Int](c))

  test("D112: fused head is well-formed — contiguous ranks, rrf " +
      "monotone, integer ppm arithmetic exact per row") {
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq ===
        (1 to byRank.length), s"q=$q ranks not contiguous")
      val rrfs = byRank.map(_.getAs[Long]("rrf_q")).toSeq
      assert(rrfs === rrfs.sorted.reverse, s"q=$q rrf not monotone")
    }
    rows.foreach { r =>
      val expect = leg(r, "lex_rank").fold(0L)(x => 1000000L / (x + 60)) +
        leg(r, "dense_rank").fold(0L)(x => 1000000L / (x + 60))
      assert(r.getAs[Long]("rrf_q") === expect,
        s"rrf arithmetic broken on ${r.getAs[Long]("doc_id")}")
    }
  }

  test("D112: RRF's point holds structurally — every two-leg doc " +
      "outranks every single-leg doc (min two-leg 2/(60+20) beats max " +
      "single-leg 1/(60+1) at these k/C), and at least one exists") {
    val (both, single) = rows.partition(r =>
      leg(r, "lex_rank").isDefined && leg(r, "dense_rank").isDefined)
    assert(both.nonEmpty, "corpus must yield at least one two-leg doc " +
      "(1 at sf0.001, 2 at sf0.01 — deterministic)")
    if (single.nonEmpty) {
      val minBoth = both.map(_.getAs[Long]("rrf_q")).min
      val maxSingle = single.map(_.getAs[Long]("rrf_q")).max
      assert(minBoth > maxSingle,
        s"two-leg dominance violated: $minBoth <= $maxSingle")
    }
    // and dominance shows up as rank: within its query, a two-leg doc
    // sits above every single-leg doc
    both.foreach { b =>
      val q = b.getAs[Long]("q_id")
      val worseSingles = single.filter(s => s.getAs[Long]("q_id") == q &&
        s.getAs[Int]("rank") < b.getAs[Int]("rank"))
      assert(worseSingles.isEmpty,
        s"q=$q: single-leg docs ranked above a two-leg doc")
    }
  }
}
