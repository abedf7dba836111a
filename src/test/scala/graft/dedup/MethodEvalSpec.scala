package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** D108 — candidate-stage precision/recall laws, recomputed from the
  * constituent operators. */
class MethodEvalSpec extends SparkSpec {

  private lazy val rows = PipelineQueries.dedupMethodEval.fn(spark, sf)
    .collect()
    .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))).toMap

  test("count identities: tp bounded by both sides, ratios consistent") {
    assert(rows.keySet == Set("minhash_lsh", "simhash_h3"))
    rows.foreach { case (m, (nc, nt, tp, p, r)) =>
      assert(tp <= nc && tp <= nt, m)
      if (nc > 0) assert(p == tp * 1000000L / nc, m)
      if (nt > 0) assert(r == tp * 1000000L / nt, m)
      assert(nt > 0, "the truth set must be non-empty (planted pairs exist)")
    }
  }

  test("tp replays as the intersection of the real candidate and truth sets") {
    val corpus = Dedup.withPlantedDups(Tables.documents(spark, sf))
    val truth = AllPairs.similarPairs(corpus, k = 3, tau = 0.5)
      .select("doc_a", "doc_b")
    val cand = Dedup.minhashLshCandidates(corpus)
      .select("doc_a", "doc_b").distinct()
    val tp = cand.join(truth, Seq("doc_a", "doc_b"), "leftsemi").count()
    assert(rows("minhash_lsh")._3 == tp)
    assert(rows("minhash_lsh")._1 == cand.count())
    assert(rows("minhash_lsh")._2 == truth.count())
  }

  test("the LSH banding is calibrated for tau=0.5: recall dominates simhash's") {
    // D2b tuned the shipped bands for a tau band around 0.5-0.75; the
    // 2-shingle simhash hamming cut targets much nearer-duplicates, so
    // on the tau=0.5 truth set minhash must recall at least as much
    assert(rows("minhash_lsh")._5 >= rows("simhash_h3")._5)
    assert(rows("minhash_lsh")._5 > 500000L, "planted pairs sit in the design band")
  }
}
