package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D56 — source-overlap matrix: exact values on a hand-built corpus,
  * the MinHash estimator within sampling error of the exact matrix,
  * and signature determinism (mergeable-aggregate property). */
class SourceOverlapSpec extends SparkSpec {

  private def handCorpus = {
    import spark.implicits._
    // src A and B share half their text verbatim; C is disjoint
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "A"),
      (2L, "eta theta iota kappa lambda mu", "A"),
      (3L, "alpha beta gamma delta epsilon zeta", "B"),
      (4L, "nu xi omicron pi rho sigma", "B"),
      (5L, "tau upsilon phi chi psi omega", "C"))
      .toDF("doc_id", "text", "source")
  }

  test("D56: exact overlap on a known corpus") {
    val out = SourceOverlap.exactOverlap(handCorpus).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_inter"),
          r.getAs[Double]("jaccard"))).toMap
    // each 6-word doc → 4 distinct 3-shingles; A∩B = doc1's 4 shingles
    val ab = out(("A", "B"))
    assert(ab._1 === 8L && ab._2 === 8L && ab._3 === 4L)
    assert(math.abs(ab._4 - 4.0 / 12.0) < 1e-4)
    // C intersects nothing → inner-join semantics: no C rows at all
    assert(!out.contains(("A", "C")) && !out.contains(("B", "C")))
  }

  test("D56: MinHash estimate within sampling error of exact; signatures deterministic") {
    val docs = graft.Tables.documents(spark, sf)
    val exact = SourceOverlap.exactOverlap(docs).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[Double]("jaccard")).toMap
    val sigs = SourceOverlap.minhashSignatures(docs)
    val est = SourceOverlap.estimateOverlap(sigs).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[Double]("est_jaccard")).toMap
    assert(exact.nonEmpty)
    exact.foreach { case (pair, j) =>
      // k=128 perms → σ = sqrt(J(1−J)/128) ≤ 0.045; 4σ bound. The
      // estimator hashes shingles (xxhash64) while exact uses strings —
      // identical sets, so only MinHash sampling noise separates them.
      val e = est.getOrElse(pair, 0.0)
      assert(math.abs(e - j) <= 0.18, s"$pair exact=$j est=$e")
    }
    val sigA = sigs.orderBy("source").collect().map(_.getSeq[Long](1))
    val sigB = SourceOverlap.minhashSignatures(docs)
      .orderBy("source").collect().map(_.getSeq[Long](1))
    assert(sigA.map(_.toSeq).toSeq === sigB.map(_.toSeq).toSeq,
      "signatures must be deterministic across runs")
  }
}
