package graft.dedup

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** D47 — exact prefix-filtered all-pairs similarity join: exactness
  * (parity with an uncapped brute-force join), hashed/string mode
  * parity, planted recall, and that the prefix join actually prunes
  * the quadratic pair space. */
class AllPairsSpec extends SparkSpec {

  private val Tau = 0.75
  private lazy val docs = Tables.documents(spark, sf)
  private lazy val corpus = Dedup.withPlantedDups(docs).cache()

  /** Uncapped quadratic reference: every (a<b) pair, same sets. */
  private def bruteForce(hashed: Boolean) = {
    val sets = AllPairs.shingleSets(corpus, 3, hashed)
    sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .crossJoin(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .filter(col("jaccard") >= Tau)
      .select("doc_a", "doc_b", "jaccard")
  }

  test("D47: prefix-filtered result equals the brute-force pair set") {
    val fast = AllPairs.similarPairs(corpus, 3, Tau, hashed = true)
    val slow = bruteForce(hashed = true)
    assert(fast.count() > 0, "degenerate: no qualifying pairs at all")
    assert(fast.exceptAll(slow).count() === 0 &&
           slow.exceptAll(fast).count() === 0,
      "prefix filtering must lose no qualifying pair and add none")
  }

  test("D47: hashed and string shingle modes emit the identical pairs") {
    val h = AllPairs.similarPairs(corpus, 3, Tau, hashed = true)
      .select("doc_a", "doc_b")
    val s = AllPairs.similarPairs(corpus, 3, Tau, hashed = false)
      .select("doc_a", "doc_b")
    assert(h.exceptAll(s).count() === 0 && s.exceptAll(h).count() === 0)
  }

  test("D47: every planted near-dup pair is found (J≈0.85 ≥ τ)") {
    val plantedPairs = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 1000000L).as("doc_b"))
    val out = AllPairs.similarPairs(corpus, 3, Tau, hashed = true)
    val found = plantedPairs.join(out, Seq("doc_a", "doc_b"), "left_semi").count()
    assert(found === plantedPairs.count())
  }

  test("D47: the candidate join prunes the quadratic pair space") {
    val sets = AllPairs.shingleSets(corpus, 3, hashed = true).cache()
    val n = sets.count()
    val cand = AllPairs.candidatePairs(sets, Tau).count()
    sets.unpersist()
    assert(cand < n * (n - 1) / 2 / 10,
      s"prefix join produced $cand candidates for $n docs — not pruning")
  }
}
