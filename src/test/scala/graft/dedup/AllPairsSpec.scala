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

  test("D50: span masking hits planted duplicates and spares unique text") {
    val out = Dedup.spanMask(corpus, k = 8, minDf = 2).cache()
    // sanity: masked count never exceeds token count, never negative
    assert(out.filter(col("n_masked") > col("n_tokens") ||
      col("n_masked") < 0).count() === 0)
    // every planted copy and its original share ALL their 8-grams
    // except at the mutated suffix — both must mask ≥ half their tokens
    val plantedIds = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val hot = out.filter(col("doc_id").isin(
      (plantedIds ++ plantedIds.map(_ + 1000000L)).map(Long.box): _*))
    assert(hot.count() > 0)
    assert(hot.filter(col("mask_ratio_q") < 0.5).count() === 0,
      "planted near-dup docs must be majority-masked")
    // corpus-wide, most unique docs stay untouched
    val untouched = out.filter(col("n_masked") === 0).count()
    assert(untouched > out.count() / 2,
      "unique word-salad docs should rarely share an 8-gram")
    out.unpersist()
  }

  test("D47: the candidate join prunes the quadratic pair space") {
    val sets = AllPairs.shingleSets(corpus, 3, hashed = true).cache()
    val n = sets.count()
    val cand = AllPairs.candidatePairs(sets, Tau).count()
    sets.unpersist()
    assert(cand < n * (n - 1) / 2 / 10,
      s"prefix join produced $cand candidates for $n docs — not pruning")
  }

  test("D68: every planted excerpt flags with containment 1.0 — and Jaccard couldn't see it") {
    val rows = graft.SparkEntry.queries("dedup_containment")(spark, sf)
      .collect()
    val planted = rows.filter(_.getAs[Boolean]("is_planted"))
    val expected = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 40 === 0).count()
    assert(planted.length === expected,
      s"planted recall ${planted.length}/$expected must be 1.0")
    planted.foreach { r =>
      assert(r.getAs[Long]("containment_q") === 1000000L,
        "an excerpt's shingles are all inside its source")
      // the same pair under symmetric Jaccard sits far below D47's τ:
      // tiny |A| over a large |A∪B|
      val jac = r.getAs[Long]("n_shared").toDouble /
        (r.getAs[Long]("n_a") + 100) // n_b >= ~100 shingles for full docs
      assert(jac < 0.5, "containment catches what Jaccard misses")
    }
    // hashed mode emits the identical pair set (production path)
    val docs0 = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val excerpts = docs0.filter(col("doc_id") % 40 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        array_join(slice(graft.functions.Text.words(col("text")), 1, 10), " ")
          .as("text"))
    val corpus2 = docs0.unionByName(excerpts)
    val h = AllPairs.containedPairs(corpus2, hashed = true)
      .select("doc_a", "doc_b")
    val s = AllPairs.containedPairs(corpus2, hashed = false)
      .select("doc_a", "doc_b")
    assert(h.exceptAll(s).isEmpty && s.exceptAll(h).isEmpty)
  }
}
