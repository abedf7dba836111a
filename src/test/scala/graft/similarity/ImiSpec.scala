package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** D111 — two-level IMI coarse quantizer: the structural laws that
  * make the uncapped design trustworthy, plus the planted-recall and
  * exact-rerank gates the other ANN variants carry. */
class ImiSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("D111: assignment is the (argmax1, argmax2) product cell and " +
      "nprobe=1 probing returns exactly the own assign cell") {
    val (cb1, cb2) = Imi.codebooks(emb, 4, sf + "#imispec")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val assigned = Imi.assignCells(emb, cb1, cb2, dim)
      .withColumn("probe1",
        Imi.probeCells(col("embedding"), cb1, cb2, dim, 1)(0))
      .cache()
    // cell ids live in [0, K1*K2)
    val range = assigned.agg(min("cell"), max("cell")).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) < cb1.size * cb2.size)
    // the top-1 probed cell IS the assign cell, for every vector:
    // probing ranks pairs by summed half-scores and the max-sum pair
    // is (argmax1, argmax2) — the structural planted-copy guarantee
    assert(assigned.filter(col("cell") =!= col("probe1")).count() === 0)
    assigned.unpersist()
  }

  test("D111: with one cell per half the index degenerates to brute force") {
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val imi = Imi.topK(emb, queries, 10, cellsPerHalf = 1, nprobe = 1)
    val exact = Ann.bruteForceTopK(emb, queries, 10)
    assert(imi.unionByName(exact).distinct().count() === exact.count(),
      "K=1 IMI must equal the exact brute-force top-k bit for bit")
  }

  test("D111: planted identical copies are recalled (both half-argmax " +
      "cells shared) and survivors carry exact cosines") {
    val queries = emb.filter(col("vec_id") % 100 === 0).cache()
    val planted = emb.select("vec_id", "embedding", "label").unionByName(
      queries.select((col("vec_id") + 1000000L).as("vec_id"),
        col("embedding"), col("label")))
    val res = Imi.topK(planted, queries, 10, cacheKey = sf + "#imiplant").cache()
    val nq = queries.count()
    val hits = res.filter(col("vec_id") === col("q_id") + 1000000L).count()
    assert(hits === nq, s"planted copy must share the product cell: $hits/$nq")
    val exact = Ann.bruteForceTopK(planted, queries, 10)
      .select(col("q_id"), col("vec_id"), col("cos_sim").as("exact_cos"))
    assert(res.join(exact, Seq("q_id", "vec_id"))
      .filter(col("cos_sim") =!= col("exact_cos")).count() === 0)
    res.unpersist(); queries.unpersist()
  }

  test("D111: coverage entry carries self-verified recall within bounds") {
    val out = graft.dedup.PipelineQueries.annIvfImi.fn(spark, sf).cache()
    val row = out.select("min_recall", "mean_recall", "top1_recall").head()
    val (mn, mean, top1) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    info(s"ann_ivf_imi: min_recall=$mn mean_recall=$mean top1_recall=$top1")
    assert(top1 >= 0.9, s"top-1 recall vs exact baseline: $top1")
    assert(mean >= 0.2, s"mean recall@10 vs exact baseline: $mean")
    assert(mn >= 0.0 && mn <= mean && mean <= 1.0)
    out.unpersist()
  }
}
