package graft.similarity

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** Specs for similarity search D5-D7: exactness of cosine, brute-force
  * correctness, and LSH recall on planted high-similarity neighbors. */
class AnnSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("D5: cosine of a vector with itself is 1") {
    val self = emb.select(
      round(Ann.cosine(col("embedding"), col("embedding")), 4).as("c"))
    assert(self.filter(col("c") =!= 1.0).count() === 0)
  }

  test("D6: brute-force top-k returns exactly k ranked neighbors per query") {
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val topk = Ann.bruteForceTopK(emb, queries, 10).cache()
    val counts = topk.groupBy("q_id").count().collect()
    assert(counts.nonEmpty)
    assert(counts.forall(_.getAs[Long]("count") == 10L))
    // ranks are 1..10 and cosine is non-increasing within a query
    val badRank = topk.groupBy("q_id")
      .agg(min("rnk").as("mn"), max("rnk").as("mx")).collect()
    assert(badRank.forall(r => r.getAs[Int]("mn") == 1 && r.getAs[Int]("mx") == 10))
    topk.unpersist()
  }

  test("D7-alt: IVF ANN recalls planted identical neighbors and matches exact cosines") {
    val queries = emb.filter(col("vec_id") % 100 === 0).cache()
    val plantedCorpus = emb.select("vec_id", "embedding", "label").unionByName(
      queries.select((col("vec_id") + 1000000L).as("vec_id"),
        col("embedding"), col("label")))
    val res = Ivf.topK(plantedCorpus, queries, 10).cache()
    val nq = queries.count()
    val hits = res.filter(col("vec_id") === col("q_id") + 1000000L).count()
    assert(hits === nq, s"identical planted vector shares the query's cell: $hits/$nq")
    // IVF results are a subset of candidates ranked by the same exact
    // cosine as brute force
    val exact = Ann.bruteForceTopK(plantedCorpus, queries, 10)
      .select(col("q_id"), col("vec_id"), col("cos_sim").as("exact_cos"))
    val mismatches = res.join(exact, Seq("q_id", "vec_id"))
      .filter(col("cos_sim") =!= col("exact_cos")).count()
    assert(mismatches === 0)
    res.unpersist(); queries.unpersist()
  }

  test("D7: LSH ANN recalls planted near-identical neighbors") {
    import spark.implicits._
    // plant: for each query vector, a copy with id+1000000 (cosine 1)
    val queries = emb.filter(col("vec_id") % 100 === 0).cache()
    val plantedCorpus = emb.select("vec_id", "embedding", "label").unionByName(
      queries.select((col("vec_id") + 1000000L).as("vec_id"),
        col("embedding"), col("label")))
    val res = Ann.lshTopK(plantedCorpus, queries, 10).cache()
    val hits = res
      .filter(col("vec_id") === col("q_id") + 1000000L)
      .count()
    val nq = queries.count()
    assert(hits >= (nq * 0.9).toLong,
      s"planted-neighbor recall: $hits/$nq")
    // every returned neighbor's cosine must match the exact computation
    val exact = Ann.bruteForceTopK(plantedCorpus, queries, 10)
      .select(col("q_id"), col("vec_id"), col("cos_sim").as("exact_cos"))
    val mismatches = res.join(exact, Seq("q_id", "vec_id"))
      .filter(col("cos_sim") =!= col("exact_cos")).count()
    assert(mismatches === 0)
    res.unpersist(); queries.unpersist()
  }
}
