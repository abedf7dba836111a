package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Specs for duplicate-cluster resolution (D15): component semantics
  * on explicit graphs, chain convergence, and keeper selection over
  * the planted-dup corpus. */
class ClustersSpec extends SparkSpec {

  test("connected components merge transitive pairs into one cluster") {
    import spark.implicits._
    // components: {1,2,3} (via 1-2, 2-3), {10,11}; 5-5 self-noise ignored
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val cc = Clusters.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a long chain converges to the minimum label within the round cap") {
    import spark.implicits._
    // path 0-1-2-...-15: diameter 15, worst case for min propagation
    val chain = (0L until 15L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Clusters.connectedComponents(chain).collect()
    assert(cc.length === 16)
    assert(cc.forall(_.getLong(1) == 0L), "every vertex reaches label 0")
  }

  test("large-star/small-star resolves a long chain in few rounds") {
    import spark.implicits._
    // path 0-1-...-40: diameter 40 would cost min propagation 40
    // rounds; the star algorithm contracts it in O(log²) rounds
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Clusters.connectedComponentsStar(chain).collect()
    assert(cc.length === 41)
    assert(cc.forall(_.getLong(1) == 0L), "every vertex reaches root 0")
  }

  test("reliable checkpointing yields the same components as localCheckpoint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val chain = (0L until 15L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Clusters.connectedComponents(chain, checkpointDir = Some(dir)).collect()
    assert(cc.length === 16)
    assert(cc.forall(_.getLong(1) == 0L))
    // the cluster-deployment path really wrote reliable checkpoints
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir)).count() > 0,
      "reliable checkpoint files must land in the given dir")
  }

  test("unconverged min propagation falls back to the star algorithm, not partial labels") {
    import spark.implicits._
    // diameter 10 with maxRounds=2: propagation CANNOT finish; the
    // fallback must still return fully-resolved components
    val chain = (0L until 10L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Clusters.connectedComponents(chain, maxRounds = 2).collect()
    assert(cc.length === 11)
    assert(cc.forall(_.getLong(1) == 0L),
      "fallback must fully resolve the component")
  }

  test("dedupByCluster keeps one doc per cluster plus all unpaired docs") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val kept = Clusters.dedupByCluster(docs, pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // clusters {1,2,3}→keep 1, {5,6}→keep 5; 4 unpaired → kept
    assert(kept === Set(1L, 4L, 5L))
  }

  test("composed dedup pipeline drops verified planted copies and keeps originals") {
    val corpus = Dedup.withPlantedDups(Tables.documents(spark, sf))
    val kept = Dedup.dedupPipeline(corpus).cache()
    // the pipeline must agree with its stages composed by hand
    val candidates = Dedup.minhashLshCandidates(corpus)
    val verified = Dedup.jaccardVerify(candidates, corpus)
    val manual = Clusters.dedupByCluster(corpus, verified)
    assert(kept.select("doc_id").exceptAll(manual.select("doc_id")).count() === 0)
    assert(manual.select("doc_id").exceptAll(kept.select("doc_id")).count() === 0)
    // planted copies that survived jaccard verification are dropped
    val caught = verified.filter(col("doc_b") >= 1000000L)
      .select(col("doc_b").as("doc_id"))
    assert(kept.join(caught, Seq("doc_id")).count() === 0,
      "verified planted copies must not survive the pipeline")
    assert(caught.count() > 0, "the planted corpus must produce verified positives")
    kept.unpersist()
  }

  test("planted duplicates resolve to their original as keeper") {
    val corpus = Dedup.withPlantedDups(Tables.documents(spark, sf))
    val pairs = Dedup.minhashLshCandidates(corpus).cache()
    val planted = pairs.filter(col("doc_b") >= 1000000L)
      .select(col("doc_b").as("doc_id"))
    val kept = Clusters.dedupByCluster(corpus, pairs).cache()
    // every planted copy that LSH caught is dropped (its original has
    // the smaller id), and no original goes missing
    assert(kept.join(planted, Seq("doc_id")).count() === 0,
      "caught planted copies must not survive dedup")
    val originals = Tables.documents(spark, sf).select("doc_id")
      .exceptAll(pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id"))))
    assert(kept.join(originals, Seq("doc_id")).count() === originals.count(),
      "unpaired originals all survive")
    pairs.unpersist(); kept.unpersist()
  }

  test("D66: best-keeper picks the LONGER planted variant, not the min id") {
    val out = graft.SparkEntry.queries("dedup_best_keeper")(spark, sf)
      .collect()
    val clusters = out.map(r => r.getAs[Long]("cluster_id") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("keeper_doc_id"))).toMap
    val planted = clusters.filter(_._2._1 == 2L)
    assert(planted.nonEmpty, "the %50 variants must form 2-doc clusters")
    planted.foreach { case (cid, (_, keeper)) =>
      assert(keeper === cid + 1000000L,
        s"cluster $cid: the appended-tail variant is longer and must win")
    }
    // singletons keep themselves
    clusters.filter(_._2._1 == 1L).foreach { case (cid, (_, keeper)) =>
      assert(keeper === cid)
    }
  }
}
