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

  test("D111: cell balance under a power-law corpus — occupancy ratio " +
      "bounded, or widened nprobe provably restores recall (the IVF " +
      "cap's job, now capless)") {
    // Deterministic skewed corpus, the D22/GenScale inverse-CDF trick
    // applied to LATENT CLUSTERS instead of users: cluster =
    // floor((i/n)^3 * 64) puts ~25% of all vectors in cluster 0 —
    // a 4%-hot-corpus is the r9 skew convention; this is harsher.
    val n = 20000L; val latent = 64; val dim = 16
    val base = spark.range(n).select(col("id").as("vec_id"),
      floor(pow(col("id").cast("double") / n, 3.0) * latent)
        .cast("int").as("lat"))
    val corpus = base.select(col("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        (pmod(xxhash64(col("lat"), d), lit(2000)).cast("double") / 1000.0 - 1.0) +
          (pmod(xxhash64(col("vec_id"), d, lit(77)), lit(200)).cast("double")
            / 1000.0 - 0.1)).as("embedding")).cache()
    val kHalf = Imi.autoCellsPerHalf(corpus, "") // N^(1/4): 12 per half
    val (cb1, cb2) = Imi.codebooks(corpus, kHalf, "")
    val occ = Imi.assignCells(corpus, cb1, cb2, dim)
      .groupBy("cell").count().agg(
        max("count").cast("double").as("mx"),
        avg("count").as("mean"), count(lit(1)).as("nonempty")).head()
    val ratio = occ.getDouble(0) / occ.getDouble(1)
    val nonempty = occ.getLong(2)
    info(f"IMI occupancy under power-law skew: K=$kHalf/half, " +
      f"$nonempty nonempty cells, max/mean = $ratio%.1f")
    // the quantizer must actually subdivide — a handful of mega-cells
    // would mean density-blind codebooks (seeds are hash-sampled from
    // the corpus, so dense regions get proportionally more centroids)
    assert(nonempty >= latent / 2,
      s"only $nonempty nonempty cells — the hot region is not subdivided")
    if (ratio > 12.0) {
      // unbalanced: the DOCUMENTED mitigation is widening nprobe —
      // prove it restores recall on this exact corpus
      val queries = corpus.filter(col("vec_id") % 200 === 0)
      val exact = Ann.bruteForceTopK(corpus, queries, 10)
        .select("q_id", "vec_id")
      val wide = Imi.topK(corpus, queries, 10, cellsPerHalf = kHalf,
        nprobe = 16).select("q_id", "vec_id")
      val recall = wide.join(exact, Seq("q_id", "vec_id")).count().toDouble /
        exact.count()
      info(f"ratio > 12 — widened nprobe=16 recall@10 = $recall%.3f")
      assert(recall >= 0.9,
        f"occupancy ratio $ratio%.1f and nprobe=16 recall $recall%.3f: " +
          "neither balance nor the widen-nprobe mitigation holds")
    }
    corpus.unpersist()
  }

  test("D111: index written partitionBy(combined cell) prunes the probe " +
      "scan to probed cells and matches the in-memory path bit-for-bit") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_imi_idx").toString + "/index"
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val (cb1, cb2) = Imi.writeIndex(emb, dir, cellsPerHalf = 4,
      cacheKey = sf + "#imiidx")
    val totalCells = cb1.size * cb2.size
    val fromIndex = Imi.topKFromIndex(spark, dir, cb1, cb2, queries, 10)
    // the scan must read ONLY the probed cell directories (inspect
    // BEFORE any cache: caching substitutes an InMemoryTableScan)
    val scan = fromIndex.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.output.exists(_.name == "cell") => f
    }.head
    val read = scan.selectedPartitions.partitionCount
    // the strong form (r10 ADVICE): the scan's selected partitions are
    // bounded by the PROBED cell set intersected with what exists on
    // disk — a full scan of the nonempty directories cannot pass
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val probed = queries.select(
        explode(Imi.probeCells(col("embedding"), cb1, cb2, dim, 4)).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSet
    val onDisk = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("cell="))
      .map(_.getName.drop("cell=".length).toInt).toSet
    assert(read > 0 && read <= (probed intersect onDisk).size,
      s"probe must read ONLY probed cells: read $read, probed ${probed.size}, " +
        s"probed-and-nonempty ${(probed intersect onDisk).size}")
    assert(onDisk.size > probed.size,
      s"fixture must have unprobed nonempty cells for this assert to " +
        s"bite: ${onDisk.size} on disk vs ${probed.size} probed " +
        s"(of $totalCells total)")
    // parity with the in-memory IMI path on the same memoized codebooks
    val direct = Imi.topK(emb, queries, 10, cellsPerHalf = 4,
      cacheKey = sf + "#imiidx")
    assert(fromIndex.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(fromIndex).count() === 0)
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
