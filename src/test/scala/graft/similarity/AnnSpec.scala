package graft.similarity

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** Specs for similarity search D5-D7: exactness of cosine, brute-force
  * correctness, and LSH recall on planted high-similarity neighbors. */
class AnnSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("D57: semantic decontamination flags exactly the planted eval copies") {
    val out = graft.SparkEntry.queries("emb_decontaminate")(spark, sf).collect()
    assert(out.nonEmpty)
    val (planted, organic) = out.partition(_.getAs[Boolean]("is_planted"))
    assert(planted.nonEmpty, "the entry must plant eval copies")
    planted.foreach { r =>
      assert(r.getAs[Boolean]("flagged") && r.getAs[Long]("n_close") >= 1L,
        s"planted copy ${r.getAs[Long]("vec_id")} must flag")
      assert(r.getAs[Double]("max_sim_q") >= 0.999999)
    }
    organic.foreach { r =>
      assert(!r.getAs[Boolean]("flagged"),
        s"organic vec ${r.getAs[Long]("vec_id")} flagged at " +
          s"${r.getAs[Double]("max_sim_q")} — noise should sit far below τ")
    }
  }

  test("D60: planted mislabels rank at the bottom of their wrong label") {
    import spark.implicits._
    // two tight orthogonal clusters + two vectors that geometrically
    // belong to A but carry label B — nearest-centroid confidence must
    // put the mislabels at B's bottom ranks
    def near(axis: Int, j: Int): Array[Float] = {
      val v = Array.fill(4)(0.001f * (j % 3 + 1))
      v(axis) = 1f; v
    }
    val rows =
      (0 until 20).map(j => (j.toLong, near(0, j), "A")) ++
        (100 until 120).map(j => (j.toLong, near(1, j), "B")) ++
        Seq((900L, near(0, 0), "B"), (901L, near(0, 1), "B"))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = graft.dedup.PipelineQueries.labelOutliers(df, k = 2).cache()
    val flagged = out.filter(col("is_outlier")).collect()
    assert(flagged.map(_.getAs[Long]("vec_id")).toSet.intersect(
      Set(900L, 901L)) === Set(900L, 901L),
      "both mislabeled vectors must flag as B-outliers")
    // every A vector is central to A: none flagged (k=2 forces exactly
    // two flags in A — check they score near 1 and the B mislabels don't)
    val aScores = out.filter(col("label") === "A")
      .agg(min("cos_q")).head().getDouble(0)
    assert(aScores > 0.99, s"A cluster should be tight, min cos $aScores")
    val misScores = out.filter(col("vec_id") >= 900L)
      .agg(max("cos_q")).head().getDouble(0)
    assert(misScores < 0.5, s"mislabels should score low vs B, max $misScores")
    out.unpersist()
  }

  test("D71: batch-hard triplets pick the true extremes; clustered data yields positive margins") {
    import spark.implicits._
    def near(axis: Int, j: Int): Array[Float] = {
      val v = Array.fill(4)(0.01f * (j % 5 + 1)); v(axis) = 1f; v
    }
    val df = ((0 until 10).map(j => (j.toLong, near(0, j), "A")) ++
      (100 until 110).map(j => (j.toLong, near(1, j), "B")))
      .toDF("vec_id", "embedding", "label")
    val anchors = df.filter(col("vec_id").isin(0L, 100L))
    val out = Ann.hardTriplets(df, anchors).collect()
    assert(out.length === 2)
    out.foreach { r =>
      // tight clusters, orthogonal classes: worst positive still beats
      // best negative
      assert(r.getAs[Long]("margin_q") > 0L,
        s"anchor ${r.getAs[Long]("q_id")} margin must be positive")
      assert(r.getAs[Double]("pos_sim") > 0.9)
      assert(r.getAs[Double]("neg_sim") < 0.3)
    }
    // exhaustive check for anchor 0: pos/neg are the argmin/argmax
    val a0 = out.find(_.getAs[Long]("q_id") == 0L).get
    val sims = df.filter(col("vec_id") =!= 0L).collect().map { r =>
      val v = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble)
      val q = near(0, 0).map(_.toDouble)
      val dot = q.zip(v).map { case (a, b) => a * b }.sum
      val c = dot / (math.sqrt(q.map(x => x * x).sum) *
        math.sqrt(v.map(x => x * x).sum))
      (r.getAs[Long]("vec_id"), r.getAs[String]("label"),
        math.rint(c * 1e6) / 1e6)
    }
    val hardestPos = sims.filter(_._2 == "A")
      .minBy { case (id, _, c) => (c, id) }._1
    val hardestNeg = sims.filter(_._2 == "B")
      .minBy { case (id, _, c) => (-c, id) }._1
    assert(a0.getAs[Long]("pos_id") === hardestPos)
    assert(a0.getAs[Long]("neg_id") === hardestNeg)
  }

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

  test("D5: cosine of a zero-norm vector is 0.0 and ranks last, never NaN-first") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val queries = Seq((10L, Seq(1.0f, 0.05f), 0)).toDF("vec_id", "embedding", "label")
    val res = Ann.bruteForceTopK(corpus, queries, 3).collect()
    val zeroRow = res.find(_.getAs[Long]("vec_id") == 3L).get
    assert(zeroRow.getAs[Double]("cos_sim") === 0.0,
      "zero-norm must score 0.0, not NaN (Spark sorts NaN above every double)")
    assert(zeroRow.getAs[Int]("rnk") === 3, "zero vector must rank last")
  }

  test("D5: label-block cap bounds quadratic work on a skewed label") {
    import spark.implicits._
    val skewed = (0 until 60).map(i => (i.toLong, Seq(1.0f, i.toFloat / 100f), 0))
      .toDF("vec_id", "embedding", "label")
    val capped = Ann.cosineNearDupPairs(skewed, -1.0, maxBlock = 10)
    assert(capped.count() === 45L, "a capped block pairs at most C(maxBlock,2)")
    val full = Ann.cosineNearDupPairs(skewed, -1.0, maxBlock = Int.MaxValue)
    assert(full.count() === (60L * 59L) / 2L)
    // the default cap is far above every label block at test scale:
    // capped and uncapped agree on the real corpus
    val defCap = Ann.cosineNearDupPairs(emb, 0.30)
    val unCap = Ann.cosineNearDupPairs(emb, 0.30, maxBlock = Int.MaxValue)
    assert(defCap.exceptAll(unCap).count() === 0)
    assert(unCap.exceptAll(defCap).count() === 0)
  }

  test("D7/IVF: broadcastQueries=false equals the broadcast path and plans no query-side broadcast") {
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable size-based auto-broadcast so any BroadcastExchange in
      // the plan can only come from a forced hint
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val lshS = Ann.lshTopK(emb, queries, 10, broadcastQueries = false)
      assert(!lshS.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
        "the shuffle variant must not broadcast the query side")
      val lshB = Ann.lshTopK(emb, queries, 10)
      assert(lshB.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
        "the bounded-query variant force-broadcasts")
      assert(lshS.exceptAll(lshB).count() === 0)
      assert(lshB.exceptAll(lshS).count() === 0)
      val ivfS = Ivf.topK(emb, queries, 10, cacheKey = sf, broadcastQueries = false)
      assert(!ivfS.queryExecution.executedPlan.toString.contains("BroadcastExchange"))
      val ivfB = Ivf.topK(emb, queries, 10, cacheKey = sf)
      assert(ivfS.exceptAll(ivfB).count() === 0)
      assert(ivfB.exceptAll(ivfS).count() === 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("D7: candidate dedup shuffles scores, not embedding arrays") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val res = Ann.lshTopK(emb, queries, 10)
    // the (q_id, vec_id) dedup aggregate must sit on a projection that
    // already computed cos_sim — shuffling the two embedding arrays per
    // candidate row is a ~12 KB/row bandwidth amplifier at dim 768
    val aggs = res.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty)
    val dedup = aggs.minBy(_.child.output.length)
    val names = dedup.child.output.map(_.name)
    assert(names.forall(n => !n.toLowerCase.contains("emb")),
      s"dedup input must carry scores only, got: ${names.mkString(", ")}")
  }

  test("D7/D7-alt: coverage entries carry self-verified recall columns within bounds") {
    // the entries' own outputs must carry the evidence (VERDICT r4 #1):
    // per-row exact-set membership, per-query recall@10, corpus min/mean
    for ((entry, meanFloor) <- Seq(graft.dedup.PipelineQueries.annLsh -> 0.1,
                                   graft.dedup.PipelineQueries.annIvf -> 0.4,
                                   graft.dedup.PipelineQueries.annBinaryHamming -> 0.1)) {
      val out = entry.fn(spark, sf).cache()
      val row = out.select("min_recall", "mean_recall", "top1_recall").head()
      val (mn, mean, top1) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      info(s"${entry.name}: min_recall=$mn mean_recall=$mean top1_recall=$top1")
      // the planted cosine-1.0 neighbor must be found; the noise tail
      // (exact top-10 of an isotropic corpus, cos ≈ 0.3) honestly bounds
      // the overall recall@10 much lower
      assert(top1 >= 0.9, s"${entry.name} top-1 recall vs exact baseline: $top1")
      assert(mean >= meanFloor, s"${entry.name} mean recall@10 vs exact baseline: $mean")
      assert(mn >= 0.0 && mn <= mean && mean <= 1.0)
      // per-query recall must agree with the per-row membership flags
      val bad = out.groupBy("q_id", "recall_at_k")
        .agg((sum(when(col("in_exact_topk"), 1L).otherwise(0L)) / 10.0).as("recomputed"))
        .filter(abs(col("recall_at_k") - col("recomputed")) > 1e-9)
      assert(bad.count() === 0)
      out.unpersist()
    }
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

  test("D36: hard negatives exclude the anchor's label and dominate the excluded tail") {
    val emb = graft.Tables.embeddings(spark, sf)
    val anchors = emb.filter(col("vec_id") % 100 === 0).cache()
    val k = 5
    val res = Ann.hardNegativeTopK(emb, anchors, k).cache()
    // exactly k ranked negatives per anchor, none sharing its label
    val nAnchors = anchors.count()
    assert(res.count() === nAnchors * k)
    val sameLabel = res
      .join(emb.select(col("vec_id"), col("label").as("neg_check")), "vec_id")
      .join(anchors.select(col("vec_id").as("q_id"), col("label").as("q_label")),
        "q_id")
      .filter(col("neg_check") === col("q_label") ||
        col("neg_label") =!= col("neg_check"))
    assert(sameLabel.count() === 0)
    // minimality: each anchor's k-th negative is ≥ every cross-label
    // vector NOT in its top-k (spot-check via the full exact ranking)
    val kth = res.filter(col("rnk") === k)
      .select(col("q_id"), col("cos_sim").as("kth_cos"))
    val all = Ann.hardNegativeTopK(emb, anchors, Int.MaxValue)
      .join(kth, "q_id")
    val violations = all.filter(col("rnk") > k && col("cos_sim") > col("kth_cos"))
    assert(violations.count() === 0)
    res.unpersist(); anchors.unpersist()
  }

  test("D77: sign-word packing and Hamming distance obey their laws") {
    import spark.implicits._
    // hand vectors, dim 64: all-positive, all-negative, one mixed
    val pos = Array.fill(64)(1.0f)
    val neg = Array.fill(64)(-1.0f)
    val mixed = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val df = Seq((1L, pos), (2L, neg), (3L, mixed))
      .toDF("vec_id", "embedding")
      .withColumn("words",
        BinarySketch.signWords(col("embedding").cast("array<double>"), 64))
    val words = df.select("vec_id", "words").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(words(1L) === Seq(-1L), "64 one-bits = all-ones word")
    assert(words(2L) === Seq(0L), "all-negative packs to zero")
    // Horner MSB-first: alternating +/- starting positive = 0xAAAA...
    assert(words(3L) === Seq(java.lang.Long.parseUnsignedLong(
      "aaaaaaaaaaaaaaaa", 16)))
    val d = df.as("a").crossJoin(df.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        BinarySketch.hamming(col("a.words"), col("b.words")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(d((1L, 1L)) === 0L && d((2L, 2L)) === 0L, "identity")
    assert(d((1L, 2L)) === 64L, "opposite signs differ in every bit")
    assert(d((1L, 3L)) === 32L && d((2L, 3L)) === 32L)
    assert(d((1L, 3L)) === d((3L, 1L)), "symmetry")
  }

  test("D77: Hamming window input carries codes/distances, never embeddings") {
    val emb64 = Tables.embeddings(spark, sf)
    val q = emb64.filter(col("vec_id") % 100 === 0)
    val res = BinarySketch.topK(emb64, q, 10, dim = 64)
    // the Hamming top-R window must sort (q_id, vec_id, ham) rows only
    val windows = res.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    val hamWindow = windows.find(w =>
      w.child.output.exists(_.name == "ham") &&
        !w.child.output.exists(_.name == "cos_sim")).get
    val inCols = hamWindow.child.output.map(_.name.toLowerCase)
    assert(!inCols.exists(_.contains("emb")),
      s"Hamming rank input must be distance-only, got: ${inCols.mkString(",")}")
  }

  test("D101: nprobe curve — recall monotone in probe width, exact at full probe") {
    val rows = graft.dedup.PipelineQueries.annNprobeCurve.fn(spark, sf)
      .collect().sortBy(_.getAs[Int]("nprobe"))
    assert(rows.map(_.getAs[Int]("nprobe")).toSeq == Seq(1, 2, 4, 8, 16))
    val recalls = rows.map(_.getAs[Long]("recall_at10_q4"))
    recalls.sliding(2).foreach { w =>
      assert(w(1) >= w(0), "recall@10 must be non-decreasing in nprobe")
    }
    // probing every cell degenerates to brute force: recall exactly 1
    assert(recalls.last == 10000L)
    assert(rows.last.getAs[Long]("top1_recall_q4") == 10000L)
    // cost accounting: the fraction column is exactly nprobe/cells
    rows.foreach { r =>
      assert(r.getAs[Long]("cells_fraction_ppm") ==
        r.getAs[Int]("nprobe").toLong * 1000000L / 16)
    }
  }
}
