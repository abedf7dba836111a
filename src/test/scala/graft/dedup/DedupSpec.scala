package graft.dedup

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** Specs for the dedup block D1-D4 (SURVEY.md §2.4): recall on planted
  * near-duplicates, precision of the verification pass, bucket-cap
  * behavior. */
class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val planted = Dedup.withPlantedDups(docs).cache()
  private lazy val plantedPairs = docs.filter(col("doc_id") % 50 === 0)
    .select(col("doc_id").as("doc_a"), (col("doc_id") + 1000000L).as("doc_b"))

  test("D1: exact dedup groups verbatim duplicates and keeps min doc_id") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "The quick brown fox"),
      (2L, "the quick  brown FOX!"), // same canonical form
      (3L, "something else entirely")).toDF("doc_id", "text")
    val out = Dedup.exactDedup(corpus).collect()
    assert(out.length === 2)
    val dupGroup = out.find(_.getAs[Long]("n_docs") == 2L).get
    assert(dupGroup.getAs[Long]("keeper_doc_id") === 1L)
  }

  test("D2: MinHash+LSH finds every planted near-duplicate pair") {
    val cands = Dedup.minhashLshCandidates(planted)
    val found = plantedPairs.join(cands, Seq("doc_a", "doc_b"), "left_semi").count()
    val expected = plantedPairs.count()
    assert(expected > 0)
    assert(found === expected,
      s"LSH recall on planted dups: $found/$expected")
  }

  test("D2: LSH produces no self-pairs and respects doc_a < doc_b") {
    val cands = Dedup.minhashLshCandidates(planted).cache()
    assert(cands.filter(col("doc_a") >= col("doc_b")).count() === 0)
    cands.unpersist()
  }

  test("D3: SimHash finds every planted exact duplicate at hamming 0") {
    val exactPlanted = Dedup.withPlantedExactDups(docs)
    val exactPairs = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 2000000L).as("doc_b"))
    val cands = Dedup.simhashCandidates(exactPlanted).cache()
    val found = exactPairs.join(cands, Seq("doc_a", "doc_b"), "left_semi").count()
    val expected = exactPairs.count()
    assert(expected > 0)
    assert(found === expected, s"SimHash recall on exact dups: $found/$expected")
    // identical text ⇒ hamming 0 for the planted pairs
    val nonZero = exactPairs.join(cands, Seq("doc_a", "doc_b"))
      .filter(col("hamming") =!= 0).count()
    assert(nonZero === 0)
    cands.unpersist()
  }

  test("D4: Jaccard verification scores planted pairs high and is confined to candidates") {
    val cands = Dedup.minhashLshCandidates(planted)
    val verified = Dedup.jaccardVerify(cands, planted, threshold = 0.5).cache()
    val found = plantedPairs.join(verified, Seq("doc_a", "doc_b"), "left_semi").count()
    assert(found === plantedPairs.count())
    // verification can only shrink the candidate set
    assert(verified.count() <= cands.count())
    val badJ = verified.filter(col("jaccard") < 0.5 || col("jaccard") > 1.0).count()
    assert(badJ === 0)
    verified.unpersist()
  }

  test("D2/D3/D4/pipeline coverage entries carry self-verified planted evidence") {
    // the rows-only entries' own outputs must carry their recall
    // evidence (VERDICT r4 #3), not just the specs
    for (entry <- Seq(PipelineQueries.dedupMinhashLsh,
                      PipelineQueries.dedupSimhash,
                      PipelineQueries.dedupNgramJaccard)) {
      val row = entry.fn(spark, sf)
        .select("planted_found", "planted_expected", "planted_recall").head()
      assert(row.getLong(1) > 0, s"${entry.name}: no planted positives in corpus")
      assert(row.getDouble(2) === 1.0,
        s"${entry.name} planted recall: ${row.getLong(0)}/${row.getLong(1)}")
    }
    val p = PipelineQueries.dedupPipelineQ.fn(spark, sf)
      .select("n_in", "n_out", "planted_expected", "planted_kept", "planted_dropped")
      .head()
    assert(p.getLong(3) === 0L, "every planted near-dup must lose to its original")
    assert(p.getLong(4) === p.getLong(2))
    assert(p.getLong(1) < p.getLong(0))
  }

  test("skew stress entry: valves engage and the hot quadratic block is refused") {
    val r = PipelineQueries.dedupSkewStress.fn(spark, sf).head()
    assert(r.getAs[Long]("capped_buckets") >= 16L,
      "every band bucket of the hot text must trip the cap")
    assert(r.getAs[Long]("max_bucket") >= 5001L)
    assert(r.getAs[Long]("hot_pairs") === 0L,
      "no candidate pair may touch the capped hot copies")
    assert(r.getAs[Long]("salted_join_rows") === r.getAs[Long]("n_corpus"),
      "salted join must match each corpus row to its hash group exactly once")
  }

  test("D20: broadcast-bench variant equals the equi-join path and never shuffle-joins the corpus grams") {
    val isBench: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      id => id % 100 === 0
    // identical flag set, both gram modes
    for (hashed <- Seq(true, false)) {
      val a = Decontaminate.flagged(planted, isBench, hashGrams = hashed)
      val b = Decontaminate.flaggedBroadcastBench(planted, isBench, hashGrams = hashed)
      assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0,
        s"broadcast-bench variant diverges (hashGrams=$hashed)")
    }
    // plan contract (VERDICT r4 #6): with size-based auto-broadcast off,
    // every join is still a forced broadcast — the corpus gram side is
    // never shuffled for a join. The deliberate Spread repartitions
    // (REPARTITION_BY_NUM) aside, the only requirement-driven exchanges
    // are the tiny bench-side gram distinct and the df valve over the
    // bench-touched subset; the per-doc and final distincts reuse the
    // doc_id partitioning that survives the broadcast joins.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Decontaminate.flaggedBroadcastBench(planted, isBench)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"corpus gram side must broadcast-join:\n$plan")
      // 3 = the valve agg over the touched subset + the tiny bench-side
      // gram distinct, which appears twice because the touched subtree
      // is expanded per consumer; none of them shuffles raw corpus grams
      val ensures = "ENSURE_REQUIREMENTS".r.findAllIn(plan).size
      assert(ensures <= 3,
        s"expected ≤3 requirement-driven exchanges (valve agg + 2× bench gram distinct), got $ensures:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("D20: the gram explode executes once — join-back reuses the aggregate's exchange") {
    // r5 verdict item 1: nothing used to guarantee the explode→distinct
    // gram subtree ran once across the valve aggregate and the
    // join-back. The REPARTITION_BY_COL pin in Decontaminate.flagged
    // makes both consumers share one exchange; assert it on the FINAL
    // adaptive plan (the initial-plan section reprints subtrees).
    // Deliberately UNCACHED input — the bench/production entry shape:
    // a cached input wraps each branch in its own TableCacheQueryStage,
    // whose canonical forms differ, and AQE stage reuse stops matching
    // anything above them. The corpus is SYNTHETIC (spark.range), not
    // the documents table: the cache manager substitutes any cached
    // sameResult SUBTREE into new plans, and other suites in the shared
    // session cache the documents scan — which would silently
    // re-introduce the cache stages this test exists to keep out.
    val corpus = spark.range(0, 400).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit(s"word$j "), (col("id") + j) % 7)): _*).as("text"))
    for (hashed <- Seq(true, false)) {
      val df = Decontaminate.flagged(corpus,
        id => id % 100 === 0, hashGrams = hashed)
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val generates = "Generate explode".r.findAllIn(finalPlan).size
      assert(generates === 1,
        s"gram explode must execute once (hashGrams=$hashed), got $generates:\n$finalPlan")
      assert(finalPlan.contains("ReusedExchange"),
        s"join-back must reuse the gram exchange (hashGrams=$hashed):\n$finalPlan")
    }
  }

  test("D45: bloom-cut decontamination equals the exact paths and probes below the joins") {
    val isBench: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      id => id % 100 === 0
    // identical flag set, both gram modes (bloom FPs must all die at
    // the exact join-back)
    for (hashed <- Seq(true, false)) {
      val a = Decontaminate.flagged(planted, isBench, hashGrams = hashed)
      val b = Decontaminate.flaggedBloomBench(planted, isBench, hashGrams = hashed)
      assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0,
        s"bloom-cut variant diverges (hashGrams=$hashed)")
    }
    // the probe must sit in a Filter, i.e. map-side BELOW any join
    val plan = Decontaminate.flaggedBloomBench(planted, isBench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_might_contain"),
      s"expected the bloom probe in the plan:\n$plan")
    assert("Filter [^\\n]*graft_might_contain".r.findFirstIn(plan).isDefined,
      s"the probe must be a Filter, not join machinery:\n$plan")
  }

  test("D20: decontamination flags every guaranteed bench-overlap doc") {
    import spark.implicits._
    val flagged = Decontaminate.flagged(planted, id => id % 100 === 0)
      .collect().map(_.getLong(0)).toSet
    // guaranteed positives: a bench original (id % 100 == 0) and its
    // planted near-copy share long runs of 5-grams — both directions
    // must be flagged. (The word-salad corpus also produces NATURAL
    // cross-doc 5-gram overlaps — those are real contamination by the
    // operator's definition, and the oracle pins the exact set.)
    val benchOriginals = planted.filter(col("doc_id") % 100 === 0 &&
      col("doc_id") < 1000000L).select("doc_id")
      .collect().map(_.getLong(0))
    assert(benchOriginals.nonEmpty)
    benchOriginals.foreach { id =>
      assert(flagged.contains(id + 1000000L),
        s"planted copy of bench doc $id must be flagged")
      assert(flagged.contains(id),
        s"bench original $id must be flagged via its planted bench copy")
    }
    // the production (hashed-gram) mode flags the identical doc set —
    // the shuffles just carry 8-byte hashes instead of gram strings
    val hashed = Decontaminate.flagged(planted, id => id % 100 === 0,
      hashGrams = true).collect().map(_.getLong(0)).toSet
    val strings = Decontaminate.flagged(planted, id => id % 100 === 0,
      hashGrams = false).collect().map(_.getLong(0)).toSet
    assert(hashed === strings, "hashed and string gram modes must agree")
    // the frequency valve kills boilerplate grams: a gram present in
    // 150 docs (one of them "bench") flags nobody
    val boiler = (0 until 150).map(i =>
      (i.toLong * 100, "the exact same boilerplate sentence repeated verbatim here"))
      .toDF("doc_id", "text")
    assert(Decontaminate.flagged(boiler, id => id % 200 === 0).count() === 0)
  }

  test("D34: incremental probe finds every planted near-dup, flags no fresh doc, and broadcasts the batch") {
    val out = graft.SparkEntry.queries("dedup_incremental")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val r = rows.head
    assert(r.getAs[Double]("planted_recall") === 1.0,
      "every planted near-dup of a corpus doc must be found by the index probe")
    assert(r.getAs[Long]("fresh_hits") === 0L,
      "md5-word fresh docs cannot shingle-match the corpus")
    // plan contract: the new batch side is broadcast — the stored
    // corpus index is never reshuffled for the probe join (the final
    // distinct on the small pair set is the only exchange allowed)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"index probe must be a broadcast hash join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the corpus index must not be shuffled for the probe:\n$plan")
  }

  test("D2/D3: oversized buckets are dropped (skew cap)") {
    import spark.implicits._
    // 150 identical docs → one bucket of 150 > MaxBucket → no pairs
    val degenerate = (0 until 150).map(i => (i.toLong, "same text for everyone here"))
      .toDF("doc_id", "text")
    assert(Dedup.minhashLshCandidates(degenerate).count() === 0)
    assert(Dedup.simhashCandidates(degenerate).count() === 0)
  }
}
