package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D52 — inverted index: exact postings on a hand-built corpus, the
  * posting cap engaging without corrupting df/tf, and the
  * one-exchange plan property (window + groupBy + top-k all ride the
  * single term clustering). */
class InvertedIndexSpec extends SparkSpec {

  private def tiny = {
    import spark.implicits._
    Seq((1L, "alpha beta alpha"), (2L, "beta gamma")).toDF("doc_id", "text")
  }

  test("D52: exact postings, df and tf on a known corpus") {
    val out = InvertedIndex.build(tiny).collect()
      .map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("df"), r.getAs[Long]("tf_total"),
          r.getAs[Seq[Long]]("postings"), r.getAs[Boolean]("truncated")))
      .toMap
    val B = InvertedIndex.PosBase
    assert(out("alpha") === ((1L, 2L, Seq(1L * B, 1L * B + 2), false)))
    assert(out("beta") === ((2L, 2L, Seq(1L * B + 1, 2L * B), false)))
    assert(out("gamma") === ((1L, 1L, Seq(2L * B + 1), false)))
  }

  test("D52: the cap bounds postings but never df/tf_total") {
    import spark.implicits._
    val docs = Seq((1L, ("rep " * 80).trim), (2L, "rep once"))
      .toDF("doc_id", "text")
    val out = InvertedIndex.build(docs, cap = 5).collect()
      .map(r => r.getAs[String]("term") -> r).toMap
    val rep = out("rep")
    assert(rep.getAs[Long]("df") === 2L)
    assert(rep.getAs[Long]("tf_total") === 81L)
    assert(rep.getAs[Seq[Long]]("postings").length === 5)
    assert(rep.getAs[Boolean]("truncated"))
    // capped postings are the FIRST cap occurrences in (doc, pos) order
    assert(rep.getAs[Seq[Long]]("postings") ===
      (0 until 5).map(p => 1L * InvertedIndex.PosBase + p))
    assert(!out("once").getAs[Boolean]("truncated"))
  }

  test("D52: one term exchange for the whole build (windows + agg + top-k)") {
    val plan = InvertedIndex.textInvertedIndex.fn(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1,
      s"expected the single term-keyed exchange, got $exchanges:\n$plan")
    assert(!plan.contains("SinglePartition"))
  }

  test("D52: postings decode back to real (doc, pos) token occurrences") {
    val docs = graft.Tables.documents(spark, sf)
    val idx = InvertedIndex.build(docs)
      .filter(!col("truncated"))
      .orderBy(desc("df"), asc("term")).limit(5)
      .select(col("term"), explode(col("postings")).as("enc"))
      .select(col("term"),
        (col("enc") / InvertedIndex.PosBase).cast("long").as("doc_id"),
        (col("enc") % InvertedIndex.PosBase).as("pos"))
    val toks = docs.select(col("doc_id"),
        posexplode(graft.functions.Text.words(col("text"))).as(Seq("pos", "term")))
      .select("term", "doc_id", "pos")
    assert(idx.exceptAll(toks).count() === 0,
      "every decoded posting must be a real token occurrence")
  }

  test("D59: retrieval ranks are contiguous, score-ordered, and every hit is real") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val queries = Seq(1 -> "data", 1 -> "merge", 2 -> "window", 2 -> "join")
      .toDF("q_id", "term")
    val out = InvertedIndex.retrieve(docs, queries).cache()
    val rows = out.orderBy("q_id", "rank").collect()
    assert(rows.nonEmpty)
    // per query: ranks 1..n contiguous, scores non-increasing with rank
    rows.groupBy(_.getAs[Int]("q_id")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).toSeq
      assert(ranks === (1 to ranks.length))
      val scores = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("score_q"))
      assert(scores.sliding(2).forall(s => s.length < 2 || s(0) >= s(1)))
    }
    // every retrieved doc really contains >= n_terms_hit distinct query
    // terms (postings never invent occurrences)
    val words = docs.select(col("doc_id"),
      graft.functions.Text.words(col("text")).as("ws"))
    val checked = out.join(words, "doc_id")
      .join(queries.groupBy("q_id").agg(collect_set("term").as("qts")), "q_id")
      .withColumn("n_real",
        size(array_intersect(array_distinct(col("ws")), col("qts"))))
    assert(checked.filter(col("n_real") < col("n_terms_hit")).count() === 0)
    // the top-k rank filter must pre-prune map-side (shuffle O(q × k))
    val plan = InvertedIndex.retrieve(docs, queries)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rank <= k must plan a WindowGroupLimit")
    out.unpersist()
  }

  test("D59b: stored-index retrieval is result-identical to the " +
      "in-query path and reads ONLY the query terms' shards") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val queries = Seq(1L -> "data", 1L -> "merge", 2L -> "window",
      2L -> "join")
    val path = java.nio.file.Files
      .createTempDirectory("graft_invidx").toString
    InvertedIndex.writeIndex(docs, path)

    val stored = InvertedIndex.retrieveStored(spark, path, queries).cache()
    val direct = InvertedIndex.retrieve(docs, queries.toDF("q_id", "term"))
    assert(stored.exceptAll(direct).count() === 0 &&
      direct.exceptAll(stored).count() === 0,
      "stored-index scoring must equal the in-query formulation")

    // pruning, measured against the layout on disk (not just the
    // plan string): the files the pruned scan enumerates live in
    // probed-shard directories ONLY, and the fixture has strictly
    // more populated shards than the probe touches — so a full scan
    // could not pass this assert
    val probed = queries.map(q => InvertedIndex.shardOf(q._2)).distinct.toSet
    val readDirs = spark.read.parquet(s"$path/postings")
      .filter(col("term_shard").isin(probed.toSeq: _*))
      .select(input_file_name()).distinct().collect()
      .map(_.getString(0).replaceAll(".*term_shard=", "")
        .replaceAll("/.*", "")).toSet
    assert(readDirs.nonEmpty && readDirs.subsetOf(probed),
      s"scan read shards $readDirs outside the probed set $probed")
    val onDisk = new java.io.File(s"$path/postings").listFiles()
      .filter(_.getName.startsWith("term_shard=")).map(_.getName).toSet
    assert(onDisk.size > probed.size,
      s"fixture must have unprobed shards for this assert to bite: " +
        s"${onDisk.size} on disk vs ${probed.size} probed")
    stored.unpersist()
  }
}
