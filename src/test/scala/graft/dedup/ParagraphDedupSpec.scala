package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D93 — paragraph-level dedup + reassembly laws. */
class ParagraphDedupSpec extends SparkSpec {

  private lazy val out =
    ParagraphDedup.textParagraphDedup.fn(spark, sf).cache()

  test("segments tile the document: unchanged docs rebuild to their canonical text") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(graft.functions.Text.canonical(col("text")).cast("binary")).as("canon_hash"))
    val joined = out.join(docs, "doc_id")
      .select($"doc_id", $"changed", ($"rebuilt_hash" === $"canon_hash").as("same"))
      .collect()
    assert(joined.nonEmpty)
    // a doc with no dropped segments must rebuild bit-for-bit: the
    // disjoint 10-word tiles rejoined with spaces ARE the canonical text
    joined.filter(!_.getBoolean(1)).foreach(r => assert(r.getBoolean(2), s"doc ${r.getLong(0)}"))
    // and a changed doc must NOT equal its original
    joined.filter(_.getBoolean(1)).foreach(r => assert(!r.getBoolean(2), s"doc ${r.getLong(0)}"))
  }

  test("hand corpus: the globally first copy of a shared segment survives, later copies drop") {
    import spark.implicits._
    val a = (1 to 10).map(i => s"alpha$i").mkString(" ")   // doc 1 seg 0
    val b = (1 to 10).map(i => s"beta$i").mkString(" ")    // shared segment
    val c = (1 to 10).map(i => s"gamma$i").mkString(" ")   // doc 2 unique
    val corpus = Seq(
      (1L, s"$a $b", "en", "s1", 1L),
      (2L, s"$b $c", "en", "s2", 1L), // its copy of b must drop
      (3L, c, "en", "s3", 1L))        // c already taken by doc 2
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("paradedup").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = ParagraphDedup.textParagraphDedup.fn(spark, dir)
      .select("doc_id", "n_segs", "n_kept", "changed").as[(Long, Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(r(0) == ((1L, 2L, 2L, false))) // doc 1 keeps both (first occurrences)
    assert(r(1) == ((2L, 2L, 1L, true)))  // b dropped, c kept
    assert(r(2) == ((3L, 1L, 0L, true)))  // fully-boilerplate doc empties
  }

  test("D96: boilerplate strips from EVERY document, unique segments all survive") {
    import spark.implicits._
    val a = (1 to 10).map(i => s"alpha$i").mkString(" ")
    val b = (1 to 10).map(i => s"banner$i").mkString(" ") // in all 3 docs
    val c = (1 to 10).map(i => s"gamma$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$b $a", "en", "s1", 1L),
      (2L, s"$b $c", "en", "s2", 1L),
      (3L, b, "en", "s3", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("boilstrip").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = ParagraphDedup.textBoilerplateStrip.fn(spark, dir)
      .select("doc_id", "n_segs", "n_kept").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    // the banner drops everywhere — even from doc 1, where D93 keeps it
    assert(r(0) == ((1L, 2L, 1L)))
    assert(r(1) == ((2L, 2L, 1L)))
    assert(r(2) == ((3L, 1L, 0L)))
    val d93 = ParagraphDedup.textParagraphDedup.fn(spark, dir)
      .select("doc_id", "n_kept").as[(Long, Long)].collect().sortBy(_._1)
    assert(d93(0)._2 == 2L) // D93's first-wins contrast: doc 1 keeps the banner
  }

  test("the keeper decision is a partial-aggregable min, never a window (skew algebra)") {
    val plan = ParagraphDedup.textParagraphDedup.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"),
      "a hot boilerplate segment must reduce map-side, not funnel a window task")
    assert(plan.contains("partial_min") || plan.contains("ObjectHashAggregate"),
      s"expected a two-phase min aggregate in:\n$plan")
  }

  test("the segment subtree executes ONCE: AQE reuses the shared h-exchange at runtime") {
    // both keeper-agg and join-back consume the same repartition(h)
    // subtree with identical pruned schemas (seg rides inside the
    // min-struct precisely so the schemas match); after execution the
    // final adaptive plan must show the reuse
    val df = ParagraphDedup.textParagraphDedup.fn(spark, sf)
    df.count() // materialize so AQE finalizes stages
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange") ||
      finalPlan.contains("ReusedQueryStage"),
      s"expected runtime exchange reuse in:\n$finalPlan")
  }

  test("kept segments are globally distinct and conservation holds") {
    val agg = out.agg(
      sum("n_segs").as("segs"), sum("n_kept").as("kept")).collect()(0)
    assert(agg.getLong(1) <= agg.getLong(0))
    // distinct segment hashes across the corpus == total kept segments
    val distinctSegs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.Text.words(col("text")).as("ws"))
      .withColumn("n_segs", lit(1L) + floor((size(col("ws")).cast("long") - 1) / 10).cast("long"))
      .select(col("ws"), explode(sequence(lit(0L), col("n_segs") - 1)).as("si"))
      .select(md5(array_join(slice(col("ws"), (col("si") * 10 + 1).cast("int"), lit(10)), " ")
        .cast("binary")).as("h"))
      .distinct().count()
    assert(agg.getLong(1) == distinctSegs)
  }
}
