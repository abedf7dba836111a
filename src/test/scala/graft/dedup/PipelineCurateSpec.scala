package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D30 composed curation: value-level correctness is fully
  * oracle-gated (pipeline_curate); here the ONE-SHUFFLE plan contract
  * and stage-composition parity. */
class PipelineCurateSpec extends SparkSpec {

  test("the whole curation flow pays exactly one data shuffle") {
    val df = graft.SparkEntry.queries("pipeline_curate")(spark, sf)
    val exchanges = df.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // allowed: Spread's explicit repartition + the output sort's range
    // partitioning; the only HASH exchange is the dedup window's
    val hash = exchanges.map(_.outputPartitioning.toString)
      .count(_.startsWith("hashpartitioning"))
    assert(hash === 1,
      s"quality filter and split must stay map-side — expected 1 hash " +
        s"exchange (the dedup window), got $hash:\n" +
        exchanges.map(_.outputPartitioning).mkString("\n"))
  }

  test("composition equals the stages run separately") {
    import graft.functions.{Splits, Text}
    val docs = graft.Tables.documents(spark, sf)
    val composed = graft.SparkEntry.queries("pipeline_curate")(spark, sf)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // stage by stage, independently
    val spreadDocs = docs
      .withColumn("canon", Text.canonical(col("text")))
      .withColumn("ws", split(col("canon"), " "))
    val comps = Text.qualityComponentsOn(col("text"), col("canon"), col("ws"))
    val scored = spreadDocs
      .select(col("doc_id"), col("canon"), Text.qualityScoreOn(comps.toMap).as("q"))
      .filter(col("q") >= 0.6).cache()
    val keepers = Dedup.exactDedup(scored.select(col("doc_id"),
        col("canon").as("text")))
      .select(col("keeper_doc_id").as("doc_id"))
    val expected = Splits.hashSplit(keepers, col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(composed === expected)
    assert(composed.nonEmpty && composed.size < docs.count())
  }
}
