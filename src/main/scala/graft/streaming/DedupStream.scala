package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger => SSTrigger}

/** S22 — streaming ingest dedup against the STORED band index: the
  * continuous form of D34's incremental dedup. Each micro-batch:
  *
  *   1. probes the index with its own (broadcast) band keys — the
  *      corpus-scale index is never reshuffled, per-batch cost scales
  *      with the batch (the D34 contract, now paid per trigger);
  *   2. routes flagged near-dups to a quarantine sink AS DATA (doc id,
  *      the prior doc it collides with — the E16 errors-are-data rule:
  *      a duplicate is reviewable, not silently dropped);
  *   3. appends clean docs to the output sink AND appends their bands
  *      to the index — so batch N+1 dedupes against batch N without
  *      any rebuild (bucket sizes stay frozen per write, the D34
  *      valve semantics extended one write at a time).
  *
  * In-batch mutual near-dups are deliberately out of scope here (the
  * batch path D2/D19 owns corpus-wide candidate generation); this
  * operator answers "have we EVER ingested this before" at stream
  * cadence. */
object DedupStream {

  def attach(docs: DataFrame, indexPath: String, cleanDir: String,
      dupDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(SSTrigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val b = batch.persist()
        try {
          val hits = Dedup.probeBandIndex(s, indexPath, b)
            .groupBy("new_doc")
            .agg(min("dup_of").as("dup_of"))
          val flagged = b.join(hits,
            b("doc_id") === hits("new_doc"))
            .select(col("doc_id"), col("dup_of"))
          val clean = b.join(hits,
            b("doc_id") === hits("new_doc"), "left_anti")
          flagged.write.mode(SaveMode.Append).parquet(dupDir)
          clean.write.mode(SaveMode.Append).parquet(cleanDir)
          appendBandIndex(clean, indexPath)
        } finally { b.unpersist(); () }
      }
      .start()

  /** Append a (clean) batch's bands to the stored index. Bucket sizes
    * are counted within the appended write only — the index's
    * frozen-at-write valve semantics, extended per batch. */
  def appendBandIndex(docs: DataFrame, path: String): Unit = {
    val banded = Dedup.minhashSignatures(docs)
      .select(col("doc_id"), explode(Dedup.bandKeys(col("sig"))).as("band_key"))
    banded.withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band_key")))
      .write.mode(SaveMode.Append).parquet(path)
  }
}
