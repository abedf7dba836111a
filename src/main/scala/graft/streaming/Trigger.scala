package graft.streaming

import graft.etl.ZipEtl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger => SSTrigger}

/** E8/S6/IO5: event-driven trigger → pipeline run. The reference wakes
  * a BackgroundService on a service-bus message and processes one CSV
  * (`ServiceBusWorker.cs:47-160`); Spark-natively the trigger IS the
  * arrival of the file: a streaming file source watches the drop
  * directory and foreachBatch runs the same batch pipeline transforms
  * on each newly arrived file — exactly-once per file via checkpointed
  * file tracking (the ledger role the reference builds by hand).
  */
object FileTrigger {

  /** Start a file-watch stream that runs dedup→enrich on every new CSV
    * dropped in watchDir and appends the enriched batch to outDir.
    * processAllAvailable/AvailableNow make it testable batch-style. */
  def start(spark: SparkSession, watchDir: String, outDir: String,
      checkpointDir: String): StreamingQuery = {
    val incoming = spark.readStream
      .schema(ZipEtl.schema)
      .option("header", "true")
      .csv(watchDir)
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(SSTrigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val enriched = ZipEtl.enrich(ZipEtl.dedupeLastWins(batch))
          .withColumn("last_modified", lit(ZipEtl.runDate).cast("date"))
          .withColumn("batch_id", lit(batchId))
        enriched.write.mode("append").parquet(outDir)
      }
      .start()
  }
}
