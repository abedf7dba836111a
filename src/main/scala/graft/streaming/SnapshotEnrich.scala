package graft.streaming

import graft.etl.Snapshots
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger => SSTrigger}

/** S19 — stream enrichment against a SLOWLY CHANGING dimension: the
  * dim is an IO14 snapshot table, and each micro-batch re-resolves the
  * CURRENT snapshot at plan time inside foreachBatch — so a dim update
  * committed between batches takes effect on the very next batch with
  * no stream restart. The static-DataFrame enrichment (S9) resolves
  * its dim ONCE at query start and serves stale rows until the stream
  * is bounced; this shape is how reference data actually changes under
  * a long-running stream.
  *
  * Per batch: one atomic manifest read (driver-side metadata), one
  * broadcast of the dim snapshot, and an idempotent S18 commit — the
  * whole loop is exactly-once end-to-end AND consistent per batch
  * (every row in a batch is enriched against the same snapshot,
  * because the manifest pointer resolves once per batch, not per
  * task). */
object SnapshotEnrich {

  /** Wire `incoming` (must carry the dim's join key) to an idempotent
    * sink, enriched per-batch against the CURRENT dim snapshot. */
  def attach(incoming: DataFrame, key: String, dimRoot: String,
      tableRoot: String, checkpointDir: String): StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(SSTrigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dim = Snapshots.read(batch.sparkSession, dimRoot)
        val enriched = batch.join(broadcast(dim), Seq(key), "left")
          .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
        ExactlyOnceSink.appendOnce(enriched, tableRoot, s"batch-$batchId")
        ()
      }
      .start()

  /** Convenience read-back of the enriched table. */
  def read(spark: org.apache.spark.sql.SparkSession,
      tableRoot: String): DataFrame =
    ExactlyOnceSink.read(spark, tableRoot).orderBy(col("batch_id"))
}
