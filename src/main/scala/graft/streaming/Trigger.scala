package graft.streaming

import graft.etl.ZipEtl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger => SSTrigger}

/** E8/S6/IO5: event-driven trigger → pipeline run. The reference wakes
  * a BackgroundService on a service-bus message and processes one CSV
  * (`ServiceBusWorker.cs:47-160`); Spark-natively the trigger IS the
  * arrival of the data: a streaming source (file drop, or a Kafka-shaped
  * message bus — the production analogue of the reference's Service Bus
  * subscription) feeds foreachBatch, which runs the same batch pipeline
  * transforms — exactly-once via checkpointed source tracking (the
  * ledger role the reference builds by hand).
  */
object FileTrigger {

  /** The per-micro-batch pipeline, shared by every source shape:
    * dedup → enrich → append. */
  private def runBatch(outDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val enriched = ZipEtl.enrich(ZipEtl.dedupeLastWins(batch))
      .withColumn("last_modified", lit(ZipEtl.runDate).cast("date"))
      .withColumn("batch_id", lit(batchId))
    enriched.write.mode("append").parquet(outDir)
  }

  /** Wire any typed incoming stream to the checkpointed foreachBatch
    * pipeline. AvailableNow makes it testable batch-style and is the
    * drain-the-backlog trigger in production. */
  def attach(incoming: DataFrame, outDir: String,
      checkpointDir: String): StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(SSTrigger.AvailableNow())
      .foreachBatch(runBatch(outDir) _)
      .start()

  /** Start a file-watch stream that runs dedup→enrich on every new CSV
    * dropped in watchDir and appends the enriched batch to outDir —
    * exactly-once per file via checkpointed file tracking. */
  def start(spark: SparkSession, watchDir: String, outDir: String,
      checkpointDir: String): StreamingQuery = {
    val incoming = spark.readStream
      .schema(ZipEtl.schema)
      .option("header", "true")
      .csv(watchDir)
    attach(incoming, outDir, checkpointDir)
  }

  /** Kafka wire format (key/value binary + topic/partition/offset) →
    * typed rows, one CSV-line payload per message. Factored off
    * [[startKafka]] so the decode is testable without a broker. */
  def decodeKafka(raw: DataFrame): DataFrame =
    raw.select(from_csv(col("value").cast("string"), ZipEtl.schema,
      Map.empty[String, String]).as("r"))
      .select(col("r.*"))

  /** E8c/S7: CDC-style streaming upsert — each micro-batch lands
    * transactionally in a JDBC table keyed by `keyCols`
    * ([[graft.etl.JdbcSink.upsert]]), so the table always holds the
    * latest value per key and replays are idempotent (checkpointed
    * source offsets + key-idempotent sink = effective exactly-once).
    *
    * With `dedupWithinWatermark` the stream first drops re-occurrences
    * of a key seen within the watermark horizon
    * (`dropDuplicatesWithinWatermark` — state is BOUNDED by the
    * watermark, unlike `dropDuplicates` whose state grows with every
    * distinct key forever; the watermark is required on `incoming`).
    * In-batch duplicates are collapsed last-write-wins by `orderCol`
    * before the upsert, honoring the sink's unique-key contract. */
  def attachJdbcUpsert(incoming: DataFrame, url: String, table: String,
      keyCols: Seq[String], orderCol: String, checkpointDir: String,
      dedupWithinWatermark: Boolean = false): StreamingQuery = {
    val deduped =
      if (dedupWithinWatermark) incoming.dropDuplicatesWithinWatermark(keyCols)
      else incoming
    deduped.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(SSTrigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          .orderBy(col(orderCol).desc)
        val lastWins = batch
          .withColumn("graft_rn", row_number().over(w))
          .filter(col("graft_rn") === 1)
          .drop("graft_rn")
        graft.etl.JdbcSink.upsert(lastWins, url, table, keyCols)
      }
      .start()
  }

  /** E16: dead-letter split — wire a RAW payload stream (one CSV line
    * per `value`, the kafka-wire shape) to the pipeline with a
    * quarantine sink: rows whose decode misses the contract (null key
    * fields after PERMISSIVE from_csv) land in `dlqDir` AS DATA — raw
    * payload preserved byte-for-byte, reason, batch id — while good
    * rows run the normal dedup→enrich append. IO11's errors-are-data
    * rule at the stream level, and the reference's per-record Error
    * state instead of failing the run: one bad upstream byte must not
    * kill the consumer, and must stay replayable from quarantine.
    * The decoded batch is cached for its two sink scans and
    * unpersisted before the batch commits. */
  def attachWithDeadLetter(raw: DataFrame, outDir: String, dlqDir: String,
      checkpointDir: String): StreamingQuery =
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(SSTrigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val decoded = batch.withColumn("r",
          from_csv(col("value").cast("string"), ZipEtl.schema,
            Map.empty[String, String])).persist()
        try {
          decoded
            .filter(col("r.zipcode").isNull || col("r.state").isNull)
            .select(col("value").cast("string").as("raw_payload"),
              lit("decode_contract_violation").as("reason"),
              lit(batchId).as("batch_id"))
            .write.mode("append").parquet(dlqDir)
          runBatch(outDir)(
            decoded.filter(col("r.zipcode").isNotNull && col("r.state").isNotNull)
              .select(col("r.*")),
            batchId)
        } finally decoded.unpersist()
      }
      .start()

  /** E8 production shape: the same pipeline fed from a Kafka(-protocol)
    * topic — one message per record, offsets checkpointed for
    * exactly-once, matching the reference's Service Bus subscription
    * (`ServiceBusWorker.cs:47-75`). Requires the spark-sql-kafka
    * connector on the classpath (not present in this sandbox — the
    * decode and pipeline halves are covered by spec through [[attach]];
    * only the broker handshake itself is untested here). */
  def startKafka(spark: SparkSession, bootstrapServers: String,
      topic: String, outDir: String, checkpointDir: String): StreamingQuery = {
    val raw = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      // bound each micro-batch so one pathological backlog drain can't
      // build a single giant batch at scale
      .option("maxOffsetsPerTrigger", "10000000")
      .load()
    attach(decodeKafka(raw), outDir, checkpointDir)
  }
}
