package graft.etl

import org.apache.spark.sql.functions._

/** Child JVM for the end-to-end DEPLOYMENT REHEARSAL (r10 verdict
  * item 6): every piece of the chain is gated alone elsewhere; this
  * main runs the COMPOSITION a real deployment chains —
  *
  *   E44 config-parsed pipeline (the JSON spec chooses the stages)
  *   → E14 observation on the publish job (rows + crc, zero extra scans)
  *   → IO14/IO23 snapshot-store CAS commit (idempotent on rerun:
  *     a crashed deployment's replay must not double-publish)
  *   → S18 exactly-once sink fed by a file stream over the published
  *     snapshot (maxFilesPerTrigger=1 → multiple micro-batches)
  *   → S30 listener metrics dumped as the observability record.
  *
  * `crash` mode `Runtime.halt(137)`s INSIDE the second micro-batch's
  * commit window — after the sink's idempotent append, BEFORE the
  * checkpoint records the offset. That is the worst-case crash point
  * (the batch will be REPLAYED on restart) and the driver-side
  * equivalent of the L9 executor SIGKILL drills: halt skips every
  * shutdown hook, so nothing gets to clean up. `run` mode completes
  * the chain, dumps `out/metrics` (S30 frame) and prints
  * `DONE <sinkRows>` as its last line.
  *
  * Usage: graft.etl.DeploymentRehearsalChild <workRoot> <crash|run>
  */
object DeploymentRehearsalChild {

  /** The E44 spec the rehearsal deploys — full five-stage pipeline. */
  def specJson: String =
    s"""{"input": "${ZipEtl.csvPath}",
        "stages": ["ingest", "dedupe", "enrich",
                   "exclude_processed", "upsert"]}"""

  def main(args: Array[String]): Unit = {
    val Array(root, mode) = args.take(2)
    val spark = graft.Sessions.withMaster("local[2]", "2")
    spark.sparkContext.setLogLevel("ERROR")
    val table = s"$root/table"
    val sink = s"$root/sink"
    val ckpt = s"$root/ckpt"
    val out = s"$root/out"

    // E44: configuration chooses the composed plan
    val result = PipelineConfig.runJson(spark, specJson)

    // IO23: CAS-commit the publish — skipped when a prior (crashed)
    // run already published, so replay is idempotent at the table too
    if (Snapshots.currentId(table).isEmpty) {
      val obs = org.apache.spark.sql.Observation()
      val observed = result.observe(obs,
        count(lit(1)).as("rows"),
        sum(crc32(concat_ws("|", result.columns.map(col): _*)))
          .as("crc"))
      // 4 hash-partitioned files -> 4 micro-batches downstream
      Snapshots.commitIf(observed.repartition(4, col("zipcode")),
        table, expectedCurrent = None)
      // E14: the publish job's own metrics, recorded as data
      val m = obs.get
      import spark.implicits._
      Seq((m("rows").asInstanceOf[Long], m("crc").asInstanceOf[Long]))
        .toDF("rows", "crc")
        .write.mode("overwrite").parquet(s"$out/observe")
    }
    val current = Snapshots.currentId(table).get

    // S30 observability for the stream leg
    val metrics = new graft.streaming.Metrics()
    spark.streams.addListener(metrics)

    // S18: file-stream the published snapshot into the idempotent sink
    val schema = spark.read.parquet(s"$table/$current").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$table/$current")
    val q = graft.streaming.ExactlyOnceSink.attach(src, sink, ckpt,
      postBatch = id =>
        if (mode == "crash" && id >= 1) Runtime.getRuntime.halt(137))
    q.awaitTermination()

    metrics.frame(spark).write.mode("overwrite").parquet(s"$out/metrics")
    val sinkRows = graft.streaming.ExactlyOnceSink.read(spark, sink).count()
    println(s"DONE $sinkRows")
    spark.stop()
  }
}
