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
  *   → E5b/E8c transactional JDBC upsert sink (embedded Derby): the
  *     SAME snapshot streamed through foreachBatch → JdbcSink.upsert
  *     on the pipeline key, its own checkpoint — the key-idempotent
  *     leg of the deployment (r11 verdict item 4)
  *   → S30 listener metrics dumped as the observability record.
  *
  * `crash` mode `Runtime.halt(137)`s INSIDE the second FILE micro-
  * batch's commit window — after the sink's idempotent append, BEFORE
  * the checkpoint records the offset. `crashjdbc` mode lets the file
  * leg complete and halts inside the second JDBC micro-batch's window
  * — after the Derby transaction COMMITTED, before the offset commit,
  * so the restart MUST re-deliver a batch whose rows are already in
  * the table and the upsert's key-idempotence is what saves it. Both
  * are the worst-case crash points (the batch will be REPLAYED on
  * restart) and the driver-side equivalent of the L9 executor SIGKILL
  * drills: halt skips every shutdown hook, so nothing gets to clean
  * up. `run` mode completes the chain, dumps `out/metrics` (S30
  * frame) and prints `JDBCROWS <n>` then `DONE <sinkRows>` as its
  * last lines.
  *
  * Usage: graft.etl.DeploymentRehearsalChild <workRoot>
  *   <crash|crashjdbc|run>
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

    // E5b/E8c: the transactional JDBC leg — the same published
    // snapshot streamed into a key-idempotent Derby upsert with its
    // own checkpoint. The crashjdbc halt fires AFTER the JDBC commit
    // and BEFORE the offset commit: the worst-case window where the
    // restart must re-deliver an already-persisted batch.
    val url = s"jdbc:derby:$root/derbydb;create=true"
    val qj = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$table/$current")
      .writeStream
      .option("checkpointLocation", s"$root/ckpt_jdbc")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        JdbcSink.upsert(batch, url, "rehearsal_zip",
          keyCols = Seq("zipcode", "state_abbr"))
        if (mode == "crashjdbc" && id >= 1) Runtime.getRuntime.halt(137)
        ()
      }
      .start()
    qj.awaitTermination()

    metrics.frame(spark).write.mode("overwrite").parquet(s"$out/metrics")
    val jdbcRows = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "rehearsal_zip").load().count()
    val sinkRows = graft.streaming.ExactlyOnceSink.read(spark, sink).count()
    println(s"JDBCROWS $jdbcRows")
    println(s"DONE $sinkRows")
    spark.stop()
  }
}
