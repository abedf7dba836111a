package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming state under load — the r8 verdict's item 2: the S-family
  * operators are correctness-gated at toy sizes (tens of rows through
  * MemoryStream); nothing ever measured the STATEFUL family with
  * millions of events flowing through RocksDB-backed state under an
  * advancing event-time watermark. This main replays a GenScale
  * corpus as a file-source stream (time-ordered staging, so the
  * watermark advances like a real ingest instead of jumping to max on
  * batch one) through the five stateful shapes that carry state at
  * 100 TB, and records per-workload throughput, batch-duration
  * stability, and state-store growth:
  *
  *  - running_totals   S11 transformWithState (TimeMode.None, update)
  *  - session_window   S14 native session_window merge (event time)
  *  - heavy_hitters    S17 Misra-Gries per (window, shard) + timers
  *  - scd2_fold        S20 per-batch snapshot fold (table state)
  *  - dedup_stream     S22 broadcast-probe + band-index append
  *
  * All state-store workloads run under the RocksDB provider (the
  * 100 TB deployment answer; transformWithState requires it).
  * BOUNDED STATE is the claim under test: with event-time watermarks
  * the open-state row count must track the active-key set, not the
  * total input — the JSON records per-batch numRowsTotal so the claim
  * is a committed measurement, not an argument.
  *
  * Usage: runMain graft.StreamScaleBench <genScaleDir> <outJson>
  *          [--files-per-trigger N]
  * (generate the corpus first: runMain graft.GenScale data/scale/sf1 1)
  */
object StreamScaleBench {

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  case class Res(name: String, rows: Long, secs: Double, batches: Int,
      batchP50Ms: Long, batchMaxMs: Long, stateRowsMax: Long,
      stateRowsLast: Long, stateBytesMax: Long, note: String) {
    def json: String = {
      val rps = if (secs > 0) (rows / secs).toLong else 0L
      s"""{"rows":$rows,"secs":${f"$secs%.1f"},"rows_per_s":$rps,""" +
        s""""batches":$batches,"batch_p50_ms":$batchP50Ms,""" +
        s""""batch_max_ms":$batchMaxMs,"state_rows_max":$stateRowsMax,""" +
        s""""state_rows_last":$stateRowsLast,""" +
        s""""state_bytes_max":$stateBytesMax,"note":"$note"}"""
    }
  }

  /** Drain an AvailableNow query and distill its progress history. */
  private def drain(name: String, q: StreamingQuery, note: String = ""): Res = {
    val t0 = System.nanoTime()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val ps = q.recentProgress.filter(_.numInputRows > 0)
    val durs = ps.map(_.durationMs.getOrDefault("triggerExecution", 0L).toLong)
      .sorted
    val stateRows = ps.map(p =>
      Option(p.stateOperators).filter(_.nonEmpty)
        .map(_.map(_.numRowsTotal).sum).getOrElse(0L))
    val stateBytes = ps.map(p =>
      Option(p.stateOperators).filter(_.nonEmpty)
        .map(_.map(_.memoryUsedBytes).sum).getOrElse(0L))
    Res(name, ps.map(_.numInputRows).sum, secs, ps.length,
      if (durs.isEmpty) 0 else durs(durs.length / 2),
      if (durs.isEmpty) 0 else durs.last,
      if (stateRows.isEmpty) 0 else stateRows.max,
      if (stateRows.isEmpty) 0 else stateRows.last,
      if (stateBytes.isEmpty) 0 else stateBytes.max,
      note)
  }

  /** Stage the corpus TIME-ORDERED into `nFiles` range-partitioned
    * files: the file source feeds part files in name order, so the
    * replay presents event time roughly monotonically and the
    * watermark advances batch over batch — the real-ingest shape.
    * (GenScale rows are hash-jittered across all 30 days; replaying
    * them unstaged would push the watermark to max-30min on batch one
    * and drop everything after as late.) */
  def stage(s: SparkSession, df: DataFrame, tsCol: String, out: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(tsCol))
      .sortWithinPartitions(tsCol)
      .write.mode("overwrite").parquet(out)

  private def eventsStream(s: SparkSession, staged: String, fpt: Int): DataFrame =
    s.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", fpt)
      .parquet(staged)

  def runningTotals(s: SparkSession, staged: String, fpt: Int, ckpt: String): Res = {
    import s.implicits._
    val in = eventsStream(s, staged, fpt)
      .select(col("user_id"), col("event_id"), col("value"))
      .as[streaming.RunningState.Ev]
    val out = streaming.RunningState.totals(s, in)
    val q = out.writeStream.format("noop")
      .option("checkpointLocation", s"$ckpt/totals")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    drain("running_totals", q,
      "state = one Totals row per user ever seen (TimeMode.None); " +
        "growth bound is |users|, by design")
  }

  def sessionWindows(s: SparkSession, staged: String, fpt: Int, ckpt: String): Res = {
    val in = eventsStream(s, staged, fpt).withWatermark("ts", "10 minutes")
    val out = streaming.EventOps.sessionWindows(in)
    val q = out.writeStream.format("noop")
      .option("checkpointLocation", s"$ckpt/sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    drain("session_window", q,
      "state = OPEN sessions only; watermark closes sessions as the " +
        "replay advances -- bounded by concurrently-active users")
  }

  def heavyHitters(s: SparkSession, staged: String, fpt: Int, ckpt: String): Res = {
    import s.implicits._
    val windowMs = 3600000L // 1 hour
    val in = streaming.HeavyHitters.assign(
      eventsStream(s, staged, fpt), "ts", "event_type", windowMs, 8)
      .withWatermark("win_start", "10 minutes").as[streaming.HeavyHitters.Item]
    val out = streaming.HeavyHitters.hits(s, in, windowMs, capacity = 16)
    val q = out.writeStream.format("noop")
      .option("checkpointLocation", s"$ckpt/hitters")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    drain("heavy_hitters", q,
      "state = capacity-bounded MG summaries per (open window, shard); " +
        "timers evict on close -- growth bound is windows x shards x cap")
  }

  def scd2Fold(s: SparkSession, staged: String, fpt: Int, root: String): Res = {
    val feed = eventsStream(s, staged, fpt)
      .select(col("user_id").as("key"), col("event_type").as("attr"),
        col("ts"), col("event_id").as("seq"))
    val q = streaming.Scd2Stream.attach(
      feed, s"$root/table", s"$root/ckpt", "key", "attr")
    drain("scd2_fold", q,
      "table state, not store state: per batch the snapshot dimension " +
        "is re-committed; cost grows with dimension size, not stream length")
  }

  def dedupStream(s: SparkSession, docsDir: String, fpt: Int, root: String): Res = {
    // seed the stored band index with the corpus head (D34's one-time
    // build), then stream the remainder against it
    val docs = s.read.parquet(docsDir)
      .select(col("doc_id"), col("text"), col("source"))
    val seed = docs.filter(col("doc_id") % 10 === 0)
    streaming.DedupStream.appendBandIndex(seed, s"$root/index")
    stage(s, docs.filter(col("doc_id") % 10 =!= 0)
      .withColumn("ord", col("doc_id")), "ord", s"$root/staged", 16)
    val in = s.readStream
      .schema("doc_id BIGINT, text STRING, source STRING, ord BIGINT")
      .option("maxFilesPerTrigger", fpt)
      .parquet(s"$root/staged")
      .drop("ord")
    val q = streaming.DedupStream.attach(in, s"$root/index",
      s"$root/clean", s"$root/dup", s"$root/ckpt")
    drain("dedup_stream", q,
      "stored-index state (broadcast-probe per batch, index appended); " +
        "no state store -- growth is the index, linear in CLEAN docs")
  }

  /** S25: forward-fill — one retained observation per user; most
    * events carry null and read the carried value. */
  def forwardFill(s: SparkSession, staged: String, fpt: Int, ckpt: String): Res = {
    import s.implicits._
    val in = eventsStream(s, staged, fpt)
      .select(col("user_id"), col("event_id"),
        when(col("event_id") % 5 === 0, col("value")).as("reading"))
      .as[streaming.RunningState.Reading]
    val q = streaming.RunningState.forwardFill(s, in)
      .writeStream.format("noop")
      .option("checkpointLocation", s"$ckpt/ffill")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    drain("forward_fill", q,
      "state = ONE double per user ever observed; growth bound |users|")
  }

  /** S26: sequence-pattern CEP — capped per-user event-type string. */
  def sequencePatterns(s: SparkSession, staged: String, fpt: Int,
      ckpt: String): Res = {
    import s.implicits._
    val in = eventsStream(s, staged, fpt)
      .select(col("user_id"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ch"))
      .as[streaming.RunningState.TypedEv]
    val q = streaming.RunningState.sequencePatterns(s, in)
      .writeStream.format("noop")
      .option("checkpointLocation", s"$ckpt/cep")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    drain("sequence_patterns", q,
      "state = one capped string per user (maxLen chars); growth bound " +
        "|users| x cap regardless of stream length")
  }

  /** S31: hash-priority bottom-k sampling per shard. */
  def bottomKSample(s: SparkSession, staged: String, fpt: Int,
      ckpt: String): Res = {
    import s.implicits._
    val in = eventsStream(s, staged, fpt)
      .select((col("event_id") % 64).as("shard"), col("event_id").as("doc_id"))
      .as[streaming.SampleStream.Item]
    val q = streaming.SampleStream.bottomK(s, in, 32)
      .writeStream.format("noop")
      .option("checkpointLocation", s"$ckpt/bottomk")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    drain("bottomk_sample", q,
      "state = O(k) members per shard: 64 shards x 32 = 2048 rows max, " +
        "scale-independent")
  }

  /** S32: streaming KLL-ish quantile monitor per key. */
  def quantileMonitor(s: SparkSession, staged: String, fpt: Int,
      ckpt: String): Res = {
    import s.implicits._
    val in = eventsStream(s, staged, fpt)
      .select((col("user_id") % 64).as("key"), col("event_id"),
        (col("value") * 1e6).cast("long").as("value_q"))
      .as[streaming.QuantileStream.Obs]
    val q = streaming.QuantileStream.quantiles(s, in)
      .writeStream.format("noop")
      .option("checkpointLocation", s"$ckpt/kll")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    drain("quantile_monitor", q,
      "state = O(k log n) sketch bytes per key, 64 keys; emits O(1) " +
        "rows per key per batch")
  }

  /** S33: event-time token-bucket rate limiting per user. */
  def rateLimit(s: SparkSession, staged: String, fpt: Int,
      ckpt: String): Res = {
    import s.implicits._
    val in = eventsStream(s, staged, fpt)
      .select(col("user_id").as("key"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[streaming.RateLimit.Ev]
    val q = streaming.RateLimit.decide(s, in, capacity = 10, refillPerSec = 1)
      .writeStream.format("noop")
      .option("checkpointLocation", s"$ckpt/rate")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    drain("rate_limit", q,
      "state = one O(1) bucket per user; pure event-time fold, " +
        "replay-identical decisions")
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outJson = args(1)
    def opt(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val fpt = opt("--files-per-trigger").map(_.toInt).getOrElse(1)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", Provider)
    // recentProgress retains only the LAST N updates (default 100);
    // a run with more batches than that would silently drop the head
    // of the history and under-count rows/batches in the report
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    val work = "/tmp/graft_stream_scale_" + ProcessHandle.current().pid()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(work))

    val t0 = System.nanoTime()
    stage(spark, Tables.events(spark, dir), "ts", s"$work/staged_events", 16)
    val stageSecs = (System.nanoTime() - t0) / 1e9

    val results = Seq(
      runningTotals(spark, s"$work/staged_events", fpt, s"$work/ck1"),
      sessionWindows(spark, s"$work/staged_events", fpt, s"$work/ck2"),
      heavyHitters(spark, s"$work/staged_events", fpt, s"$work/ck3"),
      scd2Fold(spark, s"$work/staged_events", fpt, s"$work/scd2"),
      dedupStream(spark, s"$dir/documents.parquet", fpt, s"$work/dedup"),
      // the r10 verdict item-4 additions: the full stateful family
      forwardFill(spark, s"$work/staged_events", fpt, s"$work/ck4"),
      sequencePatterns(spark, s"$work/staged_events", fpt, s"$work/ck5"),
      bottomKSample(spark, s"$work/staged_events", fpt, s"$work/ck6"),
      quantileMonitor(spark, s"$work/staged_events", fpt, s"$work/ck7"),
      rateLimit(spark, s"$work/staged_events", fpt, s"$work/ck8"))
    val json =
      s"""{"dir":"$dir","provider":"rocksdb","files_per_trigger":$fpt,""" +
        s""""stage_secs":${f"$stageSecs%.1f"},""" +
        results.map(r => s""""${r.name}":${r.json}""").mkString(",") + "}"
    val w = new java.io.PrintWriter(outJson)
    try w.println(json) finally w.close()
    println(json)
    rm(new java.io.File(work))
    spark.stop()
  }
}
