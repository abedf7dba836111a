package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.{SparkSpec, Tables}
import graft.etl.ZipEtl
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming specs (SURVEY.md §2.3 S3/S4/S6 + §2.1 E8): the same
  * EventOps/pipeline transforms running under Structured Streaming
  * with watermarks, stateful sessionization, and the file-drop
  * trigger. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("S3: streaming windowed agg with watermark matches batch tumbling agg") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (1L, ts("2026-01-01 10:05:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2026-01-01 10:45:00"), 1L, "view", 2.0, "{}"),
      (3L, ts("2026-01-01 11:05:00"), 2L, "click", 3.0, "{}"),
      (4L, ts("2026-01-01 11:30:00"), 2L, "view", 4.0, "{}"),
      (5L, ts("2026-01-01 12:01:00"), 1L, "click", 5.0, "{}"))
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val sdf = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // streaming variant: watermark + window() — the unbounded-input
    // equivalent of EventOps.tumblingHourly
    val agg = sdf.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(38,6)")), 4).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    val q = agg.writeStream.format("memory").queryName("s3_out")
      .outputMode("complete").start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("s3_out")
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = EventOps.tumblingHourly(
        events.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed.map(_.toSeq) === batch.map(_.toSeq))
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("S3: watermark drops events later than the threshold in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val sdf = stream.toDF().toDF("event_id", "ts", "event_type", "value")
    val agg = sdf.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))
    val q = agg.writeStream.format("memory").queryName("s3_late")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts("2026-01-01 10:05:00"), "view", 1.0))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window
      stream.addData((2L, ts("2026-01-01 13:00:00"), "view", 1.0))
      q.processAllAvailable()
      // late event for the closed 10:00 window — must be dropped
      stream.addData((3L, ts("2026-01-01 10:20:00"), "view", 1.0))
      q.processAllAvailable()
      stream.addData((4L, ts("2026-01-01 15:00:00"), "view", 1.0))
      q.processAllAvailable()
      val closed = spark.table("s3_late")
        .filter(col("window_start") === ts("2026-01-01 10:00:00")).collect()
      assert(closed.length === 1)
      assert(closed.head.getAs[Long]("n_events") === 1L,
        "the late event must not be counted into the closed window")
    } finally q.stop()
  }

  test("S2b: session_window and lag-based sessionize share the merge boundary") {
    import spark.implicits._
    val gapMs = graft.streaming.EventOps.SessionGapMinutes * 60L * 1000L
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def evs(offsets: Long*) = offsets.zipWithIndex.map { case (off, i) =>
      (i.toLong, 10L, new java.sql.Timestamp(base + off), 1.0)
    }.toDF("event_id", "user_id", "ts", "value")
    // exactly AT the boundary → merges in BOTH shapes (gap must be
    // strictly exceeded to split)
    val atBoundary = evs(0L, gapMs)
    assert(graft.streaming.EventOps.sessionWindows(atBoundary).count() === 1)
    assert(graft.streaming.EventOps.sessionize(atBoundary).count() === 1)
    // one micro past the boundary → splits in both
    val pastBoundary = evs(0L, gapMs + 1L)
    assert(graft.streaming.EventOps.sessionWindows(pastBoundary).count() === 2)
    assert(graft.streaming.EventOps.sessionize(pastBoundary).count() === 2)
    // merged session's end extends to last_ts + gap
    val end = graft.streaming.EventOps.sessionWindows(atBoundary)
      .select("session_end_us").head().getLong(0)
    assert(end === (base + 2 * gapMs) * 1000L)
  }

  test("S4: flatMapGroupsWithState sessionization closes sessions on gap and matches batch logic") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StatefulSessions._
    val evs = Seq(
      Ev(1L, 1L, ts("2026-01-01 10:00:00"), 1.0),
      Ev(1L, 2L, ts("2026-01-01 10:10:00"), 2.0),
      Ev(1L, 3L, ts("2026-01-01 11:30:00"), 3.0), // gap > 30min → new session
      Ev(2L, 4L, ts("2026-01-01 10:00:00"), 4.0),
      // watermark driver: a late high-ts event to close user 1/2 state
      Ev(3L, 5L, ts("2026-01-02 10:00:00"), 5.0))
    val stream = MemoryStream[Ev]
    val withWm = stream.toDS().withWatermark("ts", "0 seconds").as[Ev]
    val q = StatefulSessions.sessions(spark, withWm)
      .writeStream.format("memory").queryName("s4_out")
      .outputMode("append").start()
    try {
      stream.addData(evs.take(4): _*)
      q.processAllAvailable()
      stream.addData(evs.last) // advances watermark a day → timeouts fire
      q.processAllAvailable()
      stream.addData() // one more empty batch so timeout output is emitted
      q.processAllAvailable()
      val out = spark.table("s4_out").orderBy("user_id", "session_start").collect()
      // expected: user1 [10:00-10:10] n=2 sum=3, user1 [11:30] n=1 sum=3, user2 [10:00] n=1
      val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
      assert(u1.length === 2)
      assert(u1(0).getAs[Long]("n_events") === 2L &&
        u1(0).getAs[Double]("sum_value") === 3.0)
      assert(u1(1).getAs[Long]("n_events") === 1L)
      val u2 = out.filter(_.getAs[Long]("user_id") == 2L)
      assert(u2.length === 1 && u2(0).getAs[Long]("n_events") === 1L)
    } finally q.stop()
  }

  test("S4: in-watermark out-of-order events extend the session backwards") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StatefulSessions._
    val stream = MemoryStream[Ev]
    val withWm = stream.toDS().withWatermark("ts", "2 hours").as[Ev]
    val q = StatefulSessions.sessions(spark, withWm)
      .writeStream.format("memory").queryName("s4_ooo")
      .outputMode("append").start()
    try {
      stream.addData(Ev(1L, 1L, ts("2026-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // late but within the watermark and within the gap of the span
      stream.addData(Ev(1L, 2L, ts("2026-01-01 09:50:00"), 2.0))
      q.processAllAvailable()
      // far-future event closes the session via timeout
      stream.addData(Ev(2L, 3L, ts("2026-01-02 10:00:00"), 3.0))
      q.processAllAvailable()
      stream.addData()
      q.processAllAvailable()
      val u1 = spark.table("s4_ooo").filter(col("user_id") === 1L).collect()
      assert(u1.length === 1)
      assert(u1.head.getAs[Timestamp]("session_start") === ts("2026-01-01 09:50:00"),
        "the late event must extend the session's start backwards")
      assert(u1.head.getAs[Long]("n_events") === 2L)
    } finally q.stop()
  }

  test("S4: consecutive late events within one gap merge into ONE earlier session") {
    import StatefulSessions._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def us(s: String): Long = Timestamp.valueOf(s).getTime * 1000L
    // open session 10:00–10:05; two late events at 08:00 and 08:10 are
    // each > 30 min before the open session but within 30 min of each
    // other — batch sessionize would make them ONE session, so the
    // stateful path must too (not two singletons)
    val state = TestGroupState.create[OpenSession](
      org.apache.spark.api.java.Optional.of(OpenSession(us("2026-01-01 10:00:00"),
        us("2026-01-01 10:05:00"), 2L, 5.0)),
      GroupStateTimeout.EventTimeTimeout, 0L, org.apache.spark.api.java.Optional.of(0L), false)
    val out = updateUser(1L, Iterator(
      Ev(1L, 10L, ts("2026-01-01 08:00:00"), 1.0),
      Ev(1L, 11L, ts("2026-01-01 08:10:00"), 2.0)), state).toSeq
    assert(out.length === 1, s"one merged earlier session, got $out")
    assert(out.head.session_start === ts("2026-01-01 08:00:00"))
    assert(out.head.session_end === ts("2026-01-01 08:10:00"))
    assert(out.head.n_events === 2L && out.head.sum_value === 3.0)
    assert(state.get.n === 2L, "the open session is untouched")
  }

  test("S4: a late chain that reaches within one gap of the open session bridges into it") {
    import StatefulSessions._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def us(s: String): Long = Timestamp.valueOf(s).getTime * 1000L
    // open 10:00–10:05; late events 09:10 and 09:40: 09:40 merges into
    // the open span (20 min before start), and the 09:10 pending
    // session is then within 30 min of the extended start → all one
    // session, nothing emitted closed
    val state = TestGroupState.create[OpenSession](
      org.apache.spark.api.java.Optional.of(OpenSession(us("2026-01-01 10:00:00"),
        us("2026-01-01 10:05:00"), 2L, 5.0)),
      GroupStateTimeout.EventTimeTimeout, 0L, org.apache.spark.api.java.Optional.of(0L), false)
    val out = updateUser(1L, Iterator(
      Ev(1L, 10L, ts("2026-01-01 09:10:00"), 1.0),
      Ev(1L, 11L, ts("2026-01-01 09:40:00"), 2.0)), state).toSeq
    assert(out.isEmpty, s"everything bridges into the open session, got $out")
    assert(state.get.n === 4L && state.get.sum === 8.0)
    assert(state.get.startUs === us("2026-01-01 09:10:00"))
  }

  test("S12: Trigger.AvailableNow drains pending input and terminates on its own") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the batch-backfill knob: process everything available, then STOP
    // — same checkpointed offsets as a continuous run, so a nightly
    // AvailableNow job and a 24/7 stream are interchangeable
    val cp = Files.createTempDirectory("graft_avnow").toString
    val stream = MemoryStream[(Long, Double)]
    stream.addData((1L, 2.0), (1L, 3.0), (2L, 5.0))
    def run(): Unit = {
      val q = stream.toDF().toDF("k", "v")
        .groupBy("k").agg(sum("v").as("sv"))
        .writeStream.format("memory").queryName("s12_avnow")
        .outputMode("complete")
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // AvailableNow terminates WITHOUT an explicit stop()
      assert(q.awaitTermination(60000), "query must self-terminate")
    }
    run()
    val first = spark.table("s12_avnow").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(first === Map(1L -> 5.0, 2L -> 5.0))
    // a later backfill run picks up ONLY what arrived since (offsets
    // came from the checkpoint) and folds it into the aggregate state
    stream.addData((2L, 1.0))
    run()
    val second = spark.table("s12_avnow").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(second === Map(1L -> 5.0, 2L -> 6.0))
  }

  test("E16: undecodable payloads land in the dead-letter sink; good rows run the pipeline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_dlq").toString
    val (out, dlq, cp) = (s"$base/out", s"$base/dlq", s"$base/cp")
    def goodLine(z: String) = s"6,California,CA,$z,Orange,Anaheim,2023-01-01"
    val stream = MemoryStream[String]
    val raw = stream.toDF().toDF("value")
    stream.addData(goodLine("90001"), goodLine("90002"),
      "complete garbage line", ",,,,,,")
    val q = FileTrigger.attachWithDeadLetter(raw, out, dlq, cp)
    assert(q.awaitTermination(60000), "AvailableNow must self-terminate")
    val good = spark.read.parquet(out)
    assert(good.count() === 2)
    assert(good.select("zipcode").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("90001", "90002"))
    val dead = spark.read.parquet(dlq).collect()
    assert(dead.length === 2)
    assert(dead.forall(_.getAs[String]("reason") == "decode_contract_violation"))
    assert(dead.map(_.getAs[String]("raw_payload")).sorted.toSeq ===
      Seq(",,,,,,", "complete garbage line"),
      "quarantine must preserve the raw payload byte-for-byte")
    // a later run resumes from the checkpoint: only the NEW bad row is
    // quarantined again — nothing double-processes
    stream.addData("second wave of garbage")
    val q2 = FileTrigger.attachWithDeadLetter(raw, out, dlq, cp)
    assert(q2.awaitTermination(60000))
    assert(spark.read.parquet(dlq).count() === 3)
    assert(spark.read.parquet(out).count() === 2)
  }

  test("E8-Kafka: kafka-wire messages decode and run the same triggered pipeline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_kafka")
    val out = s"$root/out"; val cp = s"$root/cp"
    // kafka wire shape: (key, value, topic, partition, offset, ts, tsType)
    val stream = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long, Timestamp, Int)]
    val msgs = Seq(
      "6,California,CA,90001,Cedar County,Salem,2026-07-01",
      "6,California,CA,90001,Oak County,Dover,2026-07-15",
      "6,California,CA,90002,Pine County,Salem,2026-07-02")
    stream.addData(msgs.zipWithIndex.map { case (m, i) =>
      (Array.empty[Byte], m.getBytes("UTF-8"), "zips", 0, i.toLong,
        ts("2026-07-20 00:00:00"), 0)
    }: _*)
    val kafkaShaped = stream.toDF()
      .toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    val q = FileTrigger.attach(FileTrigger.decodeKafka(kafkaShaped), out, cp)
    q.awaitTermination()
    val res = spark.read.parquet(out)
    assert(res.count() === 2, "dedup inside the triggered batch")
    assert(res.filter(col("zipcode") === "90001" &&
      col("county") === "Oak County").count() === 1, "last-wins kept the newer row")
    assert(res.filter(col("latitude").isNull || col("tz_region").isNull).count() === 0,
      "enrichment ran inside the stream")
  }

  test("E8c: streaming upsert keeps the latest value per key across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_jdbc_stream")
    val url = "jdbc:derby:memory:graftstream;create=true"
    val stream = MemoryStream[(String, Long, Timestamp)]
    val sdf = stream.toDF().toDF("zip", "pop", "ts")
    val q = FileTrigger.attachJdbcUpsert(sdf, url, "stream_upsert",
      Seq("zip"), "ts", s"$root/cp")
    stream.addData(
      ("90001", 10L, ts("2026-01-01 10:00:00")),
      ("90001", 11L, ts("2026-01-01 10:05:00")), // in-batch last-wins
      ("90002", 20L, ts("2026-01-01 10:00:00")))
    q.awaitTermination()
    // second run: update one key, add one key
    val q2 = FileTrigger.attachJdbcUpsert(sdf, url, "stream_upsert",
      Seq("zip"), "ts", s"$root/cp")
    stream.addData(
      ("90001", 12L, ts("2026-01-01 11:00:00")),
      ("90003", 30L, ts("2026-01-01 11:00:00")))
    q2.awaitTermination()
    val back = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "stream_upsert")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load().orderBy("zip").collect()
    assert(back.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("90001", 12L), ("90002", 20L), ("90003", 30L)))
  }

  test("S7: dropDuplicatesWithinWatermark suppresses a key's re-occurrence cross-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_jdbc_dedup")
    val url = "jdbc:derby:memory:graftdedup;create=true"
    val stream = MemoryStream[(String, Long, Timestamp)]
    val sdf = stream.toDF().toDF("zip", "pop", "ts")
      .withWatermark("ts", "1 hour")
    val q = FileTrigger.attachJdbcUpsert(sdf, url, "dedup_upsert",
      Seq("zip"), "ts", s"$root/cp", dedupWithinWatermark = true)
    stream.addData(("90001", 10L, ts("2026-01-01 10:00:00")))
    q.awaitTermination()
    val q2 = FileTrigger.attachJdbcUpsert(sdf, url, "dedup_upsert",
      Seq("zip"), "ts", s"$root/cp", dedupWithinWatermark = true)
    // same key again within the watermark horizon → dropped pre-sink,
    // so the FIRST value survives (an upsert would have overwritten)
    stream.addData(("90001", 99L, ts("2026-01-01 10:30:00")))
    q2.awaitTermination()
    val back = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "dedup_upsert")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load().collect()
    assert(back.length === 1)
    assert(back.head.getLong(1) === 10L,
      "the duplicate key's later value must never reach the sink")
  }

  test("S8: stream-stream interval join matches in-window clicks and equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = Seq(
      (1L, 100L, ts("2026-01-01 10:00:00")),
      (1L, 101L, ts("2026-01-01 12:00:00")),
      (2L, 102L, ts("2026-01-01 10:00:00")))
    val clicks = Seq(
      (1L, 900L, ts("2026-01-01 10:05:00")), // in-window for imp 100
      (1L, 901L, ts("2026-01-01 10:30:00")), // > 10 min after imp 100 → no match
      (2L, 902L, ts("2026-01-01 10:09:00")), // in-window for imp 102
      (3L, 903L, ts("2026-01-01 10:05:00"))) // no impression at all
    val impStream = MemoryStream[(Long, Long, Timestamp)]
    val clickStream = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamJoin.impressionClickJoin(
      impStream.toDF().toDF("user_id", "imp_id", "imp_ts")
        .withWatermark("imp_ts", "1 hour"),
      clickStream.toDF().toDF("user_id", "click_id", "click_ts")
        .withWatermark("click_ts", "1 hour"))
    val q = joined.writeStream.format("memory").queryName("s8_out")
      .outputMode("append").start()
    try {
      impStream.addData(imps: _*)
      clickStream.addData(clicks: _*)
      q.processAllAvailable()
      val streamed = spark.table("s8_out")
        .orderBy("imp_id", "click_id").collect().map(_.toSeq).toSeq
      val batch = StreamJoin.impressionClickJoin(
        imps.toDF("user_id", "imp_id", "imp_ts"),
        clicks.toDF("user_id", "click_id", "click_ts"))
        .orderBy("imp_id", "click_id").collect().map(_.toSeq).toSeq
      assert(streamed === batch, "streaming result must equal the batch interval join")
      assert(streamed.map(r => (r(1), r(2))) === Seq((100L, 900L), (102L, 902L)))
    } finally q.stop()
  }

  test("S24: left-semi interval join emits a converted impression exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = Seq(
      (1L, 100L, ts("2026-01-01 10:00:00")), // two in-window clicks → ONE row
      (1L, 101L, ts("2026-01-01 12:00:00")), // no in-window click
      (2L, 102L, ts("2026-01-01 10:00:00"))) // one in-window click
    val clicks = Seq(
      (1L, 900L, ts("2026-01-01 10:04:00")),
      (1L, 901L, ts("2026-01-01 10:08:00")), // second match for imp 100
      (2L, 902L, ts("2026-01-01 10:09:00")),
      (3L, 903L, ts("2026-01-01 10:05:00")))
    val impStream = MemoryStream[(Long, Long, Timestamp)]
    val clickStream = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamJoin.impressionClickJoinSemi(
      impStream.toDF().toDF("user_id", "imp_id", "imp_ts")
        .withWatermark("imp_ts", "1 hour"),
      clickStream.toDF().toDF("user_id", "click_id", "click_ts")
        .withWatermark("click_ts", "1 hour"))
    val q = joined.writeStream.format("memory").queryName("s24_out")
      .outputMode("append").start()
    try {
      impStream.addData(imps: _*)
      clickStream.addData(clicks: _*)
      q.processAllAvailable()
      val streamed = spark.table("s24_out")
        .orderBy("imp_id").collect().map(_.toSeq).toSeq
      // imp 100 exactly once despite two matching clicks; imp 101 absent
      assert(streamed.map(_(1)) === Seq(100L, 102L))
      val batch = StreamJoin.impressionClickJoinSemi(
        imps.toDF("user_id", "imp_id", "imp_ts"),
        clicks.toDF("user_id", "click_id", "click_ts"))
        .orderBy("imp_id").collect().map(_.toSeq).toSeq
      assert(streamed === batch, "streaming semi join must equal the batch semi join")
    } finally q.stop()
  }

  test("S14: streaming session_window merges sessions across micro-batches and finalizes on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // gap = 30 min: e1 (10:00) and e2 (10:45) open two sessions; the
    // LATER-arriving e3 (10:20) bridges them — its window overlaps
    // both — so the engine must merge in-flight session state across
    // micro-batches, the thing the batch S2b entry cannot exercise
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val sdf = stream.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "1 hour")
    val q = EventOps.sessionWindows(sdf)
      .writeStream.format("memory").queryName("s14_out")
      .outputMode("append").start()
    try {
      stream.addData(
        (1L, ts("2026-01-01 10:00:00"), 1.0),
        (1L, ts("2026-01-01 10:45:00"), 2.0))
      q.processAllAvailable()
      stream.addData((1L, ts("2026-01-01 10:20:00"), 4.0)) // the bridge
      q.processAllAvailable()
      assert(spark.table("s14_out").isEmpty,
        "append mode must hold sessions open until the watermark passes")
      // pusher: watermark 20:00 - 1h = 19:00 >> session end 11:15
      stream.addData((99L, ts("2026-01-01 20:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("s14_out").filter(col("user_id") === 1L).collect()
      assert(rows.length === 1, s"bridged events must form ONE session: ${rows.toSeq}")
      val r = rows.head
      assert(r.getAs[Long]("n_events") === 3L)
      assert(r.getAs[Double]("sum_value") === 7.0)
      assert(r.getAs[Long]("session_start_us") ===
        ts("2026-01-01 10:00:00").getTime * 1000L)
      // session end = last event + gap = 10:45 + 30 min
      assert(r.getAs[Long]("session_end_us") ===
        ts("2026-01-01 11:15:00").getTime * 1000L)
    } finally q.stop()
  }

  test("S16: chained windowed aggregations run as TWO stateful operators and equal the batch roll-up") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val live = Seq(
      // hour 10, type view: bursts of 3 and 1 in distinct 10-min slots
      (1L, ts("2026-01-01 10:05:00")), (2L, ts("2026-01-01 10:06:00")),
      (3L, ts("2026-01-01 10:08:00")), (4L, ts("2026-01-01 10:15:00")),
      (5L, ts("2026-01-01 10:55:00")), (6L, ts("2026-01-01 10:57:00")),
      // hour 11, type view: single event
      (7L, ts("2026-01-01 11:05:00")))
    val clicks = Seq((8L, ts("2026-01-01 10:07:00")), (9L, ts("2026-01-01 10:09:00")))
    def df(rows: Seq[(Long, Timestamp)], tpe: String) =
      rows.map { case (id, t) => (id, t, tpe) }
    val stream = MemoryStream[(Long, Timestamp, String)]
    val sdf = stream.toDF().toDF("event_id", "ts", "event_type")
      .withWatermark("ts", "10 minutes")
    val q = EventOps.chainedWindowAgg(sdf)
      .writeStream.format("memory").queryName("s16_out")
      .outputMode("append").start()
    try {
      stream.addData(df(live, "view") ++ df(clicks, "click"): _*)
      q.processAllAvailable()
      assert(spark.table("s16_out").isEmpty,
        "append mode must hold hourly windows open until the watermark passes")
      // the chained plan must carry exactly two stateful operators
      assert(q.lastProgress.stateOperators.length === 2,
        "10-min agg and hourly roll-up must each be a state operator")
      // pusher: watermark 14:00 - 10 min closes hours 10 and 11
      stream.addData((99L, ts("2026-01-01 14:00:00"), "late"))
      q.processAllAvailable()
      val streamed = spark.table("s16_out")
        .orderBy("hour_start_us", "event_type").collect().toSeq
      val batch = EventOps.chainedWindowAgg(
        (df(live, "view") ++ df(clicks, "click"))
          .toDF("event_id", "ts", "event_type"))
        .orderBy("hour_start_us", "event_type").collect().toSeq
      assert(streamed.map(_.toSeq) === batch.map(_.toSeq),
        "closed streaming output must equal the batch definition")
      // spot-check the roll-up semantics: hour 10 'view' peak burst is
      // 3 (the 10:00-10:10 slot), total 6
      val h10view = streamed.find(r =>
        r.getAs[Long]("hour_start_us") == ts("2026-01-01 10:00:00").getTime * 1000L
          && r.getAs[String]("event_type") == "view").get
      assert(h10view.getAs[Long]("peak_10min") === 3L)
      assert(h10view.getAs[Long]("n_events") === 6L)
    } finally q.stop()
  }

  test("S13: left-outer interval join emits unmatched impressions only after the watermark closes their window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val impStream = MemoryStream[(Long, Long, Timestamp)]
    val clickStream = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamJoin.impressionClickJoinOuter(
      impStream.toDF().toDF("user_id", "imp_id", "imp_ts")
        .withWatermark("imp_ts", "1 hour"),
      clickStream.toDF().toDF("user_id", "click_id", "click_ts")
        .withWatermark("click_ts", "1 hour"))
    val q = joined.writeStream.format("memory").queryName("s13_out")
      .outputMode("append").start()
    try {
      impStream.addData(
        (1L, 100L, ts("2026-01-01 10:00:00")), // matches click 900
        (1L, 101L, ts("2026-01-01 12:00:00")), // no click in [12:00, 12:10]
        (2L, 102L, ts("2026-01-01 10:00:00")), // matches click 902
        (3L, 103L, ts("2026-01-01 10:00:00"))) // user with no clicks at all
      clickStream.addData(
        (1L, 900L, ts("2026-01-01 10:05:00")),
        (2L, 902L, ts("2026-01-01 10:09:00")))
      q.processAllAvailable()
      val early = spark.table("s13_out").collect()
      assert(!early.exists(_.isNullAt(2)),
        "no null-padded row may emit while the watermark could still admit a click")
      // watermark pushers on BOTH streams: 20:00 - 1h delay = 19:00,
      // far past every open [imp_ts, imp_ts + 10min] interval
      impStream.addData((9L, 199L, ts("2026-01-01 20:00:00")))
      clickStream.addData((9L, 999L, ts("2026-01-01 20:00:00")))
      q.processAllAvailable()
      val rows = spark.table("s13_out")
        .select("imp_id", "click_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      // matches + the pusher pair + the two null-padded no-convert rows
      assert(rows === Set((100L, 900L), (102L, 902L), (199L, 999L),
        (101L, -1L), (103L, -1L)),
        s"unexpected outer-join output: $rows")
    } finally q.stop()
  }

  test("S21: full-outer interval join keeps unmatched rows from BOTH streams") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val impStream = MemoryStream[(Long, Long, Timestamp)]
    val clickStream = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamJoin.impressionClickJoinFull(
      impStream.toDF().toDF("user_id", "imp_id", "imp_ts")
        .withWatermark("imp_ts", "1 hour"),
      clickStream.toDF().toDF("user_id", "click_id", "click_ts")
        .withWatermark("click_ts", "1 hour"))
    val q = joined.writeStream.format("memory").queryName("s21_out")
      .outputMode("append").start()
    try {
      impStream.addData(
        (1L, 100L, ts("2026-01-01 10:00:00")), // matches click 900
        (1L, 101L, ts("2026-01-01 12:00:00")), // converts never
        (3L, 103L, ts("2026-01-01 10:00:00"))) // user with no clicks
      clickStream.addData(
        (1L, 900L, ts("2026-01-01 10:05:00")),
        (4L, 904L, ts("2026-01-01 10:07:00"))) // orphan click: no impression
      q.processAllAvailable()
      val early = spark.table("s21_out").collect()
      assert(!early.exists(r => r.isNullAt(2) || r.isNullAt(3)),
        "no null-padded row may emit while its window is still open")
      // push both watermarks far past every open interval
      impStream.addData((9L, 199L, ts("2026-01-01 20:00:00")))
      clickStream.addData((9L, 999L, ts("2026-01-01 20:00:00")))
      q.processAllAvailable()
      val rows = spark.table("s21_out")
        .select("imp_id", "click_id").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(rows === Set(
        (100L, 900L), (199L, 999L), // matches
        (101L, -1L), (103L, -1L),   // no-convert impressions
        (-1L, 904L)),               // the orphan click survives
        s"unexpected full-outer output: $rows")
    } finally q.stop()
  }

  test("S9: stream-static broadcast enrichment equals the batch join and drops unmatched keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val rows = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1.0),
      (2L, ts("2026-01-01 10:01:00"), 2.0),
      (3L, ts("2026-01-01 10:02:00"), 3.0)) // no dim row → dropped (inner)
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val sdf = stream.toDF().toDF("user_id", "ts", "value")
    val q = StreamJoin.streamStaticEnrich(sdf, dim, "user_id")
      .writeStream.format("memory").queryName("s9_out")
      .outputMode("append").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("s9_out")
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      val batch = StreamJoin.streamStaticEnrich(
        rows.toDF("user_id", "ts", "value"), dim, "user_id")
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      assert(streamed === batch)
      assert(streamed.map(_.head) === Seq(1L, 2L), "unmatched key must drop")
      // the static side broadcasts: the micro-batch plan is map-side
      val planOut = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(planOut))(q.explain())
      assert(planOut.toString.contains("BroadcastHashJoin"),
        "stream-static enrichment must broadcast the dim")
    } finally q.stop()
  }

  test("S6/E8: file-drop trigger runs the pipeline exactly once per file") {
    val root = Files.createTempDirectory("graft_trigger")
    val watch = s"$root/incoming"; val out = s"$root/out"; val cp = s"$root/cp"
    Files.createDirectories(java.nio.file.Paths.get(watch))
    // drop file 1: two rows, one duplicate key
    Files.writeString(java.nio.file.Paths.get(s"$watch/drop1.csv"),
      """state_fips,state,state_abbr,zipcode,county,city,last_updated
        |6,California,CA,90001,Cedar County,Salem,2026-07-01
        |6,California,CA,90001,Oak County,Dover,2026-07-15
        |6,California,CA,90002,Pine County,Salem,2026-07-02
        |""".stripMargin)
    val q1 = FileTrigger.start(spark, watch, out, cp)
    q1.awaitTermination()
    val after1 = spark.read.parquet(out)
    assert(after1.count() === 2, "dedup inside the triggered batch")
    assert(after1.filter(col("zipcode") === "90001" &&
      col("county") === "Oak County").count() === 1, "last-wins kept the newer row")
    // drop file 2: restart picks up ONLY the new file (checkpointed)
    Files.writeString(java.nio.file.Paths.get(s"$watch/drop2.csv"),
      """state_fips,state,state_abbr,zipcode,county,city,last_updated
        |48,Texas,TX,75001,Lake County,Hudson,2026-07-20
        |""".stripMargin)
    val q2 = FileTrigger.start(spark, watch, out, cp)
    q2.awaitTermination()
    val after2 = spark.read.parquet(out)
    assert(after2.count() === 3, "second trigger processed only the new file")
    assert(after2.filter(col("state_abbr") === "TX").count() === 1)
    // enrichment ran inside the stream
    assert(after2.filter(col("latitude").isNull || col("tz_region").isNull).count() === 0)
  }
}
