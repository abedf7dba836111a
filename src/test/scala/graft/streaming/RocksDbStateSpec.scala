package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stateful streaming surfaces (S4 sessions, S7 cross-batch dedup)
  * re-run under the RocksDB state store provider — at 100 TB streaming
  * state the deployment answer is RocksDB (state spills to local disk
  * + changelog checkpointing), not the default HDFS-backed in-memory
  * map, so the operators must be provider-agnostic. VERDICT r4 #5. */
class RocksDbStateSpec extends SparkSpec {

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def ts(s: String) = Timestamp.valueOf(s)

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  test("S4 under RocksDB: flatMapGroupsWithState sessions close on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StatefulSessions._
    withRocksDb {
      val evs = Seq(
        Ev(1L, 1L, ts("2026-01-01 10:00:00"), 1.0),
        Ev(1L, 2L, ts("2026-01-01 10:10:00"), 2.0),
        Ev(1L, 3L, ts("2026-01-01 11:30:00"), 3.0),
        Ev(2L, 4L, ts("2026-01-01 10:00:00"), 4.0),
        Ev(3L, 5L, ts("2026-01-02 10:00:00"), 5.0))
      val stream = MemoryStream[Ev]
      val withWm = stream.toDS().withWatermark("ts", "0 seconds").as[Ev]
      val q = StatefulSessions.sessions(spark, withWm)
        .writeStream.format("memory").queryName("s4_rocks")
        .outputMode("append").start()
      try {
        stream.addData(evs.take(4): _*)
        q.processAllAvailable()
        stream.addData(evs.last)
        q.processAllAvailable()
        stream.addData()
        q.processAllAvailable()
        val out = spark.table("s4_rocks").orderBy("user_id", "session_start").collect()
        val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
        assert(u1.length === 2)
        assert(u1(0).getAs[Long]("n_events") === 2L &&
          u1(0).getAs[Double]("sum_value") === 3.0)
        assert(u1(1).getAs[Long]("n_events") === 1L)
        assert(out.count(_.getAs[Long]("user_id") == 2L) === 1)
        // the state really lives in RocksDB: its provider publishes
        // rocksdb* custom metrics on the state operator
        val metrics = q.lastProgress.stateOperators(0).customMetrics
        assert(metrics.keySet.asScala.exists(_.startsWith("rocksdb")),
          s"expected rocksdb state metrics, got: ${metrics.keySet}")
      } finally q.stop()
    }
  }

  test("S11: transformWithState running totals accumulate across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import RunningState._
    // transformWithState REQUIRES the RocksDB provider — part of the
    // new API's contract, not an option
    withRocksDb {
      val stream = MemoryStream[Ev]
      val q = RunningState.totals(spark, stream.toDS())
        .writeStream.format("memory").queryName("s11_tws")
        .outputMode("update").start()
      try {
        stream.addData(Ev(1L, 1L, 10.0), Ev(1L, 2L, 5.0), Ev(2L, 3L, 1.0))
        q.processAllAvailable()
        stream.addData(Ev(1L, 4L, 2.5), Ev(3L, 5L, 7.0))
        q.processAllAvailable()
        val out = spark.table("s11_tws").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        // batch 1 emissions
        assert(out.contains((1L, 2L, 15.0)) && out.contains((2L, 1L, 1.0)))
        // batch 2: user 1's totals CONTINUED from RocksDB state; user 2
        // silent (no new rows ⇒ no emission in Update mode)
        assert(out.contains((1L, 3L, 17.5)) && out.contains((3L, 1L, 7.0)))
        assert(out.count(_._1 == 2L) === 1)
        // final totals per key match the batch aggregation of all input
        val finalTotals = out.groupBy(_._1).map { case (k, rows) => k -> rows.last }
        assert(finalTotals(1L) === ((1L, 3L, 17.5)))
        val metrics = q.lastProgress.stateOperators(0).customMetrics
        assert(metrics.keySet.asScala.exists(_.startsWith("rocksdb")))
      } finally q.stop()
    }
  }

  test("S11b: transformWithState event-time timers close idle keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import RunningState._
    withRocksDb {
      val stream = MemoryStream[TimedEv]
      val withWm = stream.toDS().withWatermark("ts", "0 seconds").as[TimedEv]
      val q = RunningState.idleClosedTotals(spark, withWm, gapMs = 60 * 60 * 1000L)
        .writeStream.format("memory").queryName("s11_timers")
        .outputMode("append").start()
      try {
        stream.addData(
          TimedEv(1L, 1L, ts("2026-01-01 10:00:00"), 2.0),
          TimedEv(1L, 2L, ts("2026-01-01 10:20:00"), 3.0))
        q.processAllAvailable()
        // nothing closed yet: watermark is at 10:20, timer armed at 11:20
        assert(spark.table("s11_timers").count() === 0)
        // a much later event for ANOTHER key advances the watermark past
        // key 1's timer → its session closes with the accumulated totals
        stream.addData(TimedEv(2L, 3L, ts("2026-01-01 13:00:00"), 9.0))
        q.processAllAvailable()
        stream.addData() // one more batch so the fired timer's output commits
        q.processAllAvailable()
        val out = spark.table("s11_timers").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
        assert(out.contains((1L, 2L, 5.0, true)), s"got: ${out.mkString(", ")}")
        // key 2 is still open (its own timer is beyond the watermark)
        assert(!out.exists(_._1 == 2L))
      } finally q.stop()
    }
  }

  test("S7 under RocksDB: dropDuplicatesWithinWatermark suppresses cross-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val root = Files.createTempDirectory("graft_jdbc_dedup_rocks")
      val url = "jdbc:derby:memory:graftdeduprocks;create=true"
      val stream = MemoryStream[(String, Long, Timestamp)]
      val sdf = stream.toDF().toDF("zip", "pop", "ts")
        .withWatermark("ts", "1 hour")
      val q = FileTrigger.attachJdbcUpsert(sdf, url, "dedup_upsert_rocks",
        Seq("zip"), "ts", s"$root/cp", dedupWithinWatermark = true)
      stream.addData(("90001", 10L, ts("2026-01-01 10:00:00")))
      q.awaitTermination()
      val q2 = FileTrigger.attachJdbcUpsert(sdf, url, "dedup_upsert_rocks",
        Seq("zip"), "ts", s"$root/cp", dedupWithinWatermark = true)
      stream.addData(("90001", 99L, ts("2026-01-01 10:30:00")))
      q2.awaitTermination()
      val back = spark.read.format("jdbc").option("url", url)
        .option("dbtable", "dedup_upsert_rocks")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .load().collect()
      assert(back.length === 1)
      assert(back.head.getLong(1) === 10L,
        "the duplicate key's later value must never reach the sink under RocksDB state")
    }
  }

  test("S15 under RocksDB: streaming z-scores match Welford-by-hand and spikes flag") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import Anomaly._
    withRocksDb {
      val stream = MemoryStream[WinCount]
      // threshold 3: the 3rd baseline window (96 vs mean 102, var 8 from
      // the first two) legitimately sits at z = -2.12 and must not flag
      val q = Anomaly.scored(spark, stream.toDS(), zThreshold = 3.0)
        .writeStream.format("memory").queryName("s15_anomaly")
        .outputMode("append").start()
      try {
        // batch 1: a steady baseline for type "click"
        stream.addData(
          WinCount("click", ts("2026-01-01 10:00:00"), 100L),
          WinCount("click", ts("2026-01-01 11:00:00"), 104L),
          WinCount("click", ts("2026-01-01 12:00:00"), 96L),
          WinCount("click", ts("2026-01-01 13:00:00"), 102L))
        q.processAllAvailable()
        // batch 2: a 10x spike plus one normal window, and a first-ever
        // window for a different type (no stats yet -> no verdict)
        stream.addData(
          WinCount("click", ts("2026-01-01 14:00:00"), 1000L),
          WinCount("click", ts("2026-01-01 15:00:00"), 98L),
          WinCount("error", ts("2026-01-01 14:00:00"), 5L))
        q.processAllAvailable()
        val out = spark.table("s15_anomaly").collect()
          .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))

        // windows 1-2 of the baseline have <2 prior windows: no z
        val baseline = out.filter(_._1 == "click").sortBy(_._2.getTime)
        assert(baseline(0)._4.isEmpty && baseline(1)._4.isEmpty)
        assert(baseline.take(4).forall(!_._5), "baseline must not flag")
        // Welford by hand over (100,104,96,102): mean 100.5, m2 = 35,
        // var_samp = 35/3; spike z = (1000-100.5)/sqrt(35/3)
        val zSpike = baseline(4)._4.get
        assert(math.abs(zSpike - (1000 - 100.5) / math.sqrt(35.0 / 3)) < 1e-9)
        assert(baseline(4)._5, "the 10x spike must flag")
        // the normal window AFTER the spike is judged against stats that
        // now include the spike (huge variance) -> not flagged
        assert(!baseline(5)._5)
        // first window of a new type: no stats, no verdict, no flag
        val err = out.filter(_._1 == "error")
        assert(err.length === 1 && err.head._4.isEmpty && !err.head._5)
      } finally q.stop()
    }
  }

  test("S17 under RocksDB: Misra-Gries window summaries honor the survival and bound guarantees") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import HeavyHitters._
    withRocksDb {
      val winMs = 60000L
      val capacity = 4
      val base = ts("2026-01-01 10:00:00").getTime
      def at(off: Long) = new Timestamp(base + off)
      // window A: one hot item (30), one warm (10), ten singletons
      val winA =
        (0 until 30).map(i => (at(i * 1000L), "hot")) ++
        (0 until 10).map(i => (at(30000L + i * 1000L), "warm")) ++
        (0 until 10).map(i => (at(45000L + i * 500L), s"t$i"))
      val stream = MemoryStream[(Timestamp, String)]
      val items = HeavyHitters.assign(stream.toDF(), "_1", "_2", winMs, shards = 2)
        .withWatermark("win_start", "0 seconds").as[Item]
      val q = HeavyHitters.hits(spark, items, winMs, capacity)
        .writeStream.format("memory").queryName("s17_mg")
        .outputMode("append").start()
      try {
        stream.addData(winA: _*)
        q.processAllAvailable()
        assert(spark.table("s17_mg").isEmpty,
          "summaries must hold until the watermark closes the window")
        // watermark pusher in a later window; its own window stays open
        stream.addData((at(5 * winMs), "late"))
        q.processAllAvailable()
        val out = spark.table("s17_mg").collect().map(r =>
          (r.getTimestamp(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
        assert(out.nonEmpty && out.forall(_._1.getTime == base),
          s"only window A may emit: ${out.toSeq}")
        // each EMITTED shard reports its true assigned volume (a shard
        // whose summary fully evicted — all-singleton tails churning a
        // small capacity — legitimately emits nothing: MG is lossy on
        // the tail, never on the head)
        val shardCounts = HeavyHitters.assign(
          winA.toDF("_1", "_2"), "_1", "_2", winMs, shards = 2)
          .groupBy("shard").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        out.groupBy(_._2).foreach { case (sh, rows) =>
          assert(rows.head._5 === shardCounts(sh),
            s"shard $sh n_seen ${rows.head._5} != true ${shardCounts(sh)}")
        }
        // bounded state: at most `capacity` items per shard summary
        out.groupBy(_._2).foreach { case (_, rows) =>
          assert(rows.length <= capacity)
        }
        // the hot item MUST survive (30 > N_shard/capacity for any
        // split of 50 rows), with a lower-bound count within the
        // Misra-Gries error of truth
        val hot = out.find(_._3 == "hot").getOrElse(
          fail(s"hot item evicted: ${out.toSeq}"))
        val hotShardN = hot._5
        assert(hot._4 <= 30L && hot._4 >= 30L - hotShardN / capacity,
          s"count_lb ${hot._4} outside [30 - $hotShardN/$capacity, 30]")
        // every reported count is a lower bound on its true count
        out.foreach { r =>
          val truth = winA.count(_._2 == r._3).toLong
          assert(r._4 <= truth, s"${r._3}: reported ${r._4} > true $truth")
        }
      } finally q.stop()
    }
  }

  test("S25: streaming forward fill carries the last reading across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import RunningState._
    withRocksDb {
      val stream = MemoryStream[Reading]
      val q = RunningState.forwardFill(spark, stream.toDS())
        .writeStream.format("memory").queryName("s25_locf")
        .outputMode("update").start()
      try {
        stream.addData(
          Reading(1L, 1L, Some(5.0)), Reading(1L, 2L, None),
          Reading(2L, 1L, None))
        q.processAllAvailable()
        stream.addData(
          Reading(1L, 3L, None), Reading(1L, 4L, Some(8.0)),
          Reading(2L, 2L, Some(1.0)))
        q.processAllAvailable()
        stream.addData(Reading(2L, 3L, None))
        q.processAllAvailable()
        val out = spark.table("s25_locf").collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            ((Option(r.get(2)).map(_.asInstanceOf[Double]),
              Option(r.get(3)).map(_.asInstanceOf[Double]),
              r.getBoolean(4)))).toMap
        // in-batch fill after the first observation
        assert(out((1L, 2L)) === ((None, Some(5.0), true)))
        // CROSS-BATCH fill: batch 2's gap fills from batch 1's state
        assert(out((1L, 3L)) === ((None, Some(5.0), true)))
        // new observation replaces the carried value
        assert(out((1L, 4L)) === ((Some(8.0), Some(8.0), false)))
        // key with no observation yet: honest null, still emitted
        assert(out((2L, 1L)) === ((None, None, true)))
        // and fills once its first observation lands in a LATER batch
        assert(out((2L, 3L)) === ((None, Some(1.0), true)))
      } finally q.stop()
    }
  }

  test("S26: streaming sequence patterns complete across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import RunningState._
    withRocksDb {
      val stream = MemoryStream[TypedEv]
      val q = RunningState.sequencePatterns(spark, stream.toDS())
        .writeStream.format("memory").queryName("s26_cep")
        .outputMode("update").start()
      try {
        // batch 1: view + click — the funnel is OPEN, nothing counts
        stream.addData(TypedEv(1L, 1L, "v"), TypedEv(1L, 2L, "c"))
        q.processAllAvailable()
        // batch 2: the purchase lands — the cross-batch pattern closes
        stream.addData(TypedEv(1L, 3L, "p"),
          TypedEv(2L, 4L, "v"), TypedEv(2L, 5L, "e"))
        q.processAllAvailable()
        val out = spark.table("s26_cep").collect()
          .map(r => (r.getLong(0), r.getInt(1)) ->
            ((r.getInt(2), r.getInt(3)))).toMap
        assert(out((1L, 2)) === ((0, 0)), "open funnel must not count")
        assert(out((1L, 3)) === ((1, 0)),
          "the pattern spanning two batches must complete on arrival")
        assert(out((2L, 2)) === ((0, 1)), "error-aborted view counts")
        // an error BETWEEN the funnel steps blocks the pattern
        stream.addData(TypedEv(3L, 6L, "v"), TypedEv(3L, 7L, "e"),
          TypedEv(3L, 8L, "c"), TypedEv(3L, 9L, "p"))
        q.processAllAvailable()
        val r3 = spark.table("s26_cep").collect()
          .filter(_.getLong(0) == 3L).maxBy(_.getInt(1))
        assert(r3.getInt(2) === 0, "error inside the funnel must block it")
      } finally q.stop()
    }
  }

  private implicit class JavaSetOps[A](s: java.util.Set[A]) {
    def asScala: scala.collection.mutable.Set[A] =
      scala.jdk.CollectionConverters.SetHasAsScala(s).asScala
  }
}
