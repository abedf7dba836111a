package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** S18 — exactly-once foreachBatch file sink: batches commit once,
  * a replayed batchId is a no-op, a crash orphan (data written,
  * manifest not swapped) is invisible until its txn retries, and a
  * second query resuming from the checkpoint appends only new data. */
class ExactlyOnceSpec extends SparkSpec {

  test("S19: each micro-batch enriches against the dim snapshot CURRENT at batch time") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_snap_enrich").toString
    val (dim, table, ckpt) = (s"$base/dim", s"$base/table", s"$base/ckpt")

    graft.etl.Snapshots.commit(
      Seq((1L, "US", "v1"), (2L, "DE", "v1")).toDF("key", "country", "dim_ver"), dim)
    val stream = MemoryStream[(Long, Double)]
    stream.addData((1L, 10.0), (2L, 20.0))
    val q1 = SnapshotEnrich.attach(
      stream.toDF().toDF("key", "value"), "key", dim, table, ckpt)
    q1.awaitTermination()

    // the dim changes BETWEEN batches — no stream restart
    graft.etl.Snapshots.commit(
      Seq((1L, "US", "v2"), (2L, "DE", "v2")).toDF("key", "country", "dim_ver"), dim)
    stream.addData((1L, 30.0))
    val q2 = SnapshotEnrich.attach(
      stream.toDF().toDF("key", "value"), "key", dim, table, ckpt)
    q2.awaitTermination()

    val rows = SnapshotEnrich.read(spark, table)
      .select("key", "value", "dim_ver", "batch_id").collect()
    assert(rows.length === 3)
    val byValue = rows.map(r => r.getAs[Double]("value") ->
      r.getAs[String]("dim_ver")).toMap
    assert(byValue(10.0) === "v1" && byValue(20.0) === "v1",
      "wave-1 rows must carry the snapshot current at batch 0")
    assert(byValue(30.0) === "v2",
      "wave-2 rows must see the dim update without a restart")
    // exactly-once still holds through the composition
    assert(ExactlyOnceSink.committed(table) === Seq("batch-0", "batch-1"))
  }

  test("S18: commit-once, replay no-op, orphan invisibility, checkpointed resume") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_eos").toString
    val (table, ckpt) = (s"$base/table", s"$base/ckpt")

    val stream = MemoryStream[(Long, String)]
    stream.addData((1L, "a"), (2L, "b"))
    val q1 = ExactlyOnceSink.attach(
      stream.toDF().toDF("id", "v"), table, ckpt)
    q1.awaitTermination() // AvailableNow drains and self-terminates
    assert(ExactlyOnceSink.read(spark, table).count() === 2)
    assert(ExactlyOnceSink.committed(table) === Seq("batch-0"))

    // post-crash replay: same batchId arrives again → must be a no-op
    val replay = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(!ExactlyOnceSink.appendOnce(replay, table, "batch-0"))
    assert(ExactlyOnceSink.read(spark, table).count() === 2)

    // resume from the same checkpoint: only the NEW batch commits
    stream.addData((3L, "c"))
    val q2 = ExactlyOnceSink.attach(
      stream.toDF().toDF("id", "v"), table, ckpt)
    q2.awaitTermination()
    assert(ExactlyOnceSink.read(spark, table).count() === 3)
    assert(ExactlyOnceSink.committed(table) === Seq("batch-0", "batch-1"))

    // crash orphan: data dir written, manifest never swapped —
    // readers must not see it...
    val orphan = Seq((9L, "x")).toDF("id", "v")
    orphan.write.mode("overwrite").parquet(s"$table/txn-late")
    assert(ExactlyOnceSink.read(spark, table).count() === 3)
    // ...until the txn retries, which overwrites the orphan and
    // commits exactly once
    assert(ExactlyOnceSink.appendOnce(orphan, table, "late"))
    assert(ExactlyOnceSink.read(spark, table).count() === 4)
    assert(!ExactlyOnceSink.appendOnce(orphan, table, "late"))
    assert(ExactlyOnceSink.read(spark, table).count() === 4)
  }

  test("S20: streaming SCD2 maintenance converges to the batch rebuild across waves") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_scd2_stream").toString
    val (table, ckpt) = (s"$base/dim", s"$base/ckpt")
    val stream = MemoryStream[(Long, String, Long, Long)]
    def feed = stream.toDF().toDF("k", "attr", "ts", "seq")

    val wave1 = Seq((1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (2L, "X", 10L, 3L))
    stream.addData(wave1: _*)
    Scd2Stream.attach(feed, table, ckpt, "k", "attr").awaitTermination()
    val s1 = Scd2Stream.read(spark, table)
    val b1 = graft.etl.Scd.scd2(wave1.toDF("k", "attr", "ts", "seq"), "k", "attr")
    assert(s1.exceptAll(b1).isEmpty && b1.exceptAll(s1).isEmpty,
      "wave-1 state must equal the batch SCD2 build")

    // wave 2: a no-change repeat (collapses), a real change, a new key
    val wave2 = Seq((1L, "B", 30L, 4L), (1L, "C", 40L, 5L), (3L, "Z", 10L, 6L))
    stream.addData(wave2: _*)
    Scd2Stream.attach(feed, table, ckpt, "k", "attr").awaitTermination()
    val s2 = Scd2Stream.read(spark, table)
    val bAll = graft.etl.Scd.scd2(
      (wave1 ++ wave2).toDF("k", "attr", "ts", "seq"), "k", "attr")
    assert(s2.exceptAll(bAll).isEmpty && bAll.exceptAll(s2).isEmpty,
      "after two waves the maintained dimension must equal the full rebuild")

    // foreachBatch replay safety: applying wave 2 AGAIN changes nothing
    val replayed = graft.etl.Scd.scd2Apply(
      s2, wave2.toDF("k", "attr", "ts", "seq"), "k", "attr")
    assert(replayed.exceptAll(s2).isEmpty && s2.exceptAll(replayed).isEmpty)

    // each wave committed one consistent snapshot (IO14 history)
    assert(graft.etl.Snapshots.hasCurrent(table))
  }
}
