package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

/** S28 — the streaming STATE-SCHEMA evolution contract, pinned as
  * tests: a stateful query's checkpoint encodes its aggregation
  * buffer layout, so restarting "the same" pipeline with a changed
  * aggregate is not a code review question — the engine must refuse
  * loudly rather than deserialize old state into a new layout (the
  * silent alternative corrupts every running total). The IO10 schema-
  * evolution story at the STATE level: batch tables can widen
  * in-place; streaming state cannot, and the operational playbook
  * (new checkpoint + backfill via Trigger.AvailableNow, S12) exists
  * because of exactly this contract. A restart with IDENTICAL shape
  * must keep accumulating from the checkpointed state — both halves
  * are asserted. */
class StateEvolutionSpec extends SparkSpec {

  private def run(stream: MemoryStream[(String, Long)], ckpt: String,
      widened: Boolean): Either[Throwable, Map[String, (Long, Long)]] = {
    val base = stream.toDF().toDF("k", "v").groupBy("k")
    val agg =
      if (widened) base.agg(sum("v").as("total"), count(lit(1)).as("n"),
        max("v").as("mx"))
      else base.agg(sum("v").as("total"), count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(s"s28_${System.nanoTime()}")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(s"SELECT k, total, n FROM ${q.name}")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap
      Right(rows)
    } catch { case e: Throwable => Left(e) }
    finally q.stop()
  }

  test("S28: identical shape resumes from state; a widened aggregate refuses loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s28").toString
    val stream = MemoryStream[(String, Long)]
    stream.addData(("a", 1L), ("a", 2L), ("b", 5L))
    val first = run(stream, ckpt, widened = false)
    assert(first === Right(Map("a" -> (3L, 2L), "b" -> (5L, 1L))))

    // restart, same shape: checkpointed running totals continue
    stream.addData(("a", 10L))
    val resumed = run(stream, ckpt, widened = false)
    assert(resumed === Right(Map("a" -> (13L, 3L), "b" -> (5L, 1L))),
      "an identical restart must accumulate onto checkpointed state")

    // restart with an ADDED aggregate: the state layout changed — the
    // engine must fail the query, not reinterpret old buffers
    stream.addData(("b", 7L))
    run(stream, ckpt, widened = true) match {
      case Left(e) =>
        val chain = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(_.toString.toLowerCase).mkString(" ")
        assert(e.isInstanceOf[StreamingQueryException] &&
          (chain.contains("state") || chain.contains("schema")),
          s"refusal should name the state-schema mismatch: $chain")
      case Right(rows) =>
        fail(s"widened aggregate silently restarted from old state: $rows")
    }
  }
}
