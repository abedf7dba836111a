package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Specs for the bucketed range join (R23): exact parity with the
  * naive theta join, once-only matching across bucket boundaries, and
  * the plan property that justifies the operator — an equi-join, not a
  * BroadcastNestedLoopJoin. */
class RangeJoinSpec extends SparkSpec {

  test("R23: bucketed range join equals the naive theta join") {
    val windows = Tables.events(spark, sf)
      .filter(col("event_id") % 100 === 0)
      .select(col("event_id").as("window_id"), col("ts").as("start_ts"),
        expr("ts + INTERVAL 6 HOUR").as("end_ts"))
    val points = Tables.events(spark, sf).select("event_id", "ts")
    val bucketed = RangeJoin.bucketed(points, "ts", windows,
      "start_ts", "end_ts", 21600L)
      .select("event_id", "window_id")
    val naive = points.join(windows,
      col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .select("event_id", "window_id")
    assert(bucketed.count() > 0, "the scenario must produce matches")
    assert(bucketed.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(bucketed).count() === 0)
  }

  test("R23: an interval spanning many buckets matches each point exactly once") {
    import spark.implicits._
    // one 10-day interval over 1-day buckets: every point matched once
    val iv = Seq((1L, "2026-01-05 00:00:00", "2026-01-15 00:00:00"))
      .toDF("iv_id", "s", "e")
      .select(col("iv_id"), col("s").cast("timestamp").as("start_ts"),
        col("e").cast("timestamp").as("end_ts"))
    val pts = (0 until 20).map(i => (i.toLong, f"2026-01-${i + 1}%02d 12:00:00"))
      .toDF("pt_id", "t")
      .select(col("pt_id"), col("t").cast("timestamp").as("ts"))
    val res = RangeJoin.bucketed(pts, "ts", iv, "start_ts", "end_ts", 86400L)
    assert(res.count() === 10, "days 5..14 at noon fall inside [05, 15)")
    assert(res.groupBy("pt_id").count().filter(col("count") > 1).count() === 0,
      "no duplicate matches across bucket boundaries")
  }

  test("R23: the coverage entry plans an equi-join, not BroadcastNestedLoopJoin") {
    val p = graft.SparkEntry.queries("q_range_join")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "range-only predicate must bucket into an equi-join")
    assert(!p.contains("CartesianProduct"))
  }
}
