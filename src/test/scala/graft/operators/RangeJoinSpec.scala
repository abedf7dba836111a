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

  private def mkIntervals(rows: Seq[(Long, Long, Long)], p: String) = {
    import spark.implicits._
    rows.toDF(p + "id", p + "s", p + "e")
  }

  test("R101: interval overlap equals the naive theta join, each pair once") {
    // spans from sub-bucket to many-bucket (bucket = 100 us here),
    // including exact-touch (no overlap), containment, and identity
    val a = mkIntervals(Seq((1L, 0L, 250L), (2L, 300L, 1300L),
      (3L, 500L, 501L), (4L, 2000L, 2100L)), "a_")
    val b = mkIntervals(Seq((10L, 240L, 300L), (11L, 250L, 400L),
      (12L, 0L, 5000L), (13L, 1300L, 1400L), (14L, 501L, 600L)), "b_")
    val got = RangeJoin
      .intervalOverlap(a, b, bucketSeconds = 1L, aPrefix = "a_",
        bPrefix = "b_")
      .select("a_id", "b_id")
    // bucketSeconds=1 → 1e6 us buckets; rerun with tiny us-scale data
    // scaled up so buckets split the intervals (test the boundary math)
    val aS = mkIntervals(Seq((1L, 0L, 250L), (2L, 300L, 1300L),
      (3L, 500L, 501L), (4L, 2000L, 2100L))
      .map { case (i, s, e) => (i, s * 1000000L, e * 1000000L) }, "a_")
    val bS = mkIntervals(Seq((10L, 240L, 300L), (11L, 250L, 400L),
      (12L, 0L, 5000L), (13L, 1300L, 1400L), (14L, 501L, 600L))
      .map { case (i, s, e) => (i, s * 1000000L, e * 1000000L) }, "b_")
    val gotSplit = RangeJoin
      .intervalOverlap(aS, bS, bucketSeconds = 100L, aPrefix = "a_",
        bPrefix = "b_")
      .select("a_id", "b_id")
    val naive = a.join(b,
        col("a_s") < col("b_e") && col("b_s") < col("a_e") &&
          col("a_e") > col("a_s") && col("b_e") > col("b_s"))
      .select("a_id", "b_id")
    val expect = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact-touch [0,250)×[250,400) must NOT match; [0,250)×[240,300) must
    assert(expect.contains((1L, 10L)) && !expect.contains((1L, 11L)))
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === expect)
    val splitPairs = gotSplit.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(splitPairs.toSet === expect, "bucket-split run must agree")
    assert(splitPairs.length === splitPairs.distinct.length,
      "first-shared-bucket filter must emit each pair exactly once, " +
        "with no dedup stage")
  }

  test("R101: the coverage entry joins on buckets — no cartesian, no dedup agg") {
    val df = graft.SparkEntry.queries("q_interval_overlap")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "interval-interval overlap must bucket into an equi-join")
    // exactly ONE aggregate (the daily rollup): a distinct/dedup stage
    // before it would betray the once-per-pair guarantee being patched
    // up by a shuffle instead of the greatest-start-bucket filter
    val aggs = df.queryExecution.optimizedPlan.collect {
      case ag: org.apache.spark.sql.catalyst.plans.logical.Aggregate => ag
    }
    assert(aggs.length === 1,
      s"expected only the daily rollup aggregate, found ${aggs.length}")
  }
}
