package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S27 — watermark-delay planning gates: the two-pass prefix max
  * equals the naive global window, the plan never funnels the stream
  * through one task, and the drop curve is monotone (values are
  * oracle-gated). */
class WatermarkPlanSpec extends SparkSpec {

  private def events = graft.Tables.events(spark, sf)
    .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))

  test("S27: two-pass lateness equals the naive single-partition window") {
    val naive = events
      .withColumn("seen_us",
        max(col("ts_us")).over(Window.orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("late_us",
        when(col("seen_us") > col("ts_us"),
          col("seen_us") - col("ts_us")).otherwise(0L))
      .select("event_id", "late_us")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = WatermarkPlan.lateness(events, 8)
      .select("event_id", "late_us")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naive)
  }

  test("S27: the two-pass plan plans no SinglePartition exchange") {
    val plan = WatermarkPlan.lateness(events, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      "prefix max must not funnel the stream through one task")
    val naivePlan = events
      .withColumn("m", max(col("ts_us")).over(Window.orderBy("event_id")))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("SinglePartition"),
      "contrast: the naive global window provably does")
  }

  test("S27: the drop curve is monotone non-increasing in the delay") {
    val rows = WatermarkPlan.qWatermarkPlan.fn(spark, sf).collect()
    assert(rows.length === WatermarkPlan.Delays.size)
    val byDelay = rows.sortBy(_.getAs[Long]("delay_s"))
      .map(_.getAs[Long]("n_dropped"))
    assert(byDelay.zip(byDelay.tail).forall { case (a, b) => a >= b },
      "a longer watermark can only drop fewer rows")
    val n = rows.head.getAs[Long]("n")
    assert(rows.forall(r => r.getAs[Long]("n_dropped") <= n))
  }
}
