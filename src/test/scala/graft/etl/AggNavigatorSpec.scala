package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E34 — the routing guarantees behind the oracle-gated values. */
class AggNavigatorSpec extends SparkSpec {

  test("E34: week routes to day, year routes to month — plans read ONLY summaries") {
    val week = AggNavigator.revenueBy(spark, sf, "week")
    val year = AggNavigator.revenueBy(spark, sf, "year")
    val wPlan = week.queryExecution.executedPlan.toString
    val yPlan = year.queryExecution.executedPlan.toString
    assert(!wPlan.contains("orders.parquet") &&
      !yPlan.contains("orders.parquet"),
      "a routed query must never scan the fact")
    assert(wPlan.contains("aggnav_day_"),
      s"week must be served by the day summary:\n$wPlan")
    assert(yPlan.contains("aggnav_month_"),
      s"year must be served by the coarser month summary:\n$yPlan")
  }

  test("E34: routing picks the coarsest server; unanswerable grain fails loudly") {
    assert(AggNavigator.route("week") === "day")
    assert(AggNavigator.route("month") === "month")
    assert(AggNavigator.route("quarter") === "month")
    assert(AggNavigator.route("year") === "month")
    val e = intercept[RuntimeException](AggNavigator.route("hour"))
    assert(e.getMessage.contains("no stored summary"),
      "finer-than-stored grains must not silently fall back to the fact")
  }

  test("E34: the month summary derives from the day summary and both tile the fact") {
    val day = spark.read.parquet(AggNavigator.summaryFor(spark, sf, "day"))
    val month = spark.read.parquet(AggNavigator.summaryFor(spark, sf, "month"))
    val factN = graft.Tables.orders(spark, sf).count()
    assert(day.agg(sum("n")).collect().head.getLong(0) === factN)
    assert(month.agg(sum("n")).collect().head.getLong(0) === factN)
    // month rows really are rollups of day rows
    val fromDay = day.groupBy(trunc(col("period"), "month").as("period"),
        col("o_orderpriority"))
      .agg(sum("n").as("n"), sum("sum_c").as("sum_c"))
    assert(fromDay.exceptAll(month).count() === 0)
    assert(month.exceptAll(fromDay).count() === 0)
  }
}
