package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** E18 — incremental aggregate maintenance: the merged plan must read
  * the stored summary + a FILTERED delta scan (pushdown-proven), and
  * equal the full recompute exactly. */
class IncrementalSpec extends SparkSpec {

  test("E18: merge of stored partials + delta equals the full recompute") {
    val merged = graft.SparkEntry.queries("etl_incremental_agg")(spark, sf)
    val full = Tables.orders(spark, sf)
      .groupBy(trunc(col("o_orderdate"), "month").as("o_month"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(38,6)")), 4)
          .cast("double").as("sum_price"))
    assert(merged.exceptAll(full).count() === 0)
    assert(full.exceptAll(merged).count() === 0)
    assert(merged.count() > 0)
  }

  test("E18: the delta scan is filter-pushed and the summary parquet is read") {
    val plan = graft.SparkEntry.queries("etl_incremental_agg")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("incragg_"),
      s"summary fixture not in the plan:\n$plan")
    // the ONLY orders scan must carry the cutoff as a pushed filter —
    // an unfiltered orders scan means the merge re-read closed history
    val ordersScans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("orders.parquet"))
      .toSeq
    assert(ordersScans.nonEmpty, s"no orders scan found:\n$plan")
    ordersScans.foreach { l =>
      assert(l.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
        s"delta scan lacks the pushed cutoff filter:\n$l")
    }
  }
}
