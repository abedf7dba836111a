package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** R83/R84 — the Q7/Q10 TPC-H shapes: plan-level scale checks plus
  * result sanity (values are oracle-gated). */
class TpchMoreSpec extends SparkSpec {

  test("R83: Q7 broadcasts both nation roles and emits both directions") {
    // sf0.001's sample carries only one of the two trade directions,
    // so the both-directions assertion needs the next size up
    val df = Relational.q7NationVolume.fn(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "nation dims must ride broadcast joins")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val dirs = rows.map(r => (r.getAs[String]("supp_nation"),
      r.getAs[String]("cust_nation"))).distinct.toSet
    assert(dirs === Set(("NATION_3", "NATION_4"), ("NATION_4", "NATION_3")),
      "the symmetric pair predicate must keep exactly the two directions")
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("R84: Q10 pushes the returnflag filter into the scan and caps at 20") {
    val df = Relational.q10ReturnedTop.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(l_returnflag,R)"),
      "the selective flag filter must reach the parquet scan")
    val rows = df.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)),
      "rows must arrive revenue-descending")
  }

  test("R87: Q21's decorrelated aggregate equals the naive exists/not-exists") {
    val lines = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (datediff(to_date(col("l_shipdate")),
          to_date(col("o_orderdate"))) > 60).as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = lines.groupBy(_._1)
    val ref = byOrder.values.toSeq.flatMap { ls =>
      val supps = ls.map(_._2).distinct
      val lateSupps = ls.filter(_._3).map(_._2).distinct
      // naive form: supplier s blocks iff s is late, ANOTHER supplier
      // EXISTS on the order, and NO OTHER late supplier exists
      lateSupps.filter(s => supps.exists(_ != s) &&
        !lateSupps.exists(_ != s))
    }.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val topRef = ref.toSeq.sortBy(t => (-t._2, t._1)).take(10)
    val got = Relational.q21BlockedOrders.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Long]("numwait"))
      .toSeq
    assert(got === topRef)
  }
}
