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
}
