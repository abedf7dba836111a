package graft.operators

import graft.{SparkSpec, Tables}
import graft.etl.Sink
import org.apache.spark.sql.functions._

/** Scale-mechanics specs (SURVEY.md §5): salted joins equal their
  * plain equivalents, and same-bucketed tables join shuffle-free. */
class ScaleSpec extends SparkSpec {

  test("salted join equals the plain join and spreads hot keys") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(cust, Seq("o_custkey"))
    val salted = Skew.saltedJoin(orders, cust, "o_custkey")
    assert(salted.count() === plain.count())
    val diff = salted.select("o_custkey", "o_orderkey", "c_name")
      .exceptAll(plain.select("o_custkey", "o_orderkey", "c_name")).count()
    assert(diff === 0)
  }

  test("same-bucketed tables join without a shuffle") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Sink.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Sink.writeBucketed(li, "b_lineitem", "o_orderkey", 8)
    // merge hint: at this tiny sf the planner would broadcast (and
    // bypass bucketing entirely); a sort-merge join is what the layout
    // exists for at scale
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_lineitem"), Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() ===
      orders.join(li, Seq("o_orderkey")).count())
  }
}
