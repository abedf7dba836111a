package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** IO15/R52 — the bucketed join's reason to exist is a plan property:
  * ZERO exchanges below the join. The oracle proves values; this spec
  * proves the shuffle really disappeared (and that the plain-parquet
  * contrast pays it). */
class BucketedSpec extends SparkSpec {

  private def exchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).size

  test("R52: bucketed fact-fact join runs with no join-side exchange") {
    val df = Bucketed.joinAgg(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the only hash exchange allowed is the final aggregation's
    assert(exchanges(plan) <= 1,
      s"bucketed join must not shuffle either side:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a merge join over bucket-aligned scans:\n$plan")
    // bucket pruning metadata visible in the scan
    assert(plan.contains("Bucketed: true"),
      s"scans must read bucketed layout:\n$plan")
  }

  test("R52: the plain-parquet shape pays the exchanges bucketing deletes") {
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"))
    plain.collect()
    val plan = plain.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // at sf0.001 AQE may broadcast one side instead of shuffling both —
    // either way the plan carries exchange machinery the bucketed one lacks
    assert(exchanges(plan) >= 2 || plan.contains("BroadcastExchange"),
      s"plain join should shuffle or broadcast:\n$plan")
  }

  test("R52: bucketed results equal the plain-parquet join") {
    val bkt = Bucketed.joinAgg(spark, sf)
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity").cast("decimal(38,6)")), 4)
          .cast("double").as("sum_qty"))
      .orderBy("o_orderpriority")
    assert(bkt.exceptAll(plain).count() === 0 &&
           plain.exceptAll(bkt).count() === 0)
  }
}
