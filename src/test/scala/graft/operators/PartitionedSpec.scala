package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** R36 — dynamic partition pruning evidence: the selective dim
  * predicate must reach the partitioned fact scan as a runtime
  * PartitionFilter (not a full enumerate-then-filter), and the pruned
  * plan must agree with the unpartitioned equivalent. */
class PartitionedSpec extends SparkSpec {

  test("DPP injects a dynamicpruning partition filter into the fact scan") {
    val df = Partitioned.dppAggregate(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamicpruning in PartitionFilters:\n$plan")
    // The pruning expression must sit on the partition column of the
    // fact scan, not as a post-scan filter.
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters", 2)(1).contains("dynamicpruning"),
      s"dynamicpruning must be a PartitionFilter:\n$plan")
  }

  test("pruned aggregate equals the unpartitioned equivalent") {
    val pruned = Partitioned.dppAggregate(spark, sf).collect()
    val direct = Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .filter(col("o_year") % 5 === 0)
      .groupBy("o_year")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(38,6)")), 4)
          .cast("double").as("sum_price"))
      .orderBy("o_year")
      .collect()
    assert(pruned.toSeq === direct.toSeq)
    assert(pruned.nonEmpty)
  }
}
