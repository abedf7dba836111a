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
    // The pruning expression must sit INSIDE a PartitionFilters
    // bracket of a scan (the fact side — the dim has no partitions),
    // not merely appear somewhere after the token as a post-scan
    // Filter would.
    assert("PartitionFilters: \\[[^\\]]*dynamicpruning".r
      .findFirstIn(plan).isDefined,
      s"dynamicpruning must be inside a PartitionFilters bracket:\n$plan")
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
