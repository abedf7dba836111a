package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational / analytic operator inventory (SURVEY.md §2.2) over the
  * TPC-H-ish tables. Each query is a declarative DataFrame plan —
  * Catalyst handles pushdown, pruning and join planning; broadcast
  * hints mark ONLY true dimension sides (nation/region — fixed 25/5
  * rows) so the plan stays shuffle-light yet OOM-safe at 100 TB
  * fact-table scale; sf-proportional tables join via shuffle and AQE
  * may downgrade to broadcast at runtime when sizes allow.
  *
  * Correctness conventions (SURVEY.md §6): every computed column is
  * aliased identically in Spark and DuckDB SQL; double sums are
  * accumulated in exact DECIMAL(38,6) (order-independent — immune to
  * partial-aggregation summation order) then ROUND(·,4) and cast back
  * to double on both sides; every query has a total deterministic
  * ORDER BY.
  */
object Relational {

  /** Exact decimal sum of a double expression: per-element cast is
    * deterministic, decimal addition is associative/commutative, so the
    * result is independent of partitioning — unlike double sums whose
    * last-ulp noise flips ROUND boundaries between engines. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(38,6)"))

  /** Rounded stable sum, emitted as double (matches the oracle's
    * CAST(ROUND(SUM(CAST(x AS DECIMAL(38,6))), 4) AS DOUBLE)). */
  private def rsum(c: Column): Column = round(dsum(c), 4).cast("double")

  /** Stable mean: exact decimal sum → double, divided by count. */
  private def ravg(c: Column): Column =
    round(dsum(c).cast("double") / count(c), 4)

  /** Oracle-side SQL for rsum / ravg. */
  private def oSum(expr: String): String =
    s"CAST(ROUND(SUM(CAST(($expr) AS DECIMAL(38,6))), 4) AS DOUBLE)"
  private def oAvg(expr: String): String =
    s"ROUND(CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS DOUBLE) / COUNT($expr), 4)"

  /** R1: scan + filter + projection. Both predicate and projection must
    * reach the parquet reader (PushedFilters / ReadSchema). */
  val qScanPushdown = QueryDef(
    "q_scan_pushdown",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp") &&
          col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '2001-01-01' AND l_returnflag = 'R'
            ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice"""))

  /** R2: TPC-H Q1 pricing summary — multi-aggregate groupBy with
    * map-side partial aggregation (one shuffle of 6 groups). */
  val q1PricingSummary = QueryDef(
    "q1_pricing_summary",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          rsum(col("l_quantity")).as("sum_qty"),
          rsum(col("l_extendedprice")).as("sum_base_price"),
          rsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          rsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          ravg(col("l_quantity")).as("avg_qty"),
          ravg(col("l_extendedprice")).as("avg_price"),
          ravg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
              ${oSum("l_quantity")} AS sum_qty,
              ${oSum("l_extendedprice")} AS sum_base_price,
              ${oSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
              ${oSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
              ${oAvg("l_quantity")} AS avg_qty,
              ${oAvg("l_extendedprice")} AS avg_price,
              ${oAvg("l_discount")} AS avg_disc,
              COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** R3: TPC-H Q3 shipping priority — selective dim filter, 3-way join,
    * agg, top-k. Both orders and customer are sf-proportional, so no
    * forced broadcast hints: lineitem⋈orders and ⋈customer plan as
    * shuffled joins and AQE downgrades to broadcast at runtime only
    * when the built side actually fits. */
  val q3ShippingPriority = QueryDef(
    "q3_shipping_priority",
    (s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(rsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast("date").as("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT l_orderkey,
              ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue,
              CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-03-15'
              AND l_shipdate  > TIMESTAMP '1998-03-15'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10"""))

  /** R4: multi-way join through the full dimension chain
    * (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region).
    * Only nation (25 rows) and region (5 rows) are true fixed-size
    * dimensions → broadcast; orders/customer/supplier grow with sf and
    * join via shuffle (AQE may still pick broadcast at runtime). */
  val q5LocalSupplier = QueryDef(
    "q5_local_supplier",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(rsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },
    Some(s"""SELECT r_name, n_name,
              ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue,
              COUNT(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY r_name, n_name
            ORDER BY r_name, n_name"""))

  /** R5: explicit broadcast dim join (no shuffle on the fact side). */
  val qBroadcastJoin = QueryDef(
    "q_broadcast_join",
    (s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"), rsum(col("c_acctbal")).as("total_bal"))
        .orderBy("n_name")
    },
    Some(s"""SELECT n_name, COUNT(*) AS n_customers,
              ${oSum("c_acctbal")} AS total_bal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name"""))

  /** R6: left-semi join (EXISTS). */
  val qSemiJoin = QueryDef(
    "q_semi_join",
    (s, d) => {
      val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      Tables.customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  /** R7: left-anti join (NOT EXISTS). Anti-joins against *urgent*
    * orders only, so the expected result is non-empty — an all-orders
    * anti-join returns 0 rows on this data and would vacuously match
    * any bug that yields empty output. */
  val qAntiJoin = QueryDef(
    "q_anti_join",
    (s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      Tables.customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  /** R8: window rank per group (top 3 orders by price per priority).
    * Rank compares raw parquet doubles — no fp arithmetic, exact.
    *
    * Two-phase top-k: a single window partitioned by the 5-value
    * priority key would funnel the whole table into 5 tasks. Phase 1
    * ranks within (input-partition, priority) — full parallelism, and
    * any row in the global top-3 is necessarily in its partition-local
    * top-3 (local rank ≤ global rank; ordering is a strict total order
    * thanks to the o_orderkey tiebreak). Phase 2 re-ranks the surviving
    * ≤ 3·partitions rows per priority — trivially small. */
  val qWindowRank = QueryDef(
    "q_window_rank",
    (s, d) => {
      val ord = col("o_totalprice").desc
      val wLocal = Window.partitionBy(col("pid"), col("o_orderpriority"))
        .orderBy(ord, col("o_orderkey"))
      val wGlobal = Window.partitionBy(col("o_orderpriority"))
        .orderBy(ord, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("pid", spark_partition_id())
        .withColumn("lrnk", rank().over(wLocal))
        .filter(col("lrnk") <= 3)
        .withColumn("rnk", rank().over(wGlobal))
        .filter(col("rnk") <= 3)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
        .orderBy("o_orderpriority", "rnk", "o_orderkey")
    },
    Some("""SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
              SELECT o_orderpriority, o_orderkey, o_totalprice,
                     RANK() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rnk
              FROM orders) t
            WHERE rnk <= 3
            ORDER BY o_orderpriority, rnk, o_orderkey"""))

  /** R9: running sum window (cumulative revenue per customer over
    * order date). Integer-exact frame; doubles rounded. */
  val qWindowRunning = QueryDef(
    "q_window_running",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_total",
          round(sum(col("o_totalprice").cast("decimal(38,6)")).over(w), 4).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_total
            FROM orders
            ORDER BY o_custkey, o_orderkey"""))

  /** R10: distinct aggregation. */
  val qCountDistinct = QueryDef(
    "q_count_distinct",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust,
              COUNT(*) AS n_orders
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** R11: conditional aggregation (CASE WHEN pivot-style). */
  val qConditionalAgg = QueryDef(
    "q_conditional_agg",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("n_high_disc"),
          rsum(when(col("l_tax") > 0.04, col("l_extendedprice")).otherwise(0.0)).as("taxed_price"),
          rsum(when(col("l_linestatus") === "F", col("l_quantity")).otherwise(0.0)).as("qty_f"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag,
              CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc,
              ${oSum("CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0.0 END")} AS taxed_price,
              ${oSum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END")} AS qty_f
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** R12: global sort + limit (top-k) — Spark plans TakeOrderedAndProject,
    * no full sort materialization. */
  val qTopK = QueryDef(
    "q_topk",
    (s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""))

  /** R13: rollup hierarchical aggregation. */
  val qRollup = QueryDef(
    "q_rollup",
    (s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), rsum(col("c_acctbal")).as("bal"))
        .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))
    },
    Some(s"""SELECT n_name, c_mktsegment, COUNT(*) AS n, ${oSum("c_acctbal")} AS bal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY ROLLUP(n_name, c_mktsegment)
            ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST"""))

  /** R14: exact percentiles (linear interpolation ≡ DuckDB
    * `quantile_cont`), computed by RANK ARITHMETIC over sorted windows
    * rather than the `percentile` aggregate: `percentile` buffers a
    * count-map of every distinct value per group per partition and
    * merges those maps — memory-unbounded in group size, an executor
    * OOM at 100 TB — while window sorts are spillable and scale with
    * the shuffle machinery. Probed at sf0.1: also slightly faster
    * (0.93 s vs 0.97 s combined-array / 1.67 s two-agg). The target
    * rank is 1+(n-1)p; rows at floor/ceil of any target survive the
    * filter (≤ 6 per group), and the tiny final agg interpolates
    * lo + (hi-lo)·frac — the same formula both engines use. */
  /** Exact p50(quantity)/p90/p99(price) per returnflag by rank
    * arithmetic — shared by the R14 oracle entry and the R25
    * self-verification baseline. */
  private def exactPercentiles(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
      val wq = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      val wp = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
      // same (partition, order) spec as wq with an unbounded frame, so
      // the group count shares wq's WindowExec pass instead of adding
      // a third one
      val wqAll = wq.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val ranked = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .withColumn("rq", row_number().over(wq))
        .withColumn("n", count(lit(1)).over(wqAll))
        .withColumn("rp", row_number().over(wp))
      def t(p: Double) = lit(1.0) + (col("n") - 1) * lit(p)
      val need = ranked.filter(
        col("rq") === floor(t(0.5)) || col("rq") === ceil(t(0.5)) ||
          col("rp") === floor(t(0.9)) || col("rp") === ceil(t(0.9)) ||
          col("rp") === floor(t(0.99)) || col("rp") === ceil(t(0.99)))
      def pick(rank: Column, p: Double, v: Column, side: Column => Column) =
        max(when(rank === side(t(p)), v))
      val agg = need.groupBy("l_returnflag").agg(
        first(col("n")).as("n"),
        pick(col("rq"), 0.5, col("l_quantity"), floor).as("q_lo"),
        pick(col("rq"), 0.5, col("l_quantity"), ceil).as("q_hi"),
        pick(col("rp"), 0.9, col("l_extendedprice"), floor).as("p90_lo"),
        pick(col("rp"), 0.9, col("l_extendedprice"), ceil).as("p90_hi"),
        pick(col("rp"), 0.99, col("l_extendedprice"), floor).as("p99_lo"),
        pick(col("rp"), 0.99, col("l_extendedprice"), ceil).as("p99_hi"))
      def interp(lo: String, hi: String, p: Double) = {
        val tt = lit(1.0) + (col("n") - 1) * lit(p)
        round(col(lo) + (col(hi) - col(lo)) * (tt - floor(tt)), 4)
      }
      agg.select(col("l_returnflag"),
        interp("q_lo", "q_hi", 0.5).as("med_qty"),
        interp("p90_lo", "p90_hi", 0.9).as("p90_price"),
        interp("p99_lo", "p99_hi", 0.99).as("p99_price"))
        .orderBy("l_returnflag")
  }

  /** R150 — exact WEIGHTED quantiles: the volume-weighted median/p90
    * of price with quantity as mass — "the price at which half the
    * VOLUME trades" (VWAP's quantile sibling), which R14's row-rank
    * arithmetic cannot express (a 50-unit line must count 50× a
    * 1-unit line). Definition: lower weighted quantile — the smallest
    * price whose cumulative weight reaches q·W. Both engines compute
    * the cumulative weight with the DEFAULT RANGE frame of an ordered
    * window, so price TIES share one cumulative value and the picked
    * price is tie-free by construction; the threshold compares are
    * pure integer (`cw·2 ≥ tot`, `cw·10 ≥ 9·tot`), and the picked
    * doubles are parquet values passed through untouched — no float
    * arithmetic anywhere. One window + one aggregation per group. */
  val qWeightedMedian = QueryDef(
    "q_weighted_median",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
      val wt = Window.partitionBy("l_returnflag")
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_quantity").cast("long").as("q"))
        .withColumn("cw", sum("q").over(w))
        .withColumn("tot", sum("q").over(wt))
        .groupBy("l_returnflag")
        .agg(
          min(when(col("cw") * 2 >= col("tot"), col("l_extendedprice")))
            .as("wmed_price"),
          min(when(col("cw") * 10 >= col("tot") * 9, col("l_extendedprice")))
            .as("wp90_price"),
          max("tot").as("total_weight"))
        .orderBy("l_returnflag")
    },
    Some("""WITH b AS (SELECT l_returnflag AS f, l_extendedprice AS p,
                    CAST(l_quantity AS BIGINT) AS q FROM lineitem),
            c AS (SELECT f, p,
                    SUM(q) OVER (PARTITION BY f ORDER BY p) AS cw,
                    SUM(q) OVER (PARTITION BY f) AS tot
                  FROM b)
            SELECT f AS l_returnflag,
                   MIN(CASE WHEN cw * 2 >= tot THEN p END) AS wmed_price,
                   MIN(CASE WHEN cw * 10 >= tot * 9 THEN p END)
                     AS wp90_price,
                   CAST(MAX(tot) AS BIGINT) AS total_weight
            FROM c GROUP BY f ORDER BY f"""))

  val qPercentiles = QueryDef(
    "q_percentiles",
    (s, d) => exactPercentiles(s, d),
    Some("""SELECT l_returnflag,
              ROUND(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
              ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
              ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** R15: union + dedup. */
  val qUnionDedup = QueryDef(
    "q_union_dedup",
    (s, d) => {
      val a = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      a.union(b).distinct().orderBy("custkey")
    },
    Some("""SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
            UNION
            SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
            ORDER BY custkey"""))

  /** R16: scalar string/date functions (codegen'd builtins, no UDFs). */
  val qScalarFuncs = QueryDef(
    "q_scalar_funcs",
    (s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type5"),
          concat(col("p_brand"), lit("-"), col("p_size").cast("string")).as("brand_size"),
          (col("p_size") % 7).as("size_mod"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, UPPER(p_brand) AS brand_u, LENGTH(p_name) AS name_len,
              SUBSTR(p_type, 1, 5) AS type5,
              CONCAT(p_brand, '-', CAST(p_size AS VARCHAR)) AS brand_size,
              p_size % 7 AS size_mod
            FROM part ORDER BY p_partkey"""))

  /** R17: as-of join — for each purchase event, the most recent 'view'
    * event of the same user at-or-before its timestamp. Implemented
    * shuffle-once: tag + union + last(ignoreNulls) window ordered by
    * (ts, side) — views sort before purchases at equal ts so the join
    * is inclusive, matching DuckDB ASOF (>=) semantics. Linear work,
    * single hash-partition by user — no per-user cross product. */
  val qAsofJoin = QueryDef(
    "q_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          lit(0).as("side"), col("event_id").as("view_event_id"),
          lit(null).cast("long").as("purchase_event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          lit(1).as("side"), lit(null).cast("long").as("view_event_id"),
          col("event_id").as("purchase_event_id"))
      // Full microsecond precision for the as-of comparison (events
      // carry sub-ms timestamps); views sort before purchases at equal
      // ts so the join is inclusive (view.ts <= purchase.ts), and ties
      // among equal-ts views break on the larger view_event_id.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("side"), col("view_event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      views.union(purchases)
        .withColumn("matched_view", last(col("view_event_id"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("purchase_event_id"), col("user_id"),
          expr("us div 1000").as("purchase_ms"),
          col("matched_view").as("view_event_id"))
        .orderBy("purchase_event_id")
    },
    // Deterministic oracle: DuckDB ASOF leaves the equal-ts tie choice
    // unspecified, so spell the as-of out as a correlated argmax with
    // an explicit (ts, event_id) tie-break matching the window above.
    Some("""SELECT p.event_id AS purchase_event_id, p.user_id,
              epoch_ms(p.ts) AS purchase_ms,
              (SELECT v.event_id FROM events v
               WHERE v.event_type = 'view' AND v.user_id = p.user_id
                 AND v.ts <= p.ts
               ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_event_id
            FROM events p WHERE p.event_type = 'purchase'
            ORDER BY purchase_event_id"""))

  /** R62 — NEAREST as-of join (both directions): each purchase matches
    * the view closest in absolute time, backward or forward — the
    * sensor-alignment / nearest-reading variant R17's backward-only
    * as-of can't express (a reading 1 s later beats one 2 h earlier).
    * Same single user-keyed window shuffle as R17: ONE union + two
    * frames over one ordering (backward last / forward first, both
    * ignoreNulls), then a map-side distance compare. Ties: equal
    * distance prefers the BACKWARD match (already-observed data);
    * equal-ts candidates keep R17's id rules (backward largest,
    * forward smallest). */
  val qAsofNearest = QueryDef(
    "q_asof_nearest",
    (s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          lit(0).as("side"), col("event_id").as("view_event_id"),
          lit(null).cast("long").as("purchase_event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          lit(1).as("side"), lit(null).cast("long").as("view_event_id"),
          col("event_id").as("purchase_event_id"))
      val ord = Seq(col("us"), col("side"), col("view_event_id"))
      val wBack = Window.partitionBy(col("user_id")).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFwd = Window.partitionBy(col("user_id")).orderBy(ord: _*)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val vStruct = when(col("side") === 0,
        struct(col("us").as("vus"), col("view_event_id").as("vid")))
      val picked = views.union(purchases)
        .withColumn("vb", last(vStruct, ignoreNulls = true).over(wBack))
        .withColumn("vf", first(vStruct, ignoreNulls = true).over(wFwd))
        .filter(col("side") === 1)
        .withColumn("d_b", col("us") - col("vb.vus"))
        .withColumn("d_f", col("vf.vus") - col("us"))
        .withColumn("use_back",
          col("vb").isNotNull &&
            (col("vf").isNull || col("d_b") <= col("d_f")))
      picked.select(
          col("purchase_event_id"), col("user_id"),
          when(col("use_back"), col("vb.vid")).otherwise(col("vf.vid"))
            .as("view_event_id"),
          when(col("vb").isNull && col("vf").isNull, lit(null).cast("string"))
            .when(col("use_back"), lit("back")).otherwise(lit("fwd"))
            .as("dir"),
          when(col("use_back"), col("d_b")).otherwise(col("d_f"))
            .as("dist_us"))
        .orderBy("purchase_event_id")
    },
    Some("""SELECT p.event_id AS purchase_event_id, p.user_id,
              m.view_event_id, m.dir, m.dist_us
            FROM events p LEFT JOIN LATERAL (
              SELECT v.event_id AS view_event_id,
                CASE WHEN v.ts <= p.ts
                  THEN epoch_us(p.ts) - epoch_us(v.ts)
                  ELSE epoch_us(v.ts) - epoch_us(p.ts) END AS dist_us,
                CASE WHEN v.ts <= p.ts THEN 'back' ELSE 'fwd' END AS dir
              FROM events v
              WHERE v.event_type = 'view' AND v.user_id = p.user_id
              ORDER BY dist_us,
                CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END,
                CASE WHEN v.ts <= p.ts THEN -v.event_id
                     ELSE v.event_id END
              LIMIT 1) m ON TRUE
            WHERE p.event_type = 'purchase'
            ORDER BY purchase_event_id"""))

  /** R18: higher-order array aggregation (codegen'd, no UDF):
    * L2 norm and mean over the embedding array, accumulated in double. */
  val qVectorAgg = QueryDef(
    "q_vector_agg",
    (s, d) => {
      val emb = col("embedding").cast("array<double>")
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          round(sqrt(aggregate(emb, lit(0.0),
            (acc, x) => acc + x * x)), 6).as("l2_norm"),
          round(aggregate(emb, lit(0.0), (acc, x) => acc + x) / size(col("embedding")), 6).as("mean_val"))
        .orderBy("vec_id")
    },
    Some("""SELECT vec_id,
              ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm,
              ROUND(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding), 6) AS mean_val
            FROM embeddings ORDER BY vec_id"""))

  /** R19: approximate count-distinct (HLL sketch). Engine-specific
    * estimates → no cross-engine oracle, so the entry is
    * SELF-VERIFYING: it emits the exact distinct count alongside the
    * sketch estimate and their relative error, so the CORRECTNESS row
    * carries its own evidence; the spec bounds abs_rel_err < 0.05
    * (rsd = 0.02 — HLL error is deterministic for fixed data, and the
    * observed error is ~1% at every test sf, so the bound is stable). */
  val qApproxDistinct = QueryDef(
    "q_approx_distinct",
    (s, d) => {
      val li = Tables.lineitem(s, d).select("l_returnflag", "l_partkey")
      // exact distinct as a two-stage aggregation (partial-aggregatable
      // both stages) joined with the separate HLL pass — mixing
      // countDistinct and approx_count_distinct in ONE agg makes
      // Catalyst plan an Expand that doubles every input row
      val exact = li.groupBy("l_returnflag", "l_partkey")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("exact_parts"), sum("cnt").as("n"))
      val approx = li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      exact.join(approx, "l_returnflag")
        .withColumn("abs_rel_err",
          round(abs(col("approx_parts") - col("exact_parts"))
            / col("exact_parts"), 6))
        .select("l_returnflag", "exact_parts", "approx_parts", "n", "abs_rel_err")
        .orderBy("l_returnflag")
    },
    None)

  /** R20: pivot (long→wide). Spark's pivot IS conditional aggregation
    * under the hood — one groupBy shuffle with map-side partials, no
    * extra pass per pivot value; the oracle spells the same shape out
    * as CASE sums. Explicit pivot values keep the plan static (no
    * values-discovery job) — the production shape when the domain is
    * known. */
  val qPivot = QueryDef(
    "q_pivot",
    (s, d) => Tables.orders(s, d)
      .select(year(col("o_orderdate")).as("yr"), col("o_orderstatus"),
        col("o_totalprice"))
      .groupBy("yr")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(rsum(col("o_totalprice")))
      .select(col("yr"), col("F").as("f_total"), col("O").as("o_total"),
        col("P").as("p_total"))
      .orderBy("yr"),
    Some(s"""SELECT EXTRACT(year FROM o_orderdate) AS yr,
              ${oSum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS f_total,
              ${oSum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS o_total,
              ${oSum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS p_total
            FROM orders GROUP BY 1 ORDER BY yr"""))

  /** R21: cube + grouping_id — all four grouping-set combinations in
    * one aggregation (Expand ×4 then a single shuffle); grouping_id
    * disambiguates real NULL keys from rolled-up ones, mirrored by
    * DuckDB's GROUPING bitmask. */
  val qCubeGrouping = QueryDef(
    "q_cube_grouping",
    (s, d) => Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .cube(col("n_name"), col("c_mktsegment"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        rsum(col("c_acctbal")).as("bal"))
      .orderBy(col("gid"), asc_nulls_first("n_name"),
        asc_nulls_first("c_mktsegment")),
    Some(s"""SELECT n_name, c_mktsegment,
               CAST(GROUPING(n_name, c_mktsegment) AS BIGINT) AS gid,
               COUNT(*) AS n, ${oSum("c_acctbal")} AS bal
             FROM customer JOIN nation ON c_nationkey = n_nationkey
             GROUP BY CUBE(n_name, c_mktsegment)
             ORDER BY gid, n_name NULLS FIRST, c_mktsegment NULLS FIRST"""))

  /** R22: per-key sequence window functions (lag / lead / first_value /
    * ntile) in ONE window pass — all four share the same (partition,
    * order) spec, so Spark plans a single sort + WindowExec, one keyed
    * shuffle. No arithmetic is performed on the values, so doubles
    * round-trip exactly. */
  val qWindowFuncs = QueryDef(
    "q_window_funcs",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("prev_price", lag("o_totalprice", 1).over(w))
        .withColumn("next_price", lead("o_totalprice", 1).over(w))
        .withColumn("first_price", first(col("o_totalprice")).over(w))
        .withColumn("quartile", ntile(4).over(w))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
              LAG(o_totalprice, 1) OVER w AS prev_price,
              LEAD(o_totalprice, 1) OVER w AS next_price,
              FIRST_VALUE(o_totalprice) OVER w AS first_price,
              NTILE(4) OVER w AS quartile
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  /** R23: range join (point-in-interval, NO equi key) via
    * [[RangeJoin.bucketed]] — every 200th event opens a 6-hour window,
    * all events fall into windows by time alone. The bucketed plan is
    * an equi-join on 6-hour buckets (shuffle-partitionable), not the
    * naive BroadcastNestedLoopJoin; the spec asserts parity with the
    * naive theta join and the absence of BNLJ. ts is emitted as epoch
    * micros so DuckDB's nanosecond timestamps collate exactly. */
  val qRangeJoin = QueryDef(
    "q_range_join",
    (s, d) => {
      val windows = Tables.events(s, d)
        .filter(col("event_id") % 200 === 0)
        .select(col("event_id").as("window_id"), col("ts").as("start_ts"),
          expr("ts + INTERVAL 6 HOUR").as("end_ts"))
      val points = Tables.events(s, d).select("event_id", "ts")
      RangeJoin.bucketed(points, "ts", windows, "start_ts", "end_ts", 21600L)
        .select(col("event_id"), col("window_id"),
          unix_micros(col("ts")).as("ts_us"))
        .orderBy("event_id", "window_id")
    },
    Some("""WITH w AS (
              SELECT event_id AS window_id, ts AS start_ts,
                     ts + INTERVAL 6 HOUR AS end_ts
              FROM events WHERE event_id % 200 = 0)
            SELECT e.event_id, w.window_id, epoch_us(e.ts) AS ts_us
            FROM events e JOIN w
              ON epoch_us(e.ts) >= epoch_us(w.start_ts)
             AND epoch_us(e.ts) < epoch_us(w.end_ts)
            ORDER BY event_id, window_id"""))

  /** R148: the SAME point-in-interval query as R23, written in its
    * NATURAL theta-join form and rewritten to the bucketed equi-join
    * by the injected Catalyst optimizer rule
    * ([[graft.plans.RangeJoinRewrite]]) instead of by hand — the
    * tier-(c) extension path: users keep the declarative predicate,
    * the rule supplies the 100 TB plan. The entry runs on a child
    * session (`newSession` — same context and extensions, isolated
    * conf) so the opt-in width knob never leaks into other entries;
    * RangeJoinRewriteSpec proves plan shape, bit-identical results
    * vs the naive nested loop, strict/non-strict/NULL exactness, and
    * that equi-keyed joins are left untouched. */
  val qRangeJoinRewrite = QueryDef(
    "q_range_join_rewrite",
    (s0, d) => {
      val s = s0.newSession()
      s.conf.set("spark.graft.rangeJoin.bucketWidth",
        (21600L * 1000000L).toString)
      val ev = Tables.events(s, d)
      val windows = ev.filter(col("event_id") % 200 === 0)
        .select(col("event_id").as("window_id"),
          unix_micros(col("ts")).as("s_us"),
          unix_micros(expr("ts + INTERVAL 6 HOUR")).as("e_us"))
      val points = ev.select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
      points.join(windows,
          col("ts_us") >= col("s_us") && col("ts_us") < col("e_us"))
        .select("event_id", "window_id", "ts_us")
        .orderBy("event_id", "window_id")
    },
    Some("""WITH w AS (
              SELECT event_id AS window_id, epoch_us(ts) AS s_us,
                     epoch_us(ts + INTERVAL 6 HOUR) AS e_us
              FROM events WHERE event_id % 200 = 0)
            SELECT e.event_id, w.window_id, epoch_us(e.ts) AS ts_us
            FROM events e JOIN w
              ON epoch_us(e.ts) >= w.s_us AND epoch_us(e.ts) < w.e_us
            ORDER BY event_id, window_id"""))

  /** R24: salted skew join in the correctness gate — the salted plan's
    * result must be EXACTLY the plain join's (the oracle is the plain
    * SQL join). Salting is the static fallback for keys too hot for
    * one reducer even after AQE's skew split. */
  val qSaltedJoin = QueryDef(
    "q_salted_join",
    (s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey").as("nationkey"),
          col("c_acctbal"))
      val nat = Tables.nation(s, d)
        .select(col("n_nationkey").as("nationkey"), col("n_name"))
      Skew.saltedJoin(cust, nat, "nationkey", factor = 8)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), rsum(col("c_acctbal")).as("bal"))
        .orderBy("n_name")
    },
    Some(s"""SELECT n_name, COUNT(*) AS n, ${oSum("c_acctbal")} AS bal
             FROM customer JOIN nation ON c_nationkey = n_nationkey
             GROUP BY n_name ORDER BY n_name"""))

  /** R25: approximate percentiles (the 100 TB shape — R14's exact rank
    * arithmetic costs full sorts; the KLL/GK-style sketch behind
    * approx_percentile is one pass, mergeable, bounded memory).
    * Engine-specific sketch → no cross-engine oracle; SELF-VERIFYING
    * like R19: emits the exact values alongside the sketch values and
    * their relative errors, spec-bounded. */
  private def approxPercentiles(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    Tables.lineitem(s, d).groupBy("l_returnflag").agg(
      round(expr("approx_percentile(l_quantity, 0.5, 10000)"), 4)
        .as("approx_med_qty"),
      round(expr("approx_percentile(l_extendedprice, 0.9, 10000)"), 4)
        .as("approx_p90_price"),
      round(expr("approx_percentile(l_extendedprice, 0.99, 10000)"), 4)
        .as("approx_p99_price"))

  /** Production entry: the one-pass sketch aggregation alone. The
    * exact baselines live in [[qApproxPercentileEval]] — the r13
    * `spark.graft.svBaselines` mode fork is gone (r14): bench, verify
    * and the specs all execute the same declared bodies. */
  val qApproxPercentile = QueryDef(
    "q_approx_percentile",
    (s, d) => approxPercentiles(s, d).orderBy("l_returnflag"),
    None)

  /** Eval companion: joins the exact rank-arithmetic percentiles into
    * the sketch answers and emits the relative errors the spec bounds
    * — the evidence the sketch entry's SELF-VERIFYING status rests on,
    * now a declared entry of its own instead of a conf-gated branch. */
  val qApproxPercentileEval = QueryDef(
    "q_approx_percentile_eval",
    (s, d) => {
      def err(a: String, e: String) =
        round(abs(col(a) - col(e)) / col(e), 6)
      exactPercentiles(s, d).join(approxPercentiles(s, d), "l_returnflag")
        .withColumn("med_rel_err", err("approx_med_qty", "med_qty"))
        .withColumn("p90_rel_err", err("approx_p90_price", "p90_price"))
        .withColumn("p99_rel_err", err("approx_p99_price", "p99_price"))
        .orderBy("l_returnflag")
    },
    None)

  /** R26: full outer join with null-producing sides on BOTH ends (the
    * customer subset drops rows that have orders; order keys without a
    * surviving customer row appear null-left). Coalesced key keeps the
    * output totally ordered. */
  val qOuterJoin = QueryDef(
    "q_outer_join",
    (s, d) => {
      val custSub = Tables.customer(s, d)
        .filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_acctbal"))
      val ordAgg = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), rsum(col("o_totalprice")).as("total"))
      custSub.join(ordAgg, custSub("c_custkey") === ordAgg("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_acctbal"), col("n_orders"), col("total"))
        .orderBy("custkey")
    },
    Some(s"""WITH cs AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000),
             oa AS (SELECT o_custkey, COUNT(*) AS n_orders,
                      ${oSum("o_totalprice")} AS total
                    FROM orders GROUP BY o_custkey)
             SELECT COALESCE(c_custkey, o_custkey) AS custkey,
                    c_acctbal, n_orders, total
             FROM cs FULL OUTER JOIN oa ON c_custkey = o_custkey
             ORDER BY custkey"""))

  /** R27: time-range window frame — per-user moving 1-hour sum/count
    * over event time (RANGE frame on epoch micros, not a row frame:
    * the window is defined by TIME, so gaps and bursts are handled
    * correctly). Decimal accumulation keeps the moving sum
    * order-independent across engines. */
  val qSlidingWindow = QueryDef(
    "q_sliding_window",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .withColumn("hour_sum",
          round(sum(col("value").cast("decimal(38,6)")).over(w), 4).cast("double"))
        .withColumn("hour_n", count(lit(1)).over(w))
        .orderBy("user_id", "ts_us", "event_id")
    },
    Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))) OVER w, 4) AS DOUBLE) AS hour_sum,
              COUNT(*) OVER w AS hour_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            ORDER BY user_id, ts_us, event_id"""))

  /** R27b: the SAME moving 1-hour sum/count, computed BUCKET-PARALLEL
    * — the hot-key form of R27. A per-user RANGE window puts a user's
    * whole event history in ONE task; the r9 skew sweep measured the
    * 4%-hot-user corpus at 3.9× the uniform cost (one straggler task
    * scanning 200k rows while siblings hold ~25). Decompose instead:
    * with bucket width = the window width W, the frame [t−W, t] spans
    * exactly the row's own bucket (a PREFIX ending at t — every own-
    * bucket row is > t−W by construction) and the previous bucket (a
    * SUFFIX starting at t−W — every such row is ≤ t). The prefix is a
    * window over (user, bucket); the suffix is the same union-a-probe
    * trick as the R23 range join: each row plants a zero-value probe
    * at (bucket−1, t−W) and reads the running suffix sum there. The
    * hot user now spreads across its ~720 hour-buckets — partitions
    * are bounded by burst-per-hour, not by history length. Costs one
    * extra shuffle + an event_id join-back vs R27; wins whenever one
    * key's history dominates a task (the measured 3.9× at 4% hot).
    * Decimal(38,6) partial sums keep the split exactly associative, so
    * the oracle is R27's, verbatim. */
  val qSlidingWindowBlocked = QueryDef(
    "q_sliding_window_blocked",
    (s, d) => {
      val W = 3600L * 1000000L
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
      val base = ev.withColumn("bucket", floor(col("ts_us") / W))
      // cnt is the COUNT(*) indicator: non-null exactly on data rows,
      // so count(cnt) matches the oracle's COUNT(*) even when value
      // itself is NULL (count(v) would skip null-valued events)
      val data = base.select(col("event_id"), col("user_id"),
        col("bucket"), col("ts_us"), col("value"),
        col("value").cast("decimal(38,6)").as("v"),
        lit(1).cast("int").as("cnt"), lit(0).as("probe"))
      // probe rows: v and cnt = null so they never sum nor count,
      // positioned at the frame's lower bound inside the PREVIOUS bucket
      val probes = base.select(col("event_id"), col("user_id"),
        (col("bucket") - 1).as("bucket"), (col("ts_us") - W).as("ts_us"),
        col("value"), lit(null).cast("decimal(38,6)").as("v"),
        lit(null).cast("int").as("cnt"), lit(1).as("probe"))
      // both frames share ONE partitioning+ordering, so Catalyst fuses
      // them into a single Window operator over one exchange; each
      // row's two halves (its own data row's prefix, its probe row's
      // suffix) then meet in ONE groupBy(event_id) — 2 exchanges of 2N
      // rows total, vs 4 for the naive union-window + prefix-window +
      // two-sided join-back formulation
      val wPre = Window.partitionBy("user_id", "bucket").orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wSuf = Window.partitionBy("user_id", "bucket").orderBy("ts_us")
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
      // SUM null semantics must survive the split: a single SUM over
      // the whole frame is null iff NO non-null value exists in it, so
      // the recombined sum coalesces each half to 0 and emits null only
      // when BOTH halves are null — coalescing just one side would
      // return null whenever the other half happened to be all-null
      val zero = lit(0).cast("decimal(38,6)")
      data.unionByName(probes)
        .withColumn("pre_sum", sum("v").over(wPre))
        .withColumn("pre_n", count(col("cnt")).over(wPre))
        .withColumn("suf_sum", sum("v").over(wSuf))
        .withColumn("suf_n", count(col("cnt")).over(wSuf))
        .groupBy("event_id")
        .agg(
          max(when(col("probe") === 0,
            struct(col("user_id"), col("ts_us"), col("value"),
              col("pre_sum"), col("pre_n")))).as("d"),
          max(when(col("probe") === 1,
            struct(col("suf_sum").as("suf_sum"),
              col("suf_n").as("suf_n")))).as("p"))
        .select(col("event_id"), col("d.user_id").as("user_id"),
          col("d.ts_us").as("ts_us"), col("d.value").as("value"),
          round(when(col("d.pre_sum").isNull && col("p.suf_sum").isNull,
              lit(null).cast("decimal(38,6)"))
            .otherwise(coalesce(col("d.pre_sum"), zero) +
              coalesce(col("p.suf_sum"), zero)), 4).cast("double")
            .as("hour_sum"),
          (col("d.pre_n") + col("p.suf_n")).as("hour_n"))
        .orderBy("user_id", "ts_us", "event_id")
    },
    Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))) OVER w, 4) AS DOUBLE) AS hour_sum,
              COUNT(*) OVER w AS hour_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            ORDER BY user_id, ts_us, event_id"""))

  /** R28: set operations — INTERSECT and EXCEPT (set semantics, i.e.
    * distinct) in one tagged output. Both plan as aggregations/joins
    * on the full row, one shuffle each. */
  val qSetOps = QueryDef(
    "q_set_ops",
    (s, d) => {
      val a = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      a.intersect(b).withColumn("op", lit("intersect"))
        .union(a.except(b).withColumn("op", lit("except")))
        .orderBy("op", "custkey")
    },
    Some("""WITH a AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
                 b AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
            SELECT custkey, 'intersect' AS op FROM (SELECT custkey FROM a INTERSECT SELECT custkey FROM b)
            UNION ALL
            SELECT custkey, 'except' AS op FROM (SELECT custkey FROM a EXCEPT SELECT custkey FROM b)
            ORDER BY op, custkey"""))

  /** R29: the spark.sql(...) surface — correlated EXISTS plus a scalar
    * subquery through the SQL parser/analyzer (every other entry is
    * DataFrame API; a reference user writing SQL strings needs this
    * path gated too). The scalar subquery uses MAX (order-independent)
    * so the threshold is engine-invariant. */
  val qSqlSurface = QueryDef(
    "q_sql_surface",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""SELECT c_custkey, c_acctbal FROM customer_v c
               WHERE EXISTS (SELECT 1 FROM orders_v o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_totalprice > 200000)
                 AND c_acctbal > (SELECT MAX(c_acctbal) - 5000 FROM customer_v)
               ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, c_acctbal FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 200000)
              AND c_acctbal > (SELECT MAX(c_acctbal) - 5000 FROM customer)
            ORDER BY c_custkey"""))

  /** R49: null-safe equi join (`<=>` / IS NOT DISTINCT FROM) — the
    * dimension-with-unknown-key reconciliation shape: a plain equi
    * join silently DROPS null-keyed rows from both sides; the
    * null-safe operator matches the two NULL groups, so "unknown"
    * buckets reconcile instead of vanishing. Aggregated per key before
    * joining, so the NULL groups meet as one row each (no null-group
    * cross blow-up), and the join still hash-partitions on the key. */
  val qNullsafeJoin = QueryDef(
    "q_nullsafe_join",
    (s, d) => {
      val a = Tables.customer(s, d)
        .select(expr("nullif(c_nationkey % 7, 3)").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n_cust"))
      val b = Tables.supplier(s, d)
        .select(expr("nullif(s_nationkey % 7, 3)").as("k2"))
        .groupBy("k2").agg(count(lit(1)).as("n_supp"))
      a.join(b, col("k") <=> col("k2"), "full")
        .select(col("k").as("bucket"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(asc_nulls_first("bucket"))
    },
    Some("""WITH a AS (SELECT nullif(c_nationkey % 7, 3) AS k, count(*) AS n_cust
                       FROM customer GROUP BY 1),
             b AS (SELECT nullif(s_nationkey % 7, 3) AS k, count(*) AS n_supp
                   FROM supplier GROUP BY 1)
            SELECT a.k AS bucket,
                   COALESCE(a.n_cust, 0) AS n_cust,
                   COALESCE(b.n_supp, 0) AS n_supp
            FROM a FULL JOIN b ON a.k IS NOT DISTINCT FROM b.k
            ORDER BY bucket NULLS FIRST"""))

  /** R48: time-series gap fill — join the fact against a generated
    * calendar spine so EVERY (group, day) exists, zero-filling counts
    * and forward-filling the last known daily value (last_value IGNORE
    * NULLS). The spine is O(calendar-days × groups), bounded by time
    * not data, so the grid side broadcasts and the fill window scans
    * each group's days once; days before a group's first observation
    * stay NULL (no value to carry). Forward-fill copies an
    * already-quantized double — no accumulation, so cross-engine
    * determinism is inherited from the daily aggregate. */
  val qGapfill = QueryDef(
    "q_gapfill",
    (s, d) => {
      val orders = Tables.orders(s, d)
      val daily = orders
        .groupBy(col("o_orderpriority").as("prio"), col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("n_day"), rsum(col("o_totalprice")).as("day_price"))
      val spine = orders
        .agg(min(col("o_orderdate")).as("lo"), max(col("o_orderdate")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val grid = spine.crossJoin(orders.select(col("o_orderpriority").as("prio")).distinct())
      grid.join(daily, Seq("prio", "day"), "left")
        .select(col("prio"), col("day"),
          coalesce(col("n_day"), lit(0L)).as("n_orders"),
          last(col("day_price"), ignoreNulls = true)
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("prio")).orderBy(col("day")))
            .as("filled_price"))
        .orderBy("prio", "day")
    },
    Some(s"""WITH b AS (SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi
                        FROM orders),
             spine AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                         CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
                       FROM b),
             prios AS (SELECT DISTINCT o_orderpriority AS prio FROM orders),
             daily AS (SELECT o_orderpriority AS prio, o_orderdate AS day,
                         count(*) AS n_day,
                         ${oSum("o_totalprice")} AS day_price
                       FROM orders GROUP BY 1, 2)
             SELECT g.prio, g.day,
                    COALESCE(d.n_day, 0) AS n_orders,
                    last_value(d.day_price IGNORE NULLS)
                      OVER (PARTITION BY g.prio ORDER BY g.day) AS filled_price
             FROM (SELECT p.prio, s.day FROM spine s, prios p) g
             LEFT JOIN daily d ON d.prio = g.prio AND d.day = g.day
             ORDER BY g.prio, g.day"""))

  /** R47: correlated LATERAL subquery with ORDER BY + LIMIT — the
    * per-row top-N SQL surface (SQL:1999 lateral derived tables).
    * Catalyst decorrelates this into a window-rank join, so the
    * executed plan is the scalable per-group top-k shape (R8), not a
    * per-outer-row re-execution — writing the natural SQL costs
    * nothing at 100 TB. Tiebreak on c_custkey keeps the top-2
    * deterministic. */
  val qLateralTopn = QueryDef(
    "q_lateral_topn",
    (s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("nation_lat_v")
      Tables.customer(s, d).createOrReplaceTempView("customer_lat_v")
      s.sql("""SELECT n.n_name, t.c_custkey, t.c_acctbal
               FROM nation_lat_v n,
               LATERAL (SELECT c_custkey, c_acctbal
                        FROM customer_lat_v c
                        WHERE c.c_nationkey = n.n_nationkey
                        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
               ORDER BY n_name, c_custkey""")
    },
    Some("""SELECT n.n_name, t.c_custkey, t.c_acctbal
            FROM nation n,
            LATERAL (SELECT c_custkey, c_acctbal
                     FROM customer c
                     WHERE c.c_nationkey = n.n_nationkey
                     ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
            ORDER BY n_name, c_custkey"""))

  /** R30: explicit GROUPING SETS — the asymmetric-set shape rollup and
    * cube can't express ((priority, status), (status), ()): one Expand
    * over exactly the three requested sets, one shuffle, grouping_id
    * disambiguating rolled-up NULLs, like R13/R21. Uses the native
    * Dataset.groupingSets API (Spark 4). */
  val qGroupingSets = QueryDef(
    "q_grouping_sets",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.groupingSets(
          Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          rsum(col("o_totalprice")).as("total"))
        .orderBy(col("gid"), asc_nulls_first("o_orderpriority"),
          asc_nulls_first("o_orderstatus"))
    },
    Some(s"""SELECT o_orderpriority, o_orderstatus,
               CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
               COUNT(*) AS n, ${oSum("o_totalprice")} AS total
             FROM orders
             GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                     (o_orderstatus), ())
             ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST"""))

  /** R31: bloom-filter runtime join pruning — dim-key bloom probed
    * map-side on the fact table BEFORE its join shuffle (see
    * [[Bloom.prunedSemiJoin]]). The oracle is the PLAIN semi join: the
    * bloom admits no false negatives and the exact semi join removes
    * its false positives, so pruned ≡ plain — oracle-gating the
    * rewrite's exactness the way R24 gates the salted join. */
  val qBloomJoin = QueryDef(
    "q_bloom_join",
    (s, d) => {
      val dim = Tables.orders(s, d).filter(col("o_totalprice") > 495000)
      Bloom.prunedSemiJoin(Tables.lineitem(s, d), dim, "l_orderkey", "o_orderkey")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_totalprice > 495000)
            ORDER BY l_orderkey, l_linenumber"""))

  /** R32: argmax/argmin aggregates — max_by/min_by (DuckDB
    * arg_max/arg_min), the "which row wins per group" shape that
    * otherwise costs a rank window + filter. The ordering key folds the
    * tie-break INTO the value (exact cents × 10^10 + unique custkey):
    * max_by under ties is engine-arbitrary, so the key must be unique
    * by construction. ROUND before the cents cast — the raw double
    * `bal*100` sits a hair below the integer and Spark's cast
    * truncates where DuckDB's rounds. */
  val qArgmax = QueryDef(
    "q_argmax",
    (s, d) => {
      val ord = round(col("c_acctbal") * 100, 0).cast("long") * 10000000000L +
        col("c_custkey")
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(
          max_by(col("c_custkey"), ord).as("top_cust"),
          min_by(col("c_custkey"), ord).as("bottom_cust"),
          max(col("c_acctbal")).as("max_bal"),
          count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    },
    Some("""SELECT c_nationkey,
              arg_max(c_custkey, CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) * 10000000000 + c_custkey) AS top_cust,
              arg_min(c_custkey, CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) * 10000000000 + c_custkey) AS bottom_cust,
              MAX(c_acctbal) AS max_bal, COUNT(*) AS n
            FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** R33: unpivot / melt — the inverse of R20's pivot, via the native
    * Dataset.unpivot API (wide per-status columns back to long
    * (yr, status, total) rows; one Expand, no shuffle beyond the
    * pivot's own aggregation). Null cells (year × status combos with
    * no orders) are dropped EXPLICITLY on both sides — Spark's unpivot
    * emits them as null-valued rows, the UNION-ALL oracle would need a
    * WHERE anyway, so the filter makes the two deterministic. */
  val qUnpivot = QueryDef(
    "q_unpivot",
    (s, d) => {
      val wide = Tables.orders(s, d)
        .select(year(col("o_orderdate")).as("yr"), col("o_orderstatus"),
          col("o_totalprice"))
        .groupBy("yr")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(rsum(col("o_totalprice")))
      wide.unpivot(Array(col("yr")),
          Array(col("F"), col("O"), col("P")), "status", "total")
        .filter(col("total").isNotNull)
        .orderBy("yr", "status")
    },
    Some(s"""WITH wide AS (
               SELECT EXTRACT(year FROM o_orderdate) AS yr,
                 ${oSum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS f_total,
                 ${oSum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS o_total,
                 ${oSum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS p_total
               FROM orders GROUP BY 1)
             SELECT yr, status, total FROM (
               SELECT yr, 'F' AS status, f_total AS total FROM wide
               UNION ALL SELECT yr, 'O', o_total FROM wide
               UNION ALL SELECT yr, 'P', p_total FROM wide)
             WHERE total IS NOT NULL ORDER BY yr, status"""))

  /** R34: aggregate-filter (HAVING) + re-join — TPC-H Q18 "large
    * volume customers": pre-aggregate the fact table, filter ON THE
    * AGGREGATE, and join the tiny survivor set back to the dimensions.
    * The scale property: the sum_qty > 300 HAVING cut runs BEFORE any
    * dimension join, so orders/customer join against ~0.2% of order
    * keys (AQE broadcasts the survivor side at runtime), and top-k is
    * TakeOrderedAndProject — never a global sort. */
  val q18LargeOrders = QueryDef(
    "q18_large_orders",
    (s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(rsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some(s"""WITH big AS (
               SELECT l_orderkey, ${oSum("l_quantity")} AS sum_qty
               FROM lineitem GROUP BY l_orderkey
               HAVING ${oSum("l_quantity")} > 300)
             SELECT c_custkey, c_name, o_orderkey,
               CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice, sum_qty
             FROM orders JOIN big ON o_orderkey = l_orderkey
             JOIN customer ON o_custkey = c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  /** R35: statistical aggregates — Pearson correlation, sample
    * covariance/stddev, per group. Both engines compute the same
    * mathematical quantities via merge-based co-moment formulas whose
    * double summation ORDER differs, so values agree only to ~1e-10
    * relative — ROUND(·,4) puts the comparison far inside that margin
    * (the DECIMAL trick is unavailable: co-moments are intrinsically
    * floating-point). */
  val qCorrStats = QueryDef(
    "q_corr_stats",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
              ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
              ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
              ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
              COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** R38: WITH RECURSIVE through the SQL parser (landed in Spark 4.0) —
    * the iterative-closure surface next to R29's subqueries. The
    * hierarchy is a synthetic binary part taxonomy (parent(p) = p/2,
    * root 1): every part walks its ancestor chain to the root and the
    * result aggregates per depth — pure integer arithmetic, identical
    * recursion in DuckDB. Depth is log₂(parts), so the recursion runs
    * ~15-20 rounds at any realistic scale and the per-round frontier
    * never exceeds |part| rows (each part has exactly one live node).
    * For data-scale iteration the engine's own CC operator
    * (dedup/Clusters.scala) remains the 100 TB path — this gates the
    * SQL-surface semantics. */
  val qRecursiveCte = QueryDef(
    "q_recursive_cte",
    (s0, d) => {
      // the walk emits |part| × ⌈log₂ max(p_partkey)⌉ rows — N log N,
      // not a runaway — but Spark 4.1's safety default
      // (spark.sql.cteRecursionRowLimit = 1e6) lids it at ~55k parts:
      // the r12 sf1 ritual hit RECURSION_ROW_LIMIT_EXCEEDED at 200k
      // parts (~3.7M walk rows). Budget it from the ACTUAL walk size
      // (|part| × (⌈log₂ max(key)⌉ + 1), 2× margin) on a CHILD session
      // (the R148 isolation pattern), so the runaway-recursion guard is
      // never weakened for other entries sharing the parent session —
      // r12's session-global set leaked an effectively-unbounded limit
      // into every later recursive CTE of the run.
      val s = s0.newSession()
      val part = Tables.part(s, d)
      val Array(stats) = part
        .agg(count(lit(1)).as("n"), max(col("p_partkey").cast("long")).as("mx"))
        .collect()
      val depth = 64 - java.lang.Long.numberOfLeadingZeros(
        math.max(stats.getLong(1), 1L))
      val budget = 2L * stats.getLong(0) * (depth + 1)
      s.conf.set("spark.sql.cteRecursionRowLimit",
        math.max(budget, 1000000L).toString)
      part.createOrReplaceTempView("part_rec_v")
      // integer division: Spark's / on ints is fractional (DOUBLE), so
      // DIV here and // in DuckDB keep the walk in exact integers
      s.sql("""WITH RECURSIVE anc(part, node, depth) AS (
                 SELECT p_partkey, p_partkey, 0 FROM part_rec_v
                 UNION ALL
                 SELECT part, node DIV 2, depth + 1 FROM anc WHERE node > 1
               )
               SELECT depth, COUNT(*) AS n_parts,
                      SUM(node) AS sum_nodes, SUM(part) AS sum_parts
               FROM anc GROUP BY depth ORDER BY depth""")
    },
    Some("""WITH RECURSIVE anc(part, node, depth) AS (
              SELECT p_partkey, p_partkey, 0 FROM part
              UNION ALL
              SELECT part, node // 2, depth + 1 FROM anc WHERE node > 1
            )
            SELECT depth, COUNT(*) AS n_parts,
                   CAST(SUM(node) AS BIGINT) AS sum_nodes,
                   CAST(SUM(part) AS BIGINT) AS sum_parts
            FROM anc GROUP BY depth ORDER BY depth"""))

  /** R39: window distribution functions — dense_rank / percent_rank /
    * cume_dist per nation over customer balance (the rank family R22
    * doesn't cover). Ties collapse identically in every engine for all
    * three (they are functions of the ORDER BY value, not the row), so
    * the output is deterministic without a tiebreaker. Ratios are
    * FLOOR-quantized to micro-units, not ROUND-ed: rank ratios land
    * exactly on half boundaries (41/640 = 0.0640625) where Spark
    * rounds half-up and DuckDB half-even — floor has no tie to
    * break and both engines floor the identical IEEE quotient. */
  val qWindowDist = QueryDef(
    "q_window_dist",
    (s, d) => {
      val w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
      def micro(c: Column) = floor(c * 1e6).cast("long")
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          dense_rank().over(w).as("bal_dense_rank"),
          micro(percent_rank().over(w)).as("bal_pct_rank_micro"),
          micro(cume_dist().over(w)).as("bal_cume_dist_micro"))
        .orderBy("c_nationkey", "c_custkey")
    },
    Some("""SELECT c_custkey, c_nationkey, c_acctbal,
                   dense_rank() OVER w AS bal_dense_rank,
                   CAST(floor(percent_rank() OVER w * 1e6) AS BIGINT) AS bal_pct_rank_micro,
                   CAST(floor(cume_dist() OVER w * 1e6) AS BIGINT) AS bal_cume_dist_micro
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
            ORDER BY c_nationkey, c_custkey"""))

  /** R40: re-aggregatable sketch store — the 100 TB counting
    * architecture R19's one-shot estimate doesn't show: per-group
    * Apache DataSketches HLL sketches are MERGEABLE state (store one
    * per day/partition; any range rolls up by unioning stored sketches
    * with `hll_union_agg`, never rescanning the fact). SELF-VERIFYING
    * rows-only entry (sketch bytes have no SQL mirror): each group row
    * and the unioned ALL row carry the exact distinct count and the
    * relative error; the exact columns are eval instrumentation — a
    * production rollup executes only the sketch side. */
  /** Production entry: sketch build, union and estimates alone. The
    * exact-truth instrumentation is [[qSketchRollupEval]] (r14 un-fork
    * of the r13 svBaselines conf gate). */
  val qSketchRollup = QueryDef(
    "q_sketch_rollup",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val perGroup = li.groupBy("l_returnflag")
        .agg(expr("hll_sketch_agg(l_orderkey)").as("sk"))
      val groups = perGroup.select(col("l_returnflag").as("grp"),
        expr("hll_sketch_estimate(sk)").as("approx_distinct"))
      val total = perGroup
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")
          .as("approx_distinct"))
        .select(lit("ALL").as("grp"), col("approx_distinct"))
      groups.unionByName(total).orderBy("grp")
    },
    None)

  /** Eval companion: the same sketch rollup beside exact
    * countDistinct per group and corpus-wide, with relative errors —
    * the self-verification evidence, as its own declared entry. */
  val qSketchRollupEval = QueryDef(
    "q_sketch_rollup_eval",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val perGroup = li.groupBy("l_returnflag")
        .agg(expr("hll_sketch_agg(l_orderkey)").as("sk"),
          countDistinct(col("l_orderkey")).as("exact_distinct"))
      val groups = perGroup.select(col("l_returnflag").as("grp"),
        expr("hll_sketch_estimate(sk)").as("approx_distinct"),
        col("exact_distinct"))
      val total = perGroup
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_distinct"))
        .crossJoin(broadcast(
          li.agg(countDistinct(col("l_orderkey")).as("exact_distinct"))))
        .select(lit("ALL").as("grp"), col("approx_distinct"),
          col("exact_distinct"))
      groups.unionByName(total)
        .withColumn("rel_err",
          round(abs(col("approx_distinct") - col("exact_distinct")) /
            col("exact_distinct"), 4))
        .orderBy("grp")
    },
    None)

  /** R129: re-aggregatable QUANTILE sketch store — R40's mergeable-
    * state architecture applied to percentiles via the native
    * DataSketches KLL aggregates (`kll_sketch_agg_bigint` /
    * `kll_merge_agg_bigint`): store one sketch per group/day/partition
    * and ANY range's p50/p95 rolls up from sketch bytes, never
    * rescanning the fact — the OLAP latency-dashboard architecture
    * (R25's one-shot approx_percentile can't merge across stored
    * state). SELF-VERIFYING rows-only entry (KLL bytes have no SQL
    * mirror): per-group rows and the merged ALL row carry exact
    * percentiles from the shared rank-arithmetic machinery beside the
    * sketch estimates + rel errors; the exact side is eval
    * instrumentation — a production rollup executes only the sketch
    * reads. KLL's guarantee is ~1.7% normalized RANK error at the
    * default k (value error is data-dependent); the spec recomputes
    * the TRUE empirical rank of each sketch answer driver-side and
    * gates on it — `kll_sketch_get_rank` can't compose in-plan (its
    * quantile argument must be foldable). */
  private def quantileRollupInput(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))

  /** Production entry: KLL sketch build, merge and quantile reads
    * alone. The exact percentile() instrumentation is
    * [[qQuantileRollupEval]] (r14 un-fork of the svBaselines gate). */
  val qQuantileRollup = QueryDef(
    "q_quantile_rollup",
    (s, d) => {
      val o = quantileRollupInput(s, d)
      val perGroup = o.groupBy("grp")
        .agg(expr("kll_sketch_agg_bigint(cents)").as("sk"),
          count(lit(1)).as("n"))
      val groups = perGroup.select(col("grp"), col("n"),
        expr("kll_sketch_get_quantile_bigint(sk, 0.5)").as("ap_p50"),
        expr("kll_sketch_get_quantile_bigint(sk, 0.95)").as("ap_p95"))
      val total = perGroup
        .agg(expr("kll_merge_agg_bigint(sk)").as("msk"),
          sum(col("n")).as("n"))
        .select(lit("ALL").as("grp"), col("n"),
          expr("kll_sketch_get_quantile_bigint(msk, 0.5)").as("ap_p50"),
          expr("kll_sketch_get_quantile_bigint(msk, 0.95)").as("ap_p95"))
      groups.unionByName(total).orderBy("grp")
    },
    None)

  /** Eval companion: sketch quantiles beside exact percentile() per
    * group and merged, with relative errors — the self-verification
    * evidence, as its own declared entry. */
  val qQuantileRollupEval = QueryDef(
    "q_quantile_rollup_eval",
    (s, d) => {
      val o = quantileRollupInput(s, d)
      val perGroup = o.groupBy("grp")
        .agg(expr("kll_sketch_agg_bigint(cents)").as("sk"),
          count(lit(1)).as("n"),
          expr("percentile(cents, 0.5)").as("ex_p50"),
          expr("percentile(cents, 0.95)").as("ex_p95"))
      val groups = perGroup.select(col("grp"), col("n"),
        col("ex_p50"), col("ex_p95"),
        expr("kll_sketch_get_quantile_bigint(sk, 0.5)").as("ap_p50"),
        expr("kll_sketch_get_quantile_bigint(sk, 0.95)").as("ap_p95"))
      val total = perGroup
        .agg(expr("kll_merge_agg_bigint(sk)").as("msk"))
        .crossJoin(broadcast(o.agg(count(lit(1)).as("n"),
          expr("percentile(cents, 0.5)").as("ex_p50"),
          expr("percentile(cents, 0.95)").as("ex_p95"))))
        .select(lit("ALL").as("grp"), col("n"), col("ex_p50"),
          col("ex_p95"),
          expr("kll_sketch_get_quantile_bigint(msk, 0.5)").as("ap_p50"),
          expr("kll_sketch_get_quantile_bigint(msk, 0.95)").as("ap_p95"))
      groups.unionByName(total)
        .withColumn("relerr_p50",
          round(abs(col("ap_p50") - col("ex_p50")) / col("ex_p50"), 4))
        .withColumn("relerr_p95",
          round(abs(col("ap_p95") - col("ex_p95")) / col("ex_p95"), 4))
        .orderBy("grp")
    },
    None)

  /** R58 — sketch-based audience overlap: distinct-user counts of two
    * behavioral segments, their union (a NATIVE sketch merge) and
    * their intersection (inclusion–exclusion over the estimates —
    * HLL cannot intersect directly; |A∩B| = |A|+|B|−|A∪B| inherits
    * roughly the union's absolute error, which RELATIVE to a small
    * intersection can be large: the entry reports it rather than
    * hiding it, and the spec bounds it on this data). The 100 TB
    * story: segment sketches are stored per partition/day (R40),
    * overlap questions between ANY segments answer from sketch bytes
    * without re-scanning or joining raw events. SELF-VERIFYING: exact
    * baselines + rel_err per metric in-output (the exact side is eval
    * instrumentation; production reads only sketches). One user_id
    * shuffle for the flag table, one 1-row aggregation after. */
  val qSketchOverlap = QueryDef(
    "q_sketch_overlap",
    (s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          max(when(col("event_type") === "view", 1).otherwise(0)).as("has_a"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("has_b"))
      val row = perUser.agg(
        expr("hll_sketch_agg(CASE WHEN has_a = 1 THEN user_id END)").as("sk_a"),
        expr("hll_sketch_agg(CASE WHEN has_b = 1 THEN user_id END)").as("sk_b"),
        sum(col("has_a")).as("ex_a"),
        sum(col("has_b")).as("ex_b"),
        sum(when(col("has_a") === 1 && col("has_b") === 1, 1L)
          .otherwise(0L)).as("ex_inter"),
        sum(when(col("has_a") === 1 || col("has_b") === 1, 1L)
          .otherwise(0L)).as("ex_union"))
        .select(
          expr("hll_sketch_estimate(sk_a)").as("ap_a"),
          expr("hll_sketch_estimate(sk_b)").as("ap_b"),
          expr("hll_sketch_estimate(hll_union(sk_a, sk_b))").as("ap_union"),
          col("ex_a"), col("ex_b"), col("ex_inter"), col("ex_union"))
        .withColumn("ap_inter", col("ap_a") + col("ap_b") - col("ap_union"))
      row.select(expr(
        """stack(4,
             'segment_a',    ex_a,     CAST(ap_a AS DOUBLE),
             'segment_b',    ex_b,     CAST(ap_b AS DOUBLE),
             'union',        ex_union, CAST(ap_union AS DOUBLE),
             'intersection', ex_inter, CAST(ap_inter AS DOUBLE))
           AS (metric, exact, approx)"""))
        .withColumn("rel_err",
          round(abs(col("approx") - col("exact")) / col("exact"), 4))
        .orderBy("metric")
    },
    None)

  /** R130: Theta-sketch set ALGEBRA — the architecture R58 documents
    * itself wishing for: DataSketches Theta sketches intersect and
    * difference DIRECTLY (`theta_intersection` / `theta_difference`),
    * where HLL must go through inclusion–exclusion and a small
    * intersection inherits the union's absolute error (R58 reports
    * that blow-up; this entry removes it). Stored per-segment theta
    * sketches answer |A∩B|, |A\B|, |B\A| — audience overlap, churn
    * (last month \ this month), reactivation — from sketch bytes,
    * never re-joining raw events. SELF-VERIFYING rows-only (sketch
    * bytes have no SQL mirror): exact baselines + rel_err per metric
    * in-output; one user_id shuffle for the flag table, one 1-row
    * aggregation after, everything downstream O(1). */
  val qThetaAlgebra = QueryDef(
    "q_theta_algebra",
    (s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          max(when(col("event_type") === "view", 1).otherwise(0)).as("has_a"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("has_b"))
      val row = perUser.agg(
        expr("theta_sketch_agg(CASE WHEN has_a = 1 THEN user_id END)").as("sk_a"),
        expr("theta_sketch_agg(CASE WHEN has_b = 1 THEN user_id END)").as("sk_b"),
        sum(col("has_a")).as("ex_a"),
        sum(col("has_b")).as("ex_b"),
        sum(when(col("has_a") === 1 && col("has_b") === 1, 1L)
          .otherwise(0L)).as("ex_inter"),
        sum(when(col("has_a") === 1 && col("has_b") === 0, 1L)
          .otherwise(0L)).as("ex_a_only"),
        sum(when(col("has_a") === 1 || col("has_b") === 1, 1L)
          .otherwise(0L)).as("ex_union"))
        .select(
          expr("theta_sketch_estimate(sk_a)").as("ap_a"),
          expr("theta_sketch_estimate(sk_b)").as("ap_b"),
          expr("theta_sketch_estimate(theta_union(sk_a, sk_b))")
            .as("ap_union"),
          expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))")
            .as("ap_inter"),
          expr("theta_sketch_estimate(theta_difference(sk_a, sk_b))")
            .as("ap_a_only"),
          col("ex_a"), col("ex_b"), col("ex_inter"), col("ex_a_only"),
          col("ex_union"))
      row.select(expr(
        """stack(5,
             'segment_a',    ex_a,      CAST(ap_a AS DOUBLE),
             'segment_b',    ex_b,      CAST(ap_b AS DOUBLE),
             'union',        ex_union,  CAST(ap_union AS DOUBLE),
             'intersection', ex_inter,  CAST(ap_inter AS DOUBLE),
             'a_minus_b',    ex_a_only, CAST(ap_a_only AS DOUBLE))
           AS (metric, exact, approx)"""))
        // a degenerate segment (empty difference/intersection) has no
        // defined relative error — emit NULL, not a 0-divide
        .withColumn("rel_err",
          when(col("exact") > 0,
            round(abs(col("approx") - col("exact")) / col("exact"), 4)))
        .orderBy("metric")
    },
    None)

  /** R138: re-aggregatable HEAVY-HITTERS store — the third leg of the
    * mergeable-sketch trilogy (R40 distinct counts, R129 quantiles,
    * this: frequent items). Per-source `approx_top_k_accumulate`
    * sketches over document words are the stored artifact;
    * `approx_top_k_combine` merges ANY set of stored sketches and
    * `approx_top_k_estimate` reads the global top-k — corpus-wide
    * vocabulary questions answered from sketch bytes without
    * re-scanning documents (D21 estimates in one shot; this STORES
    * and MERGES). SELF-VERIFYING rows-only: every estimated item
    * carries its exact corpus frequency and the rel error in-output
    * (exact side = eval instrumentation). */
  val qTopkSketchRollup = QueryDef(
    "q_topk_sketch_rollup",
    (s, d) => {
      val words = Tables.documents(s, d)
        .select(col("source"),
          explode(graft.functions.Text.words(col("text"))).as("w"))
        .filter(col("w") =!= "")
      val perSource = words.groupBy("source")
        .agg(expr("approx_top_k_accumulate(w, 2000)").as("sk"))
      val estimated = perSource
        // coalesce(1) before the GLOBAL combine: Spark 4.1.2's
        // ApproxTopKCombine.serialize MatchErrors on the null-typed
        // buffer an EMPTY partition's partial aggregation produces
        // (found by the ConfRobustnessSpec 200-partition sweep — any
        // real cluster has empty partials). The frame is O(#sources)
        // sketch rows, so one partition is the right size anyway.
        .coalesce(1)
        .agg(expr("approx_top_k_estimate(approx_top_k_combine(sk), 20)")
          .as("top"))
        .select(posexplode(col("top")).as(Seq("pos", "t")))
        .select((col("pos") + 1).cast("long").as("est_rank"),
          col("t.item").as("w"), col("t.count").cast("long").as("est_n"))
      val exact = words.groupBy("w").agg(count(lit(1)).as("exact_n"))
      estimated.join(exact, "w")
        .withColumn("rel_err",
          round(abs(col("est_n") - col("exact_n")) / col("exact_n"), 4))
        .select(col("est_rank"), col("w"), col("est_n"), col("exact_n"),
          col("rel_err"))
        .orderBy("est_rank", "w")
    },
    None)

  /** R140: Theil–Sen robust trend slope — the median of all pairwise
    * slopes per group, the estimator a few corrupted months cannot
    * drag (R59's OLS minimizes squared error, so one bad month owns
    * the fit; this is R63's robustness argument applied to trends).
    * The pair set is quadratic ONLY in the number of MONTHS — the
    * fact reduces to the O(groups × months) frame first, so pairs are
    * bounded by the calendar (84 months → ≤3.5k pairs/group), never
    * by data volume. Slopes quantize exactly (integer cents · 1e6 div
    * integer month gap) and the median is the R14 rank-arithmetic
    * pass over the bounded pair frame — doubled-median convention
    * keeps even widths integer. */
  val qTheilSen = QueryDef(
    "q_theilsen_slope",
    (s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("g"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
            .cast("long").as("x"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("y"))
      val a = monthly.select(col("g"), col("x").as("x1"), col("y").as("y1"))
      val b = monthly.select(col("g").as("g2"), col("x").as("x2"),
        col("y").as("y2"))
      val pairs = a.join(b, col("g") === col("g2") && col("x1") < col("x2"))
        .select(col("g"),
          expr("(y2 - y1) * 1000000 div (x2 - x1)").as("slope_q"))
      val w = Window.partitionBy("g").orderBy("slope_q")
      val ranked = pairs
        .withColumn("r", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      ranked
        // Column `/` is DOUBLE division — the rank picks must use
        // integer div or even widths silently match nothing
        .filter(expr("r = (n + 1) div 2 OR r = n div 2 + 1"))
        .groupBy("g")
        .agg(first(col("n")).as("n_pairs"),
          sum(when(expr("r = (n + 1) div 2"), col("slope_q"))
            .otherwise(0L)).as("lo"),
          sum(when(expr("r = n div 2 + 1"), col("slope_q"))
            .otherwise(0L)).as("hi"))
        // doubled median: at odd widths both picks are the SAME row,
        // so lo + hi = 2·median there too — one formula, no branch
        .select(col("g"), col("n_pairs"),
          (col("lo") + col("hi")).as("slope2_q"))
        .orderBy("g")
    },
    Some("""WITH monthly AS (
              SELECT o_orderpriority AS g,
                     CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                       AS BIGINT) AS x,
                     CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS y
              FROM orders GROUP BY 1, 2),
            pairs AS (
              SELECT a.g, (b.y - a.y) * 1000000 // (b.x - a.x) AS slope_q
              FROM monthly a JOIN monthly b
                ON a.g = b.g AND a.x < b.x),
            r AS (SELECT g, slope_q,
                    row_number() OVER (PARTITION BY g ORDER BY slope_q)
                      AS r,
                    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
                  FROM pairs)
            SELECT g, CAST(ANY_VALUE(n) AS BIGINT) AS n_pairs,
                   CAST(SUM(CASE WHEN r = (n + 1) // 2
                       THEN slope_q ELSE 0 END)
                     + SUM(CASE WHEN r = n // 2 + 1
                       THEN slope_q ELSE 0 END) AS BIGINT) AS slope2_q
            FROM r
            WHERE r = (n + 1) // 2 OR r = n // 2 + 1
            GROUP BY g ORDER BY g"""))

  /** R59 — per-group OLS trend line (the monitoring/forecast read:
    * "is order value drifting per priority class"): slope and
    * intercept of cents-quantized value over month index, from the
    * closed-form normal equations over EXACT integer sums —
    * Σx, Σy, Σxy, Σx² accumulate as DECIMAL(38,0) (order-free, no
    * merge drift; the R35 corr entry rounds because it uses float
    * co-moments — this shape is the hash-exact alternative), with ONE
    * double conversion and ONE division at the end, floor-quantized.
    * One groupBy shuffle of 4 decimal partials per group; map-side
    * partial aggregation does the heavy summing. */
  val qTrendSlope = QueryDef(
    "q_trend_slope",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("decimal(38,0)").as("x"),
          round(col("o_totalprice") * 100).cast("decimal(38,0)").as("y"))
      val agg = o.groupBy("o_orderpriority").agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      agg.select(col("o_orderpriority"),
        col("n").cast("long").as("n"),
        floor(((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          * 1e6).cast("long").as("slope_q"),
        floor(((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
          * col("sx").cast("double")) / col("n").cast("double")) * 1e2)
          .cast("long").as("intercept_q"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH b AS (
              SELECT o_orderpriority,
                     CAST(year(o_orderdate) * 12 + month(o_orderdate)
                       AS HUGEINT) AS x,
                     CAST(ROUND(o_totalprice * 100) AS HUGEINT) AS y
              FROM orders),
            a AS (
              SELECT o_orderpriority,
                     CAST(count(*) AS HUGEINT) AS n,
                     SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x * y) AS sxy, SUM(x * x) AS sxx
              FROM b GROUP BY o_orderpriority)
            SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
                   CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6) AS BIGINT)
                     AS slope_q,
                   CAST(floor((CAST(sy AS DOUBLE)
                     - CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE)
                       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) * 1e2)
                     AS BIGINT) AS intercept_q
            FROM a ORDER BY o_orderpriority"""))

  /** R46 — ordered string aggregation (listagg / string_agg WITHIN
    * GROUP), the report-building aggregate SQL:2016 standardized.
    * Determinism comes from the mandatory WITHIN GROUP order; an
    * unordered listagg would be partitioning-dependent and could never
    * hash-gate. */
  val qListagg = QueryDef(
    "q_listagg",
    (s, d) => Tables.nation(s, d)
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
          .as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy("r_name"),
    Some("""SELECT r_name,
                   string_agg(n_name, ',' ORDER BY n_name) AS nations,
                   count(*) AS n_nations
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name"""))

  /** R54 — winsorized aggregation: per-group exact p01/p99 thresholds
    * (the R14 rank-arithmetic pass — spillable window sorts, never the
    * memory-unbounded builtin `percentile` buffer), broadcast back
    * (O(groups) rows) and values clamped before aggregating — the
    * standard outlier-robust cleaning pass. The clamped sum goes
    * through DECIMAL(38,6) so summation order can't drift the hash
    * (E18 convention); thresholds must be BIT-identical across
    * engines, so the oracle mirrors the exact interp arithmetic
    * instead of calling quantile_cont. At 100 TB the exact rank pass
    * swaps for the R25 mergeable sketch; the clamp+agg shape is
    * unchanged. */
  val qWinsorize = QueryDef(
    "q_winsorize",
    (s, d) => {
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val ranked = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"))
        .withColumn("r", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
      def t(p: Double) = lit(1.0) + (col("n") - 1) * lit(p)
      val need = ranked.filter(
        col("r") === floor(t(0.01)) || col("r") === ceil(t(0.01)) ||
          col("r") === floor(t(0.99)) || col("r") === ceil(t(0.99)))
      def pick(p: Double, side: Column => Column) =
        max(when(col("r") === side(t(p)), col("l_extendedprice")))
      val picked = need.groupBy("l_returnflag").agg(
        first(col("n")).as("n"),
        pick(0.01, floor).as("lo01"), pick(0.01, ceil).as("hi01"),
        pick(0.99, floor).as("lo99"), pick(0.99, ceil).as("hi99"))
      def interp(lo: String, hi: String, p: Double) = {
        val tt = lit(1.0) + (col("n") - 1) * lit(p)
        col(lo) + (col(hi) - col(lo)) * (tt - floor(tt))
      }
      val thresholds = picked.select(col("l_returnflag"),
        interp("lo01", "hi01", 0.01).as("p_lo"),
        interp("lo99", "hi99", 0.99).as("p_hi"))
      Tables.lineitem(s, d).select(col("l_returnflag"), col("l_extendedprice"))
        .join(broadcast(thresholds), "l_returnflag")
        .withColumn("clamped",
          least(greatest(col("l_extendedprice"), col("p_lo")), col("p_hi")))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("l_extendedprice") < col("p_lo"), 1L).otherwise(0L)).as("n_lo_clamped"),
          sum(when(col("l_extendedprice") > col("p_hi"), 1L).otherwise(0L)).as("n_hi_clamped"),
          round(first(col("p_lo")), 4).as("p_lo_q"),
          round(first(col("p_hi")), 4).as("p_hi_q"),
          round(sum(col("clamped").cast("decimal(38,6)")), 4)
            .cast("double").as("sum_winsorized"))
        .orderBy("l_returnflag")
    },
    Some("""WITH b AS (SELECT l_returnflag, l_extendedprice,
                         row_number() OVER (PARTITION BY l_returnflag
                                            ORDER BY l_extendedprice) AS r,
                         count(*) OVER (PARTITION BY l_returnflag) AS n
                       FROM lineitem),
            g AS (SELECT l_returnflag, max(n) AS n,
                    max(CASE WHEN r = CAST(floor(1.0 + (n-1)*0.01) AS BIGINT) THEN l_extendedprice END) AS lo01,
                    max(CASE WHEN r = CAST(ceil(1.0 + (n-1)*0.01) AS BIGINT) THEN l_extendedprice END) AS hi01,
                    max(CASE WHEN r = CAST(floor(1.0 + (n-1)*0.99) AS BIGINT) THEN l_extendedprice END) AS lo99,
                    max(CASE WHEN r = CAST(ceil(1.0 + (n-1)*0.99) AS BIGINT) THEN l_extendedprice END) AS hi99
                  FROM b GROUP BY l_returnflag),
            p AS (SELECT l_returnflag,
                    lo01 + (hi01 - lo01) * ((1.0 + (n-1)*0.01) - floor(1.0 + (n-1)*0.01)) AS p_lo,
                    lo99 + (hi99 - lo99) * ((1.0 + (n-1)*0.99) - floor(1.0 + (n-1)*0.99)) AS p_hi
                  FROM g)
            SELECT l.l_returnflag,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN l_extendedprice < p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo_clamped,
                   CAST(sum(CASE WHEN l_extendedprice > p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi_clamped,
                   ROUND(p_lo, 4) AS p_lo_q,
                   ROUND(p_hi, 4) AS p_hi_q,
                   CAST(ROUND(SUM(CAST(least(greatest(l_extendedprice, p_lo), p_hi) AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_winsorized
            FROM lineitem l JOIN p USING (l_returnflag)
            GROUP BY l.l_returnflag, p_lo, p_hi
            ORDER BY l.l_returnflag"""))

  /** R56 — equi-width histogram with a dense bin spine: 20 bins over
    * [min, max] of o_totalprice, empty bins zero-filled via the
    * generated spine (R48's gap-fill idea applied to value space).
    * Two passes total: a 1-row min/max stats aggregate (the sanctioned
    * crossJoin broadcast), then one map-side bin assignment + one
    * bin-keyed count — the profile query every warehouse runs, shaped
    * so the fact shuffles 20 partial counts per task, not rows. The
    * bin arithmetic is a single deterministic double expression
    * (identical operation order both engines); edges are 6dp-quantized
    * for the hash gate. Bins are [lo, hi) except the last, which
    * closes at max (the `least` clamp). */
  val NBins = 20
  val qHistogram = QueryDef(
    "q_histogram",
    (s, d) => {
      val stats = Tables.orders(s, d)
        .agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      val binned = Tables.orders(s, d)
        .crossJoin(broadcast(stats))
        .withColumn("bin",
          least(floor((col("o_totalprice") - col("lo")) * NBins /
            (col("hi") - col("lo"))), lit(NBins - 1)).cast("int"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
      val spine = s.range(NBins).select(col("id").cast("int").as("bin"))
        .crossJoin(broadcast(stats))
      spine.join(binned, Seq("bin"), "left")
        .select(col("bin"),
          round(col("lo") + col("bin") * (col("hi") - col("lo")) / NBins, 6)
            .as("edge_lo"),
          round(col("lo") + (col("bin") + 1) * (col("hi") - col("lo")) / NBins, 6)
            .as("edge_hi"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("bin")
    },
    Some(s"""WITH st AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                         FROM orders),
             b AS (SELECT CAST(least(floor((o_totalprice - lo) * $NBins
                       / (hi - lo)), $NBins - 1) AS INT) AS bin,
                     CAST(count(*) AS BIGINT) AS n
                   FROM orders, st GROUP BY 1),
             spine AS (SELECT CAST(i AS INT) AS bin FROM
                       UNNEST(generate_series(0, $NBins - 1)) AS u(i))
             SELECT spine.bin,
                    ROUND(lo + spine.bin * (hi - lo) / $NBins, 6) AS edge_lo,
                    ROUND(lo + (spine.bin + 1) * (hi - lo) / $NBins, 6) AS edge_hi,
                    COALESCE(b.n, 0) AS n
             FROM spine CROSS JOIN st LEFT JOIN b ON b.bin = spine.bin
             ORDER BY spine.bin"""))

  /** R57 — EQUI-DEPTH histogram (the optimizer-statistics shape: every
    * bin holds ~n/k rows, bin edges adapt to the distribution, where
    * R56's equi-width bins starve in sparse ranges). Bin assignment is
    * pure rank arithmetic — bin = (rank−1)·k div n — over a GLOBAL
    * row_number on (value, unique key), which is exactly the R53
    * funnel trap: the naive global window funnels the table through
    * one task. Composed on [[Ranks.globalRowNumber]] instead: range
    * exchange + O(#partitions) offsets + pid-local windows, no
    * SinglePartition anywhere. Edges are min/max DATA values per bin —
    * no arithmetic, so nothing to quantize cross-engine. */
  val qHistogramDepth = QueryDef(
    "q_histogram_depth",
    (s, d) => {
      val ranked = Ranks.globalRowNumber(
        Tables.orders(s, d)
          .select(col("o_totalprice").as("price"), col("o_orderkey").as("k")),
        Seq(col("price").asc, col("k").asc), 32, "rn")
      val nRow = ranked.agg(count(lit(1)).as("n_total"))
      ranked.crossJoin(broadcast(nRow))
        .withColumn("bin",
          expr(s"cast(((rn - 1) * $NBins) div n_total as int)"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), min("price").as("lo"), max("price").as("hi"))
        .orderBy("bin")
    },
    Some(s"""WITH r AS (SELECT o_totalprice AS price, o_orderkey AS k,
                     row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                       AS rn
                   FROM orders),
             n AS (SELECT count(*) AS n_total FROM orders)
             SELECT CAST(((rn - 1) * $NBins) // n_total AS INT) AS bin,
                    CAST(count(*) AS BIGINT) AS n,
                    min(price) AS lo, max(price) AS hi
             FROM r, n GROUP BY 1 ORDER BY bin"""))

  /** Exact linear-interpolated quantile per group via the R14
    * rank-arithmetic pass — the reusable core of R14/R54/R63: one
    * spillable window, the two bracketing ranks picked, one interp.
    * Emits (group, n, <out>). */
  private[operators] def exactQuantile(df: DataFrame, group: String, value: String,
      p: Double, out: String): DataFrame = {
    val w = Window.partitionBy(col(group)).orderBy(col(value))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = df
      .withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
    val t = lit(1.0) + (col("n") - 1) * lit(p)
    ranked.filter(col("r") === floor(t) || col("r") === ceil(t))
      .groupBy(group).agg(first(col("n")).as("n"),
        max(when(col("r") === floor(t), col(value))).as("_lo"),
        max(when(col("r") === ceil(t), col(value))).as("_hi"))
      .select(col(group), col("n"),
        (col("_lo") + (col("_hi") - col("_lo")) *
          ((lit(1.0) + (col("n") - 1) * lit(p)) -
            floor(lit(1.0) + (col("n") - 1) * lit(p)))).as(out))
  }

  /** R63 — MAD robust outlier detection per group: median absolute
    * deviation is the robust scale estimate a contaminated
    * distribution can't drag (stddev-based z-scores let the outliers
    * inflate their own yardstick — the R44 z approach assumes clean
    * moments). Two exact rank-arithmetic median passes (value, then
    * |x − median|), thresholds at 3·1.4826·MAD (the Gaussian
    * consistency constant, multiplied IN-ENGINE on both sides so the
    * doubles match bitwise), flag counts map-side. Cost family =
    * R54's winsorize; at 100 TB both medians swap for the R25
    * mergeable sketch with the flag scan unchanged. */
  val qMadOutliers = QueryDef(
    "q_mad_outliers",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
      val med = exactQuantile(li, "g", "x", 0.5, "med").select("g", "med")
      val devs = li.join(broadcast(med), Seq("g"))
        .select(col("g"), abs(col("x") - col("med")).as("dv"))
      val mad = exactQuantile(devs, "g", "dv", 0.5, "mad").select("g", "mad")
      li.join(broadcast(med), Seq("g")).join(broadcast(mad), Seq("g"))
        .withColumn("thr", lit(3.0) * lit(1.4826) * col("mad"))
        .groupBy("g")
        .agg(count(lit(1)).as("n"),
          round(first(col("med")), 4).as("med_q"),
          round(first(col("mad")), 4).as("mad_q"),
          sum(when(abs(col("x") - col("med")) > col("thr"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy("g")
    },
    Some("""WITH li AS (SELECT l_returnflag AS g, l_extendedprice AS x
                        FROM lineitem),
            r1 AS (SELECT g, x,
                     row_number() OVER (PARTITION BY g ORDER BY x) AS r,
                     count(*) OVER (PARTITION BY g) AS n
                   FROM li),
            m1 AS (SELECT g, MAX(n) AS n,
                     MAX(CASE WHEN r = floor(1.0 + (n-1)*0.5) THEN x END) AS lo,
                     MAX(CASE WHEN r = ceil(1.0 + (n-1)*0.5) THEN x END) AS hi
                   FROM r1
                   WHERE r = floor(1.0 + (n-1)*0.5)
                      OR r = ceil(1.0 + (n-1)*0.5)
                   GROUP BY g),
            med AS (SELECT g,
                      lo + (hi - lo) * ((1.0 + (n-1)*0.5)
                        - floor(1.0 + (n-1)*0.5)) AS med
                    FROM m1),
            dv AS (SELECT li.g, li.x, abs(li.x - med.med) AS dv, med.med
                   FROM li JOIN med USING (g)),
            r2 AS (SELECT g, dv,
                     row_number() OVER (PARTITION BY g ORDER BY dv) AS r,
                     count(*) OVER (PARTITION BY g) AS n
                   FROM dv),
            m2 AS (SELECT g, MAX(n) AS n,
                     MAX(CASE WHEN r = floor(1.0 + (n-1)*0.5) THEN dv END) AS lo,
                     MAX(CASE WHEN r = ceil(1.0 + (n-1)*0.5) THEN dv END) AS hi
                   FROM r2
                   WHERE r = floor(1.0 + (n-1)*0.5)
                      OR r = ceil(1.0 + (n-1)*0.5)
                   GROUP BY g),
            mad AS (SELECT g,
                      lo + (hi - lo) * ((1.0 + (n-1)*0.5)
                        - floor(1.0 + (n-1)*0.5)) AS mad
                    FROM m2)
            SELECT dv.g AS g, CAST(count(*) AS BIGINT) AS n,
                   ROUND(MAX(dv.med), 4) AS med_q,
                   ROUND(MAX(mad.mad), 4) AS mad_q,
                   CAST(SUM(CASE WHEN dv.dv > 3.0 * 1.4826 * mad.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM dv JOIN mad ON mad.g = dv.g
            GROUP BY dv.g ORDER BY g"""))

  /** R83 — TPC-H Q7 shape (volume shipping): revenue flow between two
    * nation PAIRS in both directions, per year — a 5-way join where
    * the two nation roles come from the SAME dim read twice (supplier
    * nation vs customer nation) and the pair predicate is symmetric.
    * Nation dims broadcast; the fact shuffles once per join key chain.
    * Revenue uses the exact-decimal rsum recipe. */
  val q7NationVolume = QueryDef(
    "q7_nation_volume",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .filter((col("supp_nation") === "NATION_3" &&
          col("cust_nation") === "NATION_4") ||
          (col("supp_nation") === "NATION_4" &&
            col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(rsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    CAST(year(l_shipdate) AS INT) AS l_year,
                    ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
             WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_4')
                OR (n1.n_name = 'NATION_4' AND n2.n_name = 'NATION_3')
             GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** R84 — TPC-H Q10 shape (returned-item top customers): revenue
    * lost to returns per customer over a quarter, top 20 — join +
    * selective flag filter + agg + deterministic top-k, the
    * "who do we call first" report. The returnflag filter reaches the
    * lineitem scan (PushedFilters); top-k is a sort+limit, never a
    * global window. */
  val q10ReturnedTop = QueryDef(
    "q10_returned_top",
    (s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= "1996-01-01" &&
          col("o_orderdate") < "1996-07-01")
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(rsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name, n_name,
                    ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             WHERE l_returnflag = 'R'
               AND o_orderdate >= TIMESTAMP '1996-01-01'
               AND o_orderdate < TIMESTAMP '1996-07-01'
             GROUP BY 1, 2, 3
             ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** R87 — TPC-H Q21 shape (suppliers who kept orders waiting): for
    * each supplier, count multi-supplier orders where it was the ONLY
    * supplier shipping late (> 60 days after the order date). The
    * classic form is a correlated EXISTS + NOT EXISTS pair; this
    * decorrelates both into ONE order-keyed aggregate — distinct
    * suppliers and distinct LATE suppliers per order — joined back to
    * the per-(order, supplier) late flags, so the whole query costs
    * two keyed aggregations instead of two correlated subquery scans.
    * Late is exact integer day arithmetic; top-10 is sort+limit. */
  val q21BlockedOrders = QueryDef(
    "q21_blocked_orders",
    (s, d) => {
      val lines = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          (datediff(to_date(col("l_shipdate")),
            to_date(col("o_orderdate"))) > 60).as("late"))
      val perOrderSupp = lines.groupBy("ok", "sk")
        .agg(max(when(col("late"), 1L).otherwise(0L)).as("any_late"))
      val perOrder = perOrderSupp.groupBy("ok")
        .agg(count(lit(1)).as("n_supp"), sum("any_late").as("n_late"))
      perOrderSupp.join(perOrder, "ok")
        .filter(col("any_late") === 1 && col("n_supp") >= 2 &&
          col("n_late") === 1)
        .groupBy("sk")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_name"))),
          col("sk") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(desc("numwait"), asc("s_suppkey"))
        .limit(10)
    },
    Some("""WITH lines AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
                             date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE)) > 60 AS late
                           FROM lineitem
                           JOIN orders ON l_orderkey = o_orderkey),
             pos AS (SELECT ok, sk,
                       MAX(CASE WHEN late THEN 1 ELSE 0 END) AS any_late
                     FROM lines GROUP BY 1, 2),
             po AS (SELECT ok, CAST(count(*) AS BIGINT) AS n_supp,
                      CAST(SUM(any_late) AS BIGINT) AS n_late
                    FROM pos GROUP BY 1)
             SELECT s.s_suppkey, s.s_name,
                    CAST(count(*) AS BIGINT) AS numwait
             FROM pos JOIN po ON pos.ok = po.ok
             JOIN supplier s ON pos.sk = s.s_suppkey
             WHERE pos.any_late = 1 AND po.n_supp >= 2 AND po.n_late = 1
             GROUP BY 1, 2
             ORDER BY numwait DESC, s.s_suppkey LIMIT 10"""))

  val all: Seq[QueryDef] = Seq(
    q7NationVolume, q10ReturnedTop, q21BlockedOrders,
    qHistogram, qHistogramDepth, qMadOutliers,
    qScanPushdown, q1PricingSummary, q3ShippingPriority, q5LocalSupplier,
    qBroadcastJoin, qSemiJoin, qAntiJoin, qWindowRank, qWindowRunning,
    qCountDistinct, qConditionalAgg, qTopK, qRollup, qPercentiles,
    qUnionDedup, qScalarFuncs, qAsofJoin, qAsofNearest, qVectorAgg,
    qApproxDistinct,
    qPivot, qCubeGrouping, qWindowFuncs, qRangeJoin, qRangeJoinRewrite, qSaltedJoin, qWeightedMedian,
    qApproxPercentile, qApproxPercentileEval, qOuterJoin, qSlidingWindow, qSlidingWindowBlocked,
    qSetOps, qSqlSurface,
    qGroupingSets, qBloomJoin, qArgmax, qUnpivot, q18LargeOrders,
    qCorrStats, qRecursiveCte, qWindowDist, qSketchRollup, qSketchRollupEval,
    qQuantileRollup, qQuantileRollupEval,
    qSketchOverlap, qThetaAlgebra, qTopkSketchRollup, qTheilSen,
    qTrendSlope, qListagg, qLateralTopn, qGapfill, qNullsafeJoin, qWinsorize)
}
