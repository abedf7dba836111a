package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The remaining TPC-H query-family shapes (SURVEY.md §2.2 R91–R100),
  * adapted to the synthetic schema (no partsupp / comment / phone
  * columns — each query keeps its FAMILY's plan shape: the join
  * topology, subquery decorrelation, and aggregation structure that
  * make the original interesting, re-keyed onto columns that exist).
  *
  * Scale notes: every dim side that is O(SF) joins via shuffle (AQE
  * may broadcast at runtime); fixed-size dims (nation) broadcast
  * explicitly. Scalar-subquery thresholds (Q17/Q22) are computed as
  * 1-row aggregates and broadcast — never a driver collect. All money
  * sums ride the exact DECIMAL(38,6) recipe so partial-aggregation
  * order can't flip ROUND boundaries between engines.
  */
object TpchMore {

  private def dsum(c: Column): Column = sum(c.cast("decimal(38,6)"))
  private def rsum(c: Column): Column = round(dsum(c), 4).cast("double")
  private def oSum(expr: String): String =
    s"CAST(ROUND(SUM(CAST(($expr) AS DECIMAL(38,6))), 4) AS DOUBLE)"

  /** R91 — TPC-H Q4 shape (order priority checking): count orders per
    * priority that had at least one lineitem shipped > 90 days after
    * the order date, within one quarter. The EXISTS decorrelates to a
    * LEFT SEMI join whose extra predicate (the 90-day lag) is a
    * residual on the equi join — one key shuffle, no correlated
    * re-scans. The quarter filter reaches the orders parquet scan. */
  val q4OrderPriority = QueryDef(
    "q4_order_priority",
    (s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val li = Tables.lineitem(s, d)
      o.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            datediff(to_date(col("l_shipdate")),
              to_date(col("o_orderdate"))) > 60,
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1997-04-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND date_diff('day', CAST(o_orderdate AS DATE),
                                  CAST(l_shipdate AS DATE)) > 60)
            GROUP BY 1 ORDER BY 1"""))

  /** R92 — TPC-H Q6 shape (forecasting revenue change): pure
    * scan+filter+agg — the query that exists to prove predicates reach
    * the scan. Every filter (year band, discount band, quantity cap)
    * is parquet-pushable; the plan is one WholeStageCodegen span over
    * the file scan with a partial+final agg, zero joins, one 1-row
    * result. */
  val q6RevenueChange = QueryDef(
    "q6_revenue_change",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(rsum(col("l_extendedprice") * col("l_discount")).as("revenue")),
    Some(s"""SELECT ${oSum("l_extendedprice * l_discount")} AS revenue
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1997-01-01'
               AND l_shipdate < TIMESTAMP '1998-01-01'
               AND l_discount >= 0.03 AND l_discount <= 0.07
               AND l_quantity < 24"""))

  /** R93 — TPC-H Q8 shape (national market share): of all revenue
    * flowing to customers in one REGION, the share supplied by one
    * NATION, per order year. Two nation-role reads of the same dim
    * (supplier side carries the flag, customer side restricts the
    * market), region restriction via broadcast; the share is a
    * conditional-over-total ratio of two exact decimal sums, divided
    * once as doubles so both engines round the same value. */
  val q8MarketShare = QueryDef(
    "q8_market_share",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("sk_n"),
          (col("n_name") === "NATION_1").as("is_target"))
      val n2 = Tables.nation(s, d)
        .join(Tables.region(s, d),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "AMERICA")
        .select(col("n_nationkey").as("ck_n"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk_n"))
        .join(broadcast(n2), col("c_nationkey") === col("ck_n"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          round(
            dsum(when(col("is_target"),
              col("l_extendedprice") * (lit(1) - col("l_discount")))
              .otherwise(lit(0.0))).cast("double") /
              dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
                .cast("double"),
            4).as("mkt_share"))
        .orderBy("o_year")
    },
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   ROUND(
                     CAST(SUM(CAST(CASE WHEN n1.n_name = 'NATION_1'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) /
                     CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE),
                     4) AS mkt_share
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region ON n2.n_regionkey = r_regionkey
            WHERE r_name = 'AMERICA'
            GROUP BY 1 ORDER BY 1"""))

  /** R94 — TPC-H Q13 shape (customer order-count distribution): LEFT
    * join so zero-order customers survive with count 0, then a second
    * aggregation over the counts — the double-groupBy histogram whose
    * first shuffle is keyed on the customer and whose second is on the
    * (tiny) count domain. The priority filter lives in the JOIN
    * condition, not a WHERE (a WHERE would silently turn the outer
    * join inner — the classic Q13 trap). */
  val q13OrderDistribution = QueryDef(
    "q13_order_distribution",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
      val perCust = c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },
    Some("""WITH per_cust AS (
              SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
              FROM customer
              LEFT JOIN orders ON c_custkey = o_custkey
                AND o_orderpriority <> '1-URGENT'
              GROUP BY 1)
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM per_cust GROUP BY 1
            ORDER BY custdist DESC, c_count DESC"""))

  /** R95 — TPC-H Q14 shape (promotion effect): the share of one
    * month's revenue carried by PROMO-type parts — join + conditional
    * agg collapsing to one row. The part join shuffles (part is
    * O(SF)); the month filter rides the lineitem scan. */
  val q14PromoShare = QueryDef(
    "q14_promo_share",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      li.join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(round(
          lit(100.0) *
            dsum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1) - col("l_discount")))
              .otherwise(lit(0.0))).cast("double") /
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("double"),
          4).as("promo_revenue_pct"))
    },
    Some("""SELECT ROUND(100.0 *
                     CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) /
                     CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE),
                   4) AS promo_revenue_pct
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-03-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'"""))

  /** R96 — TPC-H Q15 shape (top supplier): quarterly revenue per
    * supplier, keep exactly the max-revenue supplier(s) — ties all
    * surface, per spec. The "view" is the aggregated revenue table
    * (O(#suppliers) rows); its max is a 1-row re-aggregation joined
    * back by equality, so the whole query is two passes over the
    * aggregate and never a global sort. Revenue is the 4dp-rounded
    * exact decimal, making the equality join deterministic across
    * engines (raw double revenue would make "== max" flaky). */
  val q15TopSupplier = QueryDef(
    "q15_top_supplier",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(rsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.join(broadcast(top), col("total_revenue") === col("max_revenue"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some(s"""WITH rev AS (
               SELECT l_suppkey,
                      ${oSum("l_extendedprice * (1 - l_discount)")}
                        AS total_revenue
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                 AND l_shipdate < TIMESTAMP '1997-04-01'
               GROUP BY 1)
             SELECT s_suppkey, s_name, total_revenue
             FROM rev JOIN supplier ON l_suppkey = s_suppkey
             WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
             ORDER BY s_suppkey"""))

  /** R97 — TPC-H Q16 shape (parts/supplier relationship): how many
    * DISTINCT suppliers ship each (brand, type, size-bucket), for a
    * restricted attribute set, excluding blacklisted suppliers
    * (negative balance here) — count-distinct after a join with an
    * anti-join exclusion. The exclusion list is an aggregate-side
    * broadcast anti join; the distinct rides the aggregation, not a
    * self-join. */
  val q16SupplierCount = QueryDef(
    "q16_supplier_count",
    (s, d) => {
      val p = Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
          col("p_size") <= 25)
      val bad = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey").as("bad_sk"))
      Tables.lineitem(s, d)
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("bad_sk"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"),
          (col("p_size") <= 10).as("small_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"),
          asc("small_size"))
    },
    Some("""SELECT p_brand, p_type, p_size <= 10 AS small_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
              AND p_size <= 25
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, small_size"""))

  /** R98 — TPC-H Q17 shape (small-quantity-order revenue): revenue
    * from lineitems whose quantity sits under 20% of their part's
    * average — the correlated AVG subquery decorrelated into a
    * part-keyed aggregate joined back to the fact. The threshold is
    * computed with the exact-decimal-mean recipe ON BOTH SIDES so the
    * 0.2·avg comparison can't flip on a last ulp. Both the fact read
    * and the avg read carry the same brand filter (pushed), so the
    * join-back is small×small. */
  val q17SmallQtyRevenue = QueryDef(
    "q17_small_qty_revenue",
    (s, d) => {
      val pids = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#5")
        .select(col("p_partkey"))
      val li = Tables.lineitem(s, d)
        .join(pids, col("l_partkey") === col("p_partkey"))
      val avgQty = li.groupBy(col("l_partkey").as("ak"))
        .agg((dsum(col("l_quantity")).cast("double") /
          count(lit(1))).as("avg_qty"))
      li.join(avgQty, col("l_partkey") === col("ak"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(round(dsum(col("l_extendedprice")).cast("double") / 7.0, 4)
          .as("avg_yearly"))
    },
    Some("""WITH li AS (
              SELECT l_partkey, l_quantity, l_extendedprice
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand = 'Brand#5'),
            aq AS (
              SELECT l_partkey AS ak,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                       / count(*) AS avg_qty
              FROM li GROUP BY 1)
            SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
                     AS DOUBLE) / 7.0, 4) AS avg_yearly
            FROM li JOIN aq ON l_partkey = ak
            WHERE l_quantity < 0.2 * avg_qty"""))

  /** R99 — TPC-H Q19 shape (discounted revenue, disjunctive
    * predicates): an OR of three (brand ∧ size-band ∧ quantity-band)
    * conjuncts across the join — the shape that tests whether the
    * optimizer splits the common `l_partkey = p_partkey` out of the
    * disjunction and keeps per-branch residuals; grouped by brand so
    * each branch's contribution is visible. */
  val q19DisjunctivePred = QueryDef(
    "q19_disjunctive_pred",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 15)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(11, 25) &&
              col("l_quantity").between(10, 25)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(26, 50) &&
              col("l_quantity").between(20, 35)))
        .groupBy(col("p_brand"))
        .agg(rsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy("p_brand")
    },
    Some(s"""SELECT p_brand,
                    ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue,
                    CAST(count(*) AS BIGINT) AS n_lines
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                    AND l_quantity BETWEEN 1 AND 15)
                OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
                    AND l_quantity BETWEEN 10 AND 25)
                OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
                    AND l_quantity BETWEEN 20 AND 35)
             GROUP BY 1 ORDER BY 1"""))

  /** R100 — TPC-H Q22 shape (global sales opportunity): rich customers
    * (balance above the positive-balance average — a broadcast scalar
    * subquery) with NO orders in the last two years (anti join),
    * counted per nation. The average is a 1-row aggregate broadcast
    * into a crossJoin — the sanctioned 1-row stats-broadcast pattern —
    * and the anti join is the only fact-sized shuffle. */
  val q22DormantCustomers = QueryDef(
    "q22_dormant_customers",
    (s, d) => {
      val c = Tables.customer(s, d)
      val avgBal = c.filter(col("c_acctbal") > 0)
        .agg((dsum(col("c_acctbal")).cast("double") /
          count(lit(1))).as("avg_bal"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"),
          rsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("n_name")
    },
    Some(s"""SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
                    ${oSum("c_acctbal")} AS totacctbal
             FROM customer
             JOIN nation ON c_nationkey = n_nationkey
             WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal
                                    AS DECIMAL(38,6))) AS DOUBLE) / count(*)
                                FROM customer WHERE c_acctbal > 0)
               AND NOT EXISTS (SELECT 1 FROM orders
                               WHERE o_custkey = c_custkey
                                 AND o_orderdate >= TIMESTAMP '2000-01-01')
             GROUP BY 1 ORDER BY 1"""))

  /** R108 — schema-drift union: a long-lived pipeline's old extracts
    * lack columns its new extracts carry (and vice versa); the union
    * must align BY NAME with honest nulls for the absent side — the
    * positional union silently mis-maps columns the moment one side
    * evolves. `unionByName(allowMissingColumns = true)` is the engine
    * surface; the aggregation after it proves operators compose over
    * the merged view (the IO10 mergeSchema story at the query level,
    * no files involved). */
  val qUnionEvolved = QueryDef(
    "q_union_evolved",
    (s, d) => {
      val o = Tables.orders(s, d)
      val cut = lit("1998-01-01").cast("timestamp")
      val legacy = o.filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_totalprice"))
      val modern = o.filter(col("o_orderdate") >= cut)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"), lit("web").as("channel"))
      legacy.unionByName(modern, allowMissingColumns = true)
        .groupBy(
          coalesce(col("o_orderpriority"), lit("PRE-MIGRATION"))
            .as("priority"),
          coalesce(col("channel"), lit("legacy")).as("channel"))
        .agg(count(lit(1)).as("n_orders"),
          rsum(col("o_totalprice")).as("total"))
        .orderBy("priority", "channel")
    },
    Some(s"""WITH u AS (
               SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_orderdate < TIMESTAMP '1998-01-01'
               UNION ALL BY NAME
               SELECT o_orderkey, o_totalprice, o_orderpriority,
                      'web' AS channel
               FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
             SELECT COALESCE(o_orderpriority, 'PRE-MIGRATION') AS priority,
                    COALESCE(channel, 'legacy') AS channel,
                    CAST(count(*) AS BIGINT) AS n_orders,
                    ${oSum("o_totalprice")} AS total
             FROM u GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** R115 — nested document shaping: each order nests its line items
    * into an ORDERED array of structs (the ARRAY_AGG(STRUCT(...))
    * export shape every document store / API feed needs), then
    * aggregates INSIDE the nested form with higher-order functions —
    * proving the nest is computable, not just serializable. One keyed
    * collect per order (per-key lists are the bounded sessionize/pack
    * valve class: an order has bounded lines); the in-array sum runs
    * integer cents so the fold is exact cross-engine. sort_array on
    * the (linenumber, qty) struct gives a deterministic nesting
    * order. */
  val qNestOrders = QueryDef(
    "q_nest_orders",
    (s, d) => {
      val nested = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          struct(col("l_linenumber").as("ln"),
            floor(col("l_quantity") * 100 + 0.5).cast("long").as("qty_c"))
            .as("line"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("line"))).as("lines"))
      nested.select(col("l_orderkey"),
        size(col("lines")).as("n_lines"),
        element_at(col("lines"), 1).getField("ln").as("first_ln"),
        aggregate(col("lines"), lit(0L),
          (acc, x) => acc + x.getField("qty_c")).as("qty_total_c"))
        .filter(col("l_orderkey") % 10 === 0)
        .orderBy("l_orderkey")
    },
    Some("""WITH nested AS (
              SELECT l_orderkey,
                     list(struct_pack(ln := l_linenumber,
                         qty_c := CAST(floor(l_quantity * 100 + 0.5)
                           AS BIGINT)) ORDER BY l_linenumber) AS lines
              FROM lineitem GROUP BY 1)
            SELECT l_orderkey, CAST(len(lines) AS INT) AS n_lines,
                   lines[1].ln AS first_ln,
                   CAST(list_sum(list_transform(lines, x -> x.qty_c))
                     AS BIGINT) AS qty_total_c
            FROM nested WHERE l_orderkey % 10 = 0
            ORDER BY l_orderkey"""))

  /** R116 — DISCRETE percentiles (percentile_disc semantics): the
    * p-quantile as an ACTUAL data value — the element at rank
    * ⌈p·n⌉ — where R14 interpolates between neighbors
    * (percentile_cont). The distinction matters whenever the value
    * must exist (an order you can inspect, a latency with a trace id);
    * interpolated "latencies" name no real request. Same partitioned
    * rank pass as R14, no interpolation arithmetic — the emitted cents
    * are exact integers. */
  val qPercentileDisc = QueryDef(
    "q_percentile_disc",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
      val ranked = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .withColumn("r", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("o_orderpriority")))
      def pick(p: Double, name: String) =
        max(when(col("r") === ceil(col("n") * p), col("cents"))).as(name)
      ranked
        .filter(col("r") === ceil(col("n") * 0.5) ||
          col("r") === ceil(col("n") * 0.9) ||
          col("r") === ceil(col("n") * 0.99))
        .groupBy("o_orderpriority")
        .agg(first(col("n")).as("n"), pick(0.5, "p50_c"),
          pick(0.9, "p90_c"), pick(0.99, "p99_c"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH v AS (
              SELECT o_orderpriority, o_orderkey,
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              FROM orders),
            r AS (SELECT *,
                    row_number() OVER (PARTITION BY o_orderpriority
                      ORDER BY cents, o_orderkey) AS r,
                    count(*) OVER (PARTITION BY o_orderpriority) AS n
                  FROM v)
            SELECT o_orderpriority, CAST(ANY_VALUE(n) AS BIGINT) AS n,
                   MAX(CASE WHEN r = ceil(n * 0.5) THEN cents END) AS p50_c,
                   MAX(CASE WHEN r = ceil(n * 0.9) THEN cents END) AS p90_c,
                   MAX(CASE WHEN r = ceil(n * 0.99) THEN cents END) AS p99_c
            FROM r
            WHERE r = ceil(n * 0.5) OR r = ceil(n * 0.9)
               OR r = ceil(n * 0.99)
            GROUP BY 1 ORDER BY 1"""))

  /** R117 — rolling volatility: 7-day windowed standard deviation of
    * the daily event rate per type — the risk/stability band around
    * R107's rolling median. Exact arithmetic: the window keeps integer
    * Σx and Σx², variance = (n·Σx² − (Σx)²) / n² in BIGINT until the
    * final floor-quantized division — no float accumulation exists at
    * any window position, so hash-stable at any parallelism; emitted
    * as variance·1e4 (vol² in quarter-units) to stay integer. */
  val qRollingVol = QueryDef(
    "q_rolling_vol",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type").as("t"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"))
      val w7 = org.apache.spark.sql.expressions.Window
        .partitionBy("t").orderBy("day").rowsBetween(-3, 3)
      daily
        .withColumn("wn", count(lit(1)).over(w7))
        .withColumn("s1", sum("n").over(w7))
        .withColumn("s2", sum(expr("n * n")).over(w7))
        .select(col("t"), col("day"), col("n"), col("wn"),
          expr("((wn * s2 - s1 * s1) * 10000) div (wn * wn)")
            .as("var_q"))
        .orderBy("t", "day")
    },
    Some("""WITH daily AS (
              SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2)
            SELECT t, day, n, CAST(count(*) OVER w7 AS BIGINT) AS wn,
                   CAST(((count(*) OVER w7 * SUM(n * n) OVER w7
                      - SUM(n) OVER w7 * SUM(n) OVER w7) * 10000)
                     // (count(*) OVER w7 * count(*) OVER w7) AS BIGINT)
                     AS var_q
            FROM daily
            WINDOW w7 AS (PARTITION BY t ORDER BY day
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
            ORDER BY t, day"""))

  /** R114 — top-k WITH TIES: R12's sort+limit drops tied rows at the
    * boundary arbitrarily; rank() ≤ k keeps every row tying the k-th
    * value — the semantics reports need ("top 3 order sizes per
    * priority" must not cut a tie in half). One partitioned rank
    * window (WindowGroupLimit prunes map-side like R44); ties make
    * output size data-dependent, which is the point — the spec-visible
    * difference from LIMIT. Quantity is the tie-rich column. */
  val qTopkTies = QueryDef(
    "q_topk_ties",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority").orderBy(desc("qty"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority", "o_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(38,6)")).cast("long")
          .as("qty"))
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3)
        .orderBy(col("o_orderpriority"), desc("qty"), asc("o_orderkey"))
    },
    Some("""WITH per_order AS (
              SELECT o_orderpriority, o_orderkey,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS BIGINT)
                       AS qty
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY 1, 2),
            r AS (SELECT *, rank() OVER (PARTITION BY o_orderpriority
                     ORDER BY qty DESC) AS rnk
                  FROM per_order)
            SELECT o_orderpriority, o_orderkey, qty, CAST(rnk AS BIGINT)
                     AS rnk
            FROM r WHERE rnk <= 3
            ORDER BY o_orderpriority, qty DESC, o_orderkey"""))

  /** R121 — TPC-H Q2 shape (minimum-cost supplier): for each part in an
    * attribute band, the supplier offering the MINIMUM unit cost within
    * one region — the original's correlated MIN(ps_supplycost) subquery
    * decorrelated into a part-keyed min aggregate joined back by
    * equality so ALL tied suppliers surface (the Q15 discipline). The
    * part-supplier cost relation is derived from lineitem (no partsupp
    * table in the synthetic schema): cost(part, supp) = the minimum
    * observed line cents for the pair — exact integers, so "== min"
    * can't flip on a ulp. Region restriction applies to both the
    * candidate rows and the min computation, as in the original. Plan:
    * one (part, supp) aggregate, one part-keyed min, broadcast dims;
    * the final sort runs on the O(matches) result, never the fact. */
  val q2MinCostSupplier = QueryDef(
    "q2_min_cost_supplier",
    (s, d) => {
      val su = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))
      val p = Tables.part(s, d)
        .filter(col("p_type") === "STANDARD" &&
          col("p_size").between(10, 20))
        .select(col("p_partkey"), col("p_brand"))
      val cost = Tables.lineitem(s, d)
        .join(p.select("p_partkey"), col("l_partkey") === col("p_partkey"))
        .join(su.select("s_suppkey"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
          .as("cost_c"))
      val minCost = cost.groupBy(col("l_partkey").as("mk"))
        .agg(min(col("cost_c")).as("min_cost_c"))
      cost.join(minCost,
          col("l_partkey") === col("mk") &&
            col("cost_c") === col("min_cost_c"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_suppkey"), col("s_name"),
          col("n_name"), col("p_partkey"), col("p_brand"), col("cost_c"))
        .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"),
          asc("p_partkey"))
        .limit(100)
    },
    Some("""WITH su AS (
              SELECT s_suppkey, s_name, s_acctbal, n_name
              FROM supplier
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'),
            p AS (SELECT p_partkey, p_brand FROM part
                  WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20),
            cost AS (
              SELECT l_partkey, l_suppkey,
                     MIN(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                       AS cost_c
              FROM lineitem
              JOIN p ON l_partkey = p_partkey
              JOIN su ON l_suppkey = s_suppkey
              GROUP BY 1, 2)
            SELECT s_acctbal, s_suppkey, s_name, n_name, p_partkey, p_brand,
                   cost_c
            FROM cost
            JOIN su ON l_suppkey = s_suppkey
            JOIN p ON l_partkey = p_partkey
            WHERE cost_c = (SELECT MIN(cost_c) FROM cost c2
                            WHERE c2.l_partkey = cost.l_partkey)
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100"""))

  /** R122 — TPC-H Q9 shape (product-type profit): profit per (nation,
    * order year) for parts matching a name fragment — the widest join
    * in the suite (lineitem ⋈ part ⋈ supplier ⋈ orders ⋈ nation) with
    * a computed per-line margin. No ps_supplycost exists, so unit cost
    * is derived deterministically from the part's retail price (60%):
    * profit_c = cents(extprice·(1−disc)) − cents(0.6·retail)·qty, all
    * BIGINT per row before the sum — the aggregation is exact-integer,
    * hash-stable at any parallelism. The name filter prunes part
    * before its join; nation broadcasts; the fact shuffles once per
    * join chain. */
  val q9ProductProfit = QueryDef(
    "q9_product_profit",
    (s, d) => {
      val p = Tables.part(s, d)
        .filter(col("p_name").contains("gear"))
        .select(col("p_partkey"),
          floor(col("p_retailprice") * 60 + 0.5).cast("long")
            .as("unit_cost_c"))
      Tables.lineitem(s, d)
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"),
          (floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100
            + 0.5).cast("long") -
            col("unit_cost_c") * col("l_quantity").cast("long"))
            .as("amount_c"))
        .groupBy("nation", "o_year")
        .agg(sum(col("amount_c")).as("profit_c"))
        .orderBy(asc("nation"), desc("o_year"))
    },
    Some("""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
                   CAST(SUM(
                     CAST(floor(l_extendedprice * (1 - l_discount) * 100
                       + 0.5) AS BIGINT)
                     - CAST(floor(p_retailprice * 60 + 0.5) AS BIGINT)
                       * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_c
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%gear%'
            GROUP BY 1, 2
            ORDER BY nation, o_year DESC"""))

  /** R123 — TPC-H Q11 shape (important stock): parts whose value share
    * within one nation's supply exceeds a threshold of the nation
    * total — the group-vs-global scalar-subquery HAVING. Value per
    * part = exact cents over the nation's lineitems; the global total
    * and distinct-part count come from ONE 1-row aggregate broadcast
    * into the sanctioned crossJoin, and the threshold test
    * value_c · n_parts > 2 · total_c ("more than twice the mean
    * share") is exact integer cross-multiplication — no float
    * division anywhere, so the cut is bit-deterministic. */
  val q11ImportantParts = QueryDef(
    "q11_important_parts",
    (s, d) => {
      val natSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_3")
        .select(col("s_suppkey"))
      val value = Tables.lineitem(s, d)
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
          .as("value_c"))
      val tot = value.agg(sum(col("value_c")).as("total_c"),
        count(lit(1)).as("n_parts"))
      value.crossJoin(broadcast(tot))
        .filter(col("value_c") * col("n_parts") > col("total_c") * 2)
        .select(col("l_partkey"), col("value_c"))
        .orderBy(desc("value_c"), asc("l_partkey"))
    },
    Some("""WITH v AS (
              SELECT l_partkey,
                     CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS value_c
              FROM lineitem
              WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                                  JOIN nation ON s_nationkey = n_nationkey
                                  WHERE n_name = 'NATION_3')
              GROUP BY 1)
            SELECT l_partkey, value_c
            FROM v
            WHERE value_c * (SELECT count(*) FROM v)
                  > (SELECT SUM(value_c) FROM v) * 2
            ORDER BY value_c DESC, l_partkey"""))

  /** R124 — TPC-H Q12 shape (shipping modes / priority split): per
    * ship mode, how many LATE lines carried urgent vs non-urgent
    * orders — the conditional-count split after a lateness join
    * predicate. The synthetic schema has no l_shipmode, so mode
    * derives deterministically from the supplier key (pmod 3 → the
    * three carriers) — pure map-side arithmetic both engines mirror.
    * Late = shipped > 45 days after the order date, within one year;
    * the year band rides the lineitem scan, the lateness predicate is
    * a residual on the order join's equi key. */
  val q12ShipModes = QueryDef(
    "q12_ship_modes",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      li.join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            datediff(to_date(col("l_shipdate")),
              to_date(col("o_orderdate"))) > 45)
        .select(
          element_at(array(lit("MAIL"), lit("SHIP"), lit("RAIL")),
            (pmod(col("l_suppkey"), lit(3)) + 1).cast("int"))
            .as("ship_mode"),
          col("o_orderpriority"))
        .groupBy("ship_mode")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("ship_mode")
    },
    Some("""SELECT ['MAIL', 'SHIP', 'RAIL'][CAST(l_suppkey % 3 AS INT) + 1]
                     AS ship_mode,
                   CAST(SUM(CASE WHEN o_orderpriority IN
                       ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
                     AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority NOT IN
                       ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
                     AS low_line_count
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND date_diff('day', CAST(o_orderdate AS DATE),
                    CAST(l_shipdate AS DATE)) > 45
            GROUP BY 1 ORDER BY 1"""))

  /** R125 — TPC-H Q20 shape (potential part promotion): suppliers in
    * one region holding EXCESS volume of name-filtered parts — the
    * nested IN chain (supplier IN pairs-with-excess, part IN
    * name-filter) with a correlated half-quantity threshold, all
    * decorrelated to keyed aggregates + semi joins. Excess for a
    * (supplier, part): lifetime quantity more than double what the
    * pair shipped in the focus year (the original's
    * availqty > ½·year-shipments test re-expressed on shipment
    * history). Quantities are integral doubles → cast long per row,
    * so both sums and the 2× comparison are exact integers. One
    * (supp, part) aggregate carries BOTH sums via a conditional — a
    * second scan for the year slice would double the fact I/O. */
  val q20ExcessSuppliers = QueryDef(
    "q20_excess_suppliers",
    (s, d) => {
      val redParts = Tables.part(s, d)
        .filter(col("p_name").startsWith("red"))
        .select(col("p_partkey"))
      val pairQty = Tables.lineitem(s, d)
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(
          sum(col("l_quantity").cast("long")).as("total_qty"),
          sum(when(
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"),
            col("l_quantity").cast("long")).otherwise(0L)).as("yr_qty"))
      val excess = pairQty
        .filter(col("yr_qty") > 0 &&
          col("total_qty") > col("yr_qty") * 2)
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d))
            .join(broadcast(Tables.region(s, d)),
              col("n_regionkey") === col("r_regionkey"))
            .filter(col("r_name") === "ASIA")
            .select(col("n_nationkey"), col("n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy("s_suppkey")
    },
    Some("""WITH pair AS (
              SELECT l_suppkey, l_partkey,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS total_qty,
                     CAST(SUM(CASE WHEN
                         l_shipdate >= TIMESTAMP '1997-01-01'
                         AND l_shipdate < TIMESTAMP '1998-01-01'
                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
                       AS yr_qty
              FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'red%')
              GROUP BY 1, 2)
            SELECT s_suppkey, s_name, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND s_suppkey IN (SELECT l_suppkey FROM pair
                                WHERE yr_qty > 0
                                  AND total_qty > yr_qty * 2)
            ORDER BY s_suppkey"""))

  val all: Seq[QueryDef] = Seq(qTopkTies, qNestOrders, qPercentileDisc,
    qRollingVol,
    q2MinCostSupplier, q9ProductProfit, q11ImportantParts, q12ShipModes,
    q20ExcessSuppliers,
    q4OrderPriority, q6RevenueChange, q8MarketShare, q13OrderDistribution,
    q14PromoShare, q15TopSupplier, q16SupplierCount, q17SmallQtyRevenue,
    q19DisjunctivePred, q22DormantCustomers, qUnionEvolved)
}
