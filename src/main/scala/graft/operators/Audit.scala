package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R70/R71 — data-audit statistics: Benford first-digit conformance
  * and Gini concentration. Both follow the R59/R60 hash-exact recipe:
  * quantize doubles to integer cents FIRST, accumulate as
  * BIGINT/DECIMAL (order-free, so hash-stable at any parallelism),
  * divide once at the end.
  *
  * Reference analogue: the per-batch quality/audit checks an ETL
  * service runs before accepting a load (Net7-ETL-Bus
  * Net7EtlBus.Service/Workers/ServiceBusWorker.cs logs batch
  * validity) — here the validity tests are statistical laws.
  */
object Audit {

  /** R70 — Benford's-law first-digit audit of line-item prices: a
    * fabricated or truncated numeric column drifts from the
    * log10(1+1/d) law long before row-level checks notice. First
    * significant digit is taken from the STRING of the positive cents
    * value — no float log10 near power-of-ten edges. Per digit:
    * observed vs expected proportion (ppm) and |deviation|; the
    * Benford MAD statistic (mean |dev| over the 9 digits, the
    * standard conformance threshold test) repeats per row, summed
    * from the quantized longs so no cross-engine float accumulation
    * exists. One map-side digit extraction + one 9-key aggregation —
    * audit cost is a single scan at any scale. */
  val qBenford = QueryDef(
    "q_benford",
    (s, d) => {
      val cents = Tables.lineitem(s, d)
        .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long")
          .as("cents"))
        .filter(col("cents") > 0)
      val per = cents
        .select(substring(col("cents").cast("string"), 1, 1).cast("int")
          .as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val wAll = Window.orderBy("digit")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      per
        .withColumn("total", sum("n").over(wAll))
        .withColumn("obs_q", expr("(n * 1000000) div total"))
        .withColumn("exp_q",
          floor(log10(lit(1.0) + lit(1.0) / col("digit")) * 1e6)
            .cast("long"))
        .withColumn("dev_q", abs(col("obs_q") - col("exp_q")))
        .select(col("digit"), col("n"), col("obs_q"), col("exp_q"),
          col("dev_q"),
          expr("sum(dev_q) OVER (ORDER BY digit ROWS BETWEEN UNBOUNDED "
            + "PRECEDING AND UNBOUNDED FOLLOWING) div 9").as("mad_q"))
        .orderBy("digit")
    },
    Some("""WITH cents AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5)
                             AS BIGINT) AS cents
                           FROM lineitem
                           WHERE floor(l_extendedprice * 100 + 0.5) > 0),
             per AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1)
                       AS INT) AS digit,
                       CAST(count(*) AS BIGINT) AS n
                     FROM cents GROUP BY 1),
             g AS (SELECT digit, n,
                     CAST((n * 1000000) // SUM(n) OVER () AS BIGINT)
                       AS obs_q,
                     CAST(floor(log10(1.0 + 1.0 / digit) * 1e6) AS BIGINT)
                       AS exp_q
                   FROM per),
             dv AS (SELECT *, abs(obs_q - exp_q) AS dev_q FROM g)
             SELECT digit, n, obs_q, exp_q, dev_q,
                    CAST(SUM(dev_q) OVER () // 9 AS BIGINT) AS mad_q
             FROM dv ORDER BY digit"""))

  /** R71 — Gini concentration of customer revenue per nation: how
    * unequally is spend distributed over the customer base. Sorted-sum
    * identity G = (2·Σ i·x_i)/(n·Σx) − (n+1)/n over cents-exact
    * revenues; the rank window is PARTITIONED by nation (never a
    * global sort), and equal revenues give an order-invariant Σ i·x_i,
    * so the custkey tiebreak affects nothing but determinism of the
    * plan. Revenue accumulation is DECIMAL(38,0) — exact, order-free.
    * At 100 TB this is one custkey agg + one nation-partitioned rank;
    * nations are the natural bounded partition key. */
  val qGini = QueryDef(
    "q_gini",
    (s, d) => {
      val rev = Tables.orders(s, d)
        .select(col("o_custkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .groupBy("o_custkey")
        .agg(sum(col("cents").cast("decimal(38,0)")).as("rev"))
      val withNation = rev
        .join(Tables.customer(s, d).select(col("c_custkey"),
          col("c_nationkey").cast("int").as("nation")),
          col("o_custkey") === col("c_custkey"))
      val w = Window.partitionBy("nation")
        .orderBy(col("rev"), col("o_custkey"))
      withNation
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy("nation")
        .agg(count(lit(1)).as("n_customers"),
          sum("rev").as("total"),
          sum(col("rev") * col("i")).as("weighted"))
        .select(col("nation"), col("n_customers"),
          col("total").cast("long").as("total_cents"),
          floor((lit(2.0) * col("weighted").cast("double")
            / (col("n_customers").cast("double")
              * col("total").cast("double"))
            - (col("n_customers") + 1).cast("double")
              / col("n_customers").cast("double")) * 1e6)
            .cast("long").as("gini_q"))
        .orderBy("nation")
    },
    Some("""WITH rev AS (SELECT o_custkey,
                           SUM(CAST(floor(o_totalprice * 100 + 0.5)
                             AS BIGINT)) AS rev
                         FROM orders GROUP BY 1),
             j AS (SELECT rev.o_custkey, rev.rev,
                     CAST(c.c_nationkey AS INT) AS nation
                   FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey),
             r AS (SELECT *, CAST(row_number() OVER (PARTITION BY nation
                     ORDER BY rev, o_custkey) AS BIGINT) AS i
                   FROM j),
             a AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_customers,
                     SUM(rev) AS total, SUM(rev * i) AS weighted
                   FROM r GROUP BY 1)
             SELECT nation, n_customers,
                    CAST(total AS BIGINT) AS total_cents,
                    CAST(floor((2.0 * CAST(weighted AS DOUBLE)
                      / (CAST(n_customers AS DOUBLE) * CAST(total AS DOUBLE))
                      - CAST(n_customers + 1 AS DOUBLE)
                        / CAST(n_customers AS DOUBLE)) * 1e6) AS BIGINT)
                      AS gini_q
             FROM a ORDER BY nation"""))

  /** R88 — 2-D skyline (Pareto frontier): per return-flag group, the
    * line items no other item dominates on (cheaper price, larger
    * quantity) — the multi-objective "best tradeoffs" query. The
    * naive form is a quadratic NOT EXISTS self-join; the sort trick
    * makes it one window: dedupe exact (price, qty) points, order by
    * (price asc, qty desc), and a point is on the frontier iff its
    * quantity beats the running max over all STRICTLY EARLIER points
    * (ties resolved by the dedup + sort order — see the spec's
    * dominance replay). Exact cents integers throughout. The group
    * window is the R14 partitioned family; a corpus-scale skyline
    * range-partitions on price and merges per-partition frontiers. */
  val qSkyline = QueryDef(
    "q_skyline",
    (s, d) => {
      val pts = Tables.lineitem(s, d).select(
        col("l_returnflag").as("g"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("price_c"),
        floor(col("l_quantity") * 100 + 0.5).cast("long").as("qty_c"))
        .distinct()
      val w = Window.partitionBy("g")
        .orderBy(col("price_c").asc, col("qty_c").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      pts
        .withColumn("prev_max", max("qty_c").over(w))
        .filter(col("prev_max").isNull || col("qty_c") > col("prev_max"))
        .select(col("g"), col("price_c"), col("qty_c"))
        .orderBy("g", "price_c")
    },
    Some("""WITH pts AS (SELECT DISTINCT l_returnflag AS g,
                           CAST(floor(l_extendedprice * 100 + 0.5)
                             AS BIGINT) AS price_c,
                           CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
                             AS qty_c
                         FROM lineitem),
             r AS (SELECT *, MAX(qty_c) OVER (PARTITION BY g
                     ORDER BY price_c ASC, qty_c DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS prev_max
                   FROM pts)
             SELECT g, price_c, qty_c FROM r
             WHERE prev_max IS NULL OR qty_c > prev_max
             ORDER BY g, price_c"""))

  /** R109 — k-anonymity audit over the generalization lattice: a
    * release is k-anonymous on its quasi-identifiers when every
    * combination groups ≥ k rows; the privacy call is which
    * GENERALIZATION level (drop/coarsen columns) reaches k with the
    * least information loss. One GROUPING SETS pass computes every
    * lattice level's group sizes in a single Expand + aggregation —
    * no per-level re-scan — and a second O(groups) rollup scores each
    * level: distinct groups, violating groups (size < k), and rows at
    * risk. grouping_id names the level exactly as R21/R30 do. */
  val K = 5L

  val qKAnonymity = QueryDef(
    "q_k_anonymity",
    (s, d) => {
      val c = graft.Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"))
      // grouping-sets pass: (nation, segment), (nation), (segment)
      val lattice = c
        .groupingSets(
          Seq(Seq(col("c_nationkey"), col("c_mktsegment")),
            Seq(col("c_nationkey")), Seq(col("c_mktsegment"))),
          col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .filter(col("gid") =!= 3) // the () set is not a lattice level
      lattice.groupBy("gid")
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("n") < K, 1L).otherwise(0L)).as("n_violating"),
          sum(when(col("n") < K, col("n")).otherwise(0L)).as("rows_at_risk"))
        .orderBy("gid")
    },
    Some(s"""WITH l AS (
               SELECT c_nationkey, c_mktsegment,
                      GROUPING(c_nationkey, c_mktsegment) AS gid,
                      CAST(count(*) AS BIGINT) AS n
               FROM customer
               GROUP BY GROUPING SETS ((c_nationkey, c_mktsegment),
                                       (c_nationkey), (c_mktsegment)))
             SELECT gid, CAST(count(*) AS BIGINT) AS n_groups,
                    CAST(SUM(CASE WHEN n < $K THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_violating,
                    CAST(SUM(CASE WHEN n < $K THEN n ELSE 0 END) AS BIGINT)
                      AS rows_at_risk
             FROM l GROUP BY gid ORDER BY gid"""))

  /** R119 — header/detail reconciliation: does each order's header
    * total equal the sum of its line amounts — the invoice-level
    * VALUE-consistency audit referential checks can't see (the keys
    * join fine; the MONEY disagrees). One key join + one keyed
    * aggregation, drift in exact integer cents; the per-nation rollup
    * reports how many headers disagree and by how much in each
    * direction — on this synthetic data the columns are independent,
    * so the audit correctly reports ~everything drifting, which is
    * exactly what it exists to catch. */
  val qInvoiceReconcile = QueryDef(
    "q_invoice_reconcile",
    (s, d) => {
      val lineSums = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
          .as("detail_c"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("header_c"))
        .join(lineSums, col("o_orderkey") === col("l_orderkey"), "left")
        .na.fill(0L, Seq("detail_c"))
        .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("int").as("nation"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("header_c") =!= col("detail_c"), 1L).otherwise(0L))
            .as("n_mismatched"),
          sum(when(col("header_c") > col("detail_c"),
            col("header_c") - col("detail_c")).otherwise(0L))
            .as("over_c"),
          sum(when(col("detail_c") > col("header_c"),
            col("detail_c") - col("header_c")).otherwise(0L))
            .as("under_c"))
        .orderBy("nation")
    },
    Some("""WITH ls AS (SELECT l_orderkey,
                   SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                     AS detail_c
                 FROM lineitem GROUP BY 1),
            j AS (SELECT o.o_orderkey, o.o_custkey,
                    CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                      AS header_c,
                    COALESCE(ls.detail_c, 0) AS detail_c
                  FROM orders o LEFT JOIN ls ON o.o_orderkey = ls.l_orderkey)
            SELECT CAST(c.c_nationkey AS INT) AS nation,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CASE WHEN header_c <> detail_c THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_mismatched,
                   CAST(SUM(CASE WHEN header_c > detail_c
                     THEN header_c - detail_c ELSE 0 END) AS BIGINT) AS over_c,
                   CAST(SUM(CASE WHEN detail_c > header_c
                     THEN detail_c - header_c ELSE 0 END) AS BIGINT) AS under_c
            FROM j JOIN customer c ON j.o_custkey = c.c_custkey
            GROUP BY 1 ORDER BY 1"""))

  /** R120 — behavioral bitmask segmentation: each user's set of seen
    * event types packs into ONE integer via bit_or of 1<<type-index
    * (the set-as-bitmask encoding behind audience segments and
    * feature-flag cohorts), then segment sizes read off the mask
    * domain — two keyed aggregations, the second over ≤ 2^#types rows;
    * set operations on segments become bitwise AND/OR on longs. */
  val qBehaviorBitmask = QueryDef(
    "q_behavior_bitmask",
    (s, d) => {
      val typeBit = expr("CASE event_type WHEN 'view' THEN 1 " +
        "WHEN 'click' THEN 2 WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8 " +
        "WHEN 'error' THEN 16 END")
      Tables.events(s, d)
        // a 2-day activity window leaves partial masks (the full month
        // saturates every user to the all-types mask — no segments)
        .filter(col("ts") < lit("2024-01-03").cast("timestamp"))
        .select(col("user_id"), typeBit.as("bit"))
        .groupBy("user_id")
        .agg(expr("bit_or(bit)").as("mask"))
        .groupBy("mask")
        .agg(count(lit(1)).as("n_users"))
        .withColumn("has_purchased", (col("mask").bitwiseAND(4) =!= 0))
        .orderBy("mask")
    },
    Some("""WITH m AS (
              SELECT user_id,
                     bit_or(CASE event_type WHEN 'view' THEN 1
                       WHEN 'click' THEN 2 WHEN 'purchase' THEN 4
                       WHEN 'signup' THEN 8 WHEN 'error' THEN 16 END) AS mask
              FROM events WHERE ts < TIMESTAMP '2024-01-03' GROUP BY 1)
            SELECT mask, CAST(count(*) AS BIGINT) AS n_users,
                   (mask & 4) <> 0 AS has_purchased
            FROM m GROUP BY mask ORDER BY mask"""))

  def all: Seq[QueryDef] = Seq(qBenford, qGini, qSkyline, qKAnonymity,
    qInvoiceReconcile, qBehaviorBitmask)
}
