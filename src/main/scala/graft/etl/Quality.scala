package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E11/E12 — the two validation operators every production ETL bus
  * runs around its loads: a declarative data-quality constraint suite
  * (Deequ-shaped) and a key-level table diff (migration/backfill
  * reconciliation). Both are ordinary aggregates/joins — one pass for
  * the row-level constraints, one key shuffle for the diff — so they
  * run at fact-table scale as cheaply as any groupBy.
  *
  * Reference analogue: Net7EtlBus validates per-record completeness
  * before skipping enrichment (`DataflowProcessor.cs:117-152`) and
  * trusts EF/PostgreSQL constraints for the rest; at 100 TB
  * constraints move into the engine as aggregates over the data.
  */
object Quality {

  /** E11: one-pass data-quality constraint suite over lineitem (+ one
    * anti-join for the referential check, which is a join by nature).
    * Emits (check_name, metric, passed) — metric is the fraction
    * satisfying the constraint, 6dp. The composite-key uniqueness
    * check folds (l_orderkey, l_linenumber) into the exact integer
    * l_orderkey·10 + l_linenumber (linenumber is 1..7 by TPC-H
    * construction) so both engines count-distinct the same scalar. */
  val qualityChecks = QueryDef(
    "etl_quality_checks",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val pk = col("l_orderkey") * 10 + col("l_linenumber")
      val base = li.agg(
        count(lit(1)).as("n"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("null_ship"),
        countDistinct(pk).as("pk_distinct"),
        sum(when(col("l_quantity").between(1, 50), 0L).otherwise(1L)).as("qty_oob"),
        sum(when(col("l_extendedprice") >= 0, 0L).otherwise(1L)).as("neg_price"))
      val orphans = li.join(Tables.orders(s, d),
          li("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("orphans"))
      base.crossJoin(broadcast(orphans)) // 1-row × 1-row
        .select(explode(array(
          struct(lit("completeness_l_shipdate").as("check_name"),
            round(lit(1.0) - col("null_ship") / col("n"), 6).as("metric"),
            (col("null_ship") === 0).as("passed")),
          struct(lit("pk_uniqueness").as("check_name"),
            round(col("pk_distinct") / col("n"), 6).as("metric"),
            (col("pk_distinct") === col("n")).as("passed")),
          struct(lit("range_quantity_1_50").as("check_name"),
            round(lit(1.0) - col("qty_oob") / col("n"), 6).as("metric"),
            (col("qty_oob") === 0).as("passed")),
          struct(lit("nonnegative_extendedprice").as("check_name"),
            round(lit(1.0) - col("neg_price") / col("n"), 6).as("metric"),
            (col("neg_price") === 0).as("passed")),
          struct(lit("ri_orderkey_in_orders").as("check_name"),
            round(lit(1.0) - col("orphans") / col("n"), 6).as("metric"),
            (col("orphans") === 0).as("passed")))).as("c"))
        .select(col("c.*"))
        .orderBy("check_name")
    },
    Some("""WITH m AS (
              SELECT COUNT(*) AS n,
                     SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS null_ship,
                     COUNT(DISTINCT l_orderkey * 10 + l_linenumber) AS pk_distinct,
                     SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS qty_oob,
                     SUM(CASE WHEN l_extendedprice >= 0 THEN 0 ELSE 1 END) AS neg_price
              FROM lineitem),
            o AS (
              SELECT COUNT(*) AS orphans FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
            SELECT * FROM (
              SELECT 'completeness_l_shipdate' AS check_name,
                     ROUND(1.0 - CAST(null_ship AS DOUBLE) / n, 6) AS metric,
                     null_ship = 0 AS passed FROM m
              UNION ALL
              SELECT 'pk_uniqueness',
                     ROUND(CAST(pk_distinct AS DOUBLE) / n, 6),
                     pk_distinct = n FROM m
              UNION ALL
              SELECT 'range_quantity_1_50',
                     ROUND(1.0 - CAST(qty_oob AS DOUBLE) / n, 6),
                     qty_oob = 0 FROM m
              UNION ALL
              SELECT 'nonnegative_extendedprice',
                     ROUND(1.0 - CAST(neg_price AS DOUBLE) / n, 6),
                     neg_price = 0 FROM m
              UNION ALL
              SELECT 'ri_orderkey_in_orders',
                     ROUND(1.0 - CAST(orphans AS DOUBLE) / n, 6),
                     orphans = 0 FROM m, o)
            ORDER BY check_name"""))

  /** E12: key-level table diff — reconcile a table against its
    * backfilled/migrated successor: full outer join on the key,
    * null-safe comparison of the value columns, one row per difference
    * tagged added / removed / changed. The "updated" side here is a
    * deterministic synthetic edit of orders (drop keys % 89 = 0, bump
    * totalprice on % 97 = 0, re-add keys % 101 = 0 shifted by 10M) so
    * DuckDB reconstructs the identical pair of tables. One shuffle on
    * the key; comparisons are map-side. */
  /** Generic key-level diff (the E12 classification as a reusable
    * transform): one full-outer key shuffle, null-safe value compare
    * map-side, one row per differing key tagged added/removed/changed.
    * `a` is the old state, `b` the new; both carry `key` + `valueCols`. */
  def keyDiff(a: DataFrame, b: DataFrame, key: String,
      valueCols: Seq[String]): DataFrame = {
    val av = a.select((key +: valueCols).map(col): _*)
      .withColumnsRenamed(valueCols.map(c => c -> s"${c}_a").toMap)
    val bv = b.select((key +: valueCols).map(col): _*)
      .withColumnsRenamed(valueCols.map(c => c -> s"${c}_b").toMap)
    val allNullA = valueCols.map(c => col(s"${c}_a").isNull).reduce(_ && _)
    val allNullB = valueCols.map(c => col(s"${c}_b").isNull).reduce(_ && _)
    val changed = valueCols
      .map(c => !(col(s"${c}_a") <=> col(s"${c}_b"))).reduce(_ || _)
    av.join(bv, Seq(key), "full_outer")
      .withColumn("change",
        when(allNullA, lit("added"))
          .when(allNullB, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("change").isNotNull)
      .select(col(key), col("change"))
  }

  /** E23 — run-over-run audit: what did last night's job change?
    * Composes IO15's stable-ordinal time travel with the E12 diff —
    * any two retained snapshot versions reconcile without the job
    * having logged anything. The read every incident review starts
    * with. */
  def snapshotDiff(spark: org.apache.spark.sql.SparkSession, root: String,
      vOld: Int, vNew: Int, key: String, valueCols: Seq[String]): DataFrame =
    keyDiff(Snapshots.readVersion(spark, root, vOld),
      Snapshots.readVersion(spark, root, vNew), key, valueCols)

  val tableDiff = QueryDef(
    "etl_table_diff",
    (s, d) => {
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"),
          col("o_orderstatus").as("status"))
      val updated = base.filter(col("k") % 89 =!= 0)
        .withColumn("price",
          when(col("k") % 97 === 0, col("price") + 1).otherwise(col("price")))
        .unionByName(base.filter(col("k") % 101 === 0)
          .select((col("k") + 10000000L).as("k"), col("price"), col("status")))
      val a = base.select(col("k"), col("price").as("price_a"), col("status").as("status_a"))
      val b = updated.select(col("k"), col("price").as("price_b"), col("status").as("status_b"))
      a.join(b, Seq("k"), "full_outer")
        .withColumn("change",
          when(col("price_a").isNull && col("status_a").isNull, lit("added"))
            .when(col("price_b").isNull && col("status_b").isNull, lit("removed"))
            .when(!(col("price_a") <=> col("price_b")) ||
              !(col("status_a") <=> col("status_b")), lit("changed")))
        .filter(col("change").isNotNull)
        .select(col("k"), col("change"))
        .orderBy("k", "change")
    },
    Some("""WITH base AS (
              SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status
              FROM orders),
            updated AS (
              SELECT k,
                     CASE WHEN k % 97 = 0 THEN price + 1 ELSE price END AS price,
                     status
              FROM base WHERE k % 89 <> 0
              UNION ALL
              SELECT k + 10000000, price, status FROM base WHERE k % 101 = 0)
            SELECT COALESCE(a.k, b.k) AS k,
                   CASE WHEN a.k IS NULL THEN 'added'
                        WHEN b.k IS NULL THEN 'removed'
                        WHEN (a.price IS DISTINCT FROM b.price)
                          OR (a.status IS DISTINCT FROM b.status) THEN 'changed'
                   END AS change
            FROM base a FULL OUTER JOIN updated b ON a.k = b.k
            WHERE CASE WHEN a.k IS NULL THEN 'added'
                       WHEN b.k IS NULL THEN 'removed'
                       WHEN (a.price IS DISTINCT FROM b.price)
                         OR (a.status IS DISTINCT FROM b.status) THEN 'changed'
                  END IS NOT NULL
            ORDER BY k, change"""))

  /** E48 — whole-star referential-integrity audit: every foreign-key
    * edge of the schema (orders→customer, lineitem→orders,
    * lineitem→part, lineitem→supplier, customer→nation,
    * supplier→nation, nation→region) checked in ONE entry — per edge
    * the child row count, orphan count (children whose parent key
    * resolves to nothing) and distinct orphan keys. The pre-publish
    * gate for a snapshot (IO17 makes multi-table commits atomic; this
    * proves the committed group is internally CONSISTENT — atomicity
    * and integrity are different promises). E11 checks one table's
    * values; E41 walks one cascade; this sweeps every edge.
    *
    * Scale: each edge is one LEFT ANTI-style join on its key — the
    * child table's single key shuffle (dims broadcast where small);
    * counts are partial-aggregable. Edges are independent, so Spark
    * schedules them concurrently inside the one union plan.
    */
  val starIntegrity = QueryDef(
    "etl_star_integrity",
    (s, d) => {
      def edge(name: String, child: org.apache.spark.sql.DataFrame,
          childKey: String, parent: org.apache.spark.sql.DataFrame,
          parentKey: String) = {
        val p = parent.select(col(parentKey).as("_pk")).distinct()
          .withColumn("_found", lit(true))
        child.select(col(childKey).as("_ck"))
          .join(p, col("_ck") === col("_pk"), "left")
          .agg(
            lit(name).as("edge"),
            count(lit(1)).as("n_children"),
            sum(when(col("_found").isNull, lit(1L)).otherwise(lit(0L)))
              .as("n_orphans"),
            count_distinct(when(col("_found").isNull, col("_ck")))
              .as("n_orphan_keys"))
      }
      val o = Tables.orders(s, d); val li = Tables.lineitem(s, d)
      val c = Tables.customer(s, d); val su = Tables.supplier(s, d)
      val p = Tables.part(s, d); val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      Seq(
        edge("orders->customer", o, "o_custkey", c, "c_custkey"),
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("lineitem->part", li, "l_partkey", p, "p_partkey"),
        edge("lineitem->supplier", li, "l_suppkey", su, "s_suppkey"),
        edge("customer->nation", c, "c_nationkey", n, "n_nationkey"),
        edge("supplier->nation", su, "s_nationkey", n, "n_nationkey"),
        edge("nation->region", n, "n_regionkey", r, "r_regionkey"))
        .reduce(_ unionAll _)
        .orderBy("edge")
    },
    Some("""WITH e AS (
              SELECT 'orders->customer' AS edge,
                     CAST(count(*) AS BIGINT) AS n_children,
                     CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT) AS n_orphans,
                     CAST(count(DISTINCT o.o_custkey) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT) AS n_orphan_keys
              FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
              UNION ALL
              SELECT 'lineitem->orders',
                     CAST(count(*) AS BIGINT),
                     CAST(count(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT),
                     CAST(count(DISTINCT l.l_orderkey) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT)
              FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
              UNION ALL
              SELECT 'lineitem->part',
                     CAST(count(*) AS BIGINT),
                     CAST(count(*) FILTER (WHERE p.p_partkey IS NULL) AS BIGINT),
                     CAST(count(DISTINCT l.l_partkey) FILTER (WHERE p.p_partkey IS NULL) AS BIGINT)
              FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
              UNION ALL
              SELECT 'lineitem->supplier',
                     CAST(count(*) AS BIGINT),
                     CAST(count(*) FILTER (WHERE s.s_suppkey IS NULL) AS BIGINT),
                     CAST(count(DISTINCT l.l_suppkey) FILTER (WHERE s.s_suppkey IS NULL) AS BIGINT)
              FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
              UNION ALL
              SELECT 'customer->nation',
                     CAST(count(*) AS BIGINT),
                     CAST(count(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT),
                     CAST(count(DISTINCT c.c_nationkey) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
              FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
              UNION ALL
              SELECT 'supplier->nation',
                     CAST(count(*) AS BIGINT),
                     CAST(count(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT),
                     CAST(count(DISTINCT s.s_nationkey) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
              FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
              UNION ALL
              SELECT 'nation->region',
                     CAST(count(*) AS BIGINT),
                     CAST(count(*) FILTER (WHERE r.r_regionkey IS NULL) AS BIGINT),
                     CAST(count(DISTINCT n.n_regionkey) FILTER (WHERE r.r_regionkey IS NULL) AS BIGINT)
              FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey)
            SELECT * FROM e ORDER BY edge"""))

  val all: Seq[QueryDef] = Seq(qualityChecks, tableDiff, starIntegrity)
}
