package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** E49 — per-subject data EXPORT (GDPR right-of-access; the read
  * counterpart of E41's right-to-erasure cascade): everything the
  * star knows about a subject assembled into ONE canonical nested
  * document — customer fields, their orders, each order's line items
  * — serialized DETERMINISTICALLY (orders sorted by key, lines by
  * line number, integer cents only) so the export payload is
  * byte-reproducible; the entry emits per subject the structural
  * counts plus the md5 of the canonical serialization, and the DuckDB
  * oracle rebuilds the identical string from the same tables — a
  * cross-engine export-fidelity gate (the R115 flatten-the-nest
  * convention: scalars hash in the driver where nested arrays
  * wouldn't).
  *
  * Scale: an export is per-REQUEST (a handful of subjects, never the
  * table) — the subject set here is a bounded deterministic sample;
  * the per-order and per-subject collects are bounded by the
  * data-model fan-out (lines per order, orders per customer), the
  * sessionize/pack valve class. Joins key on order/customer — the
  * star's natural keys.
  */
object SubjectExport {

  val etlSubjectExport = QueryDef(
    "etl_subject_export",
    (s, d) => {
      val subjects = Tables.customer(s, d)
        .filter(col("c_custkey") % 199 === 1)
        .select(col("c_custkey").as("key"), col("c_name").as("name"))
      val orders = Tables.orders(s, d)
        .join(subjects, col("o_custkey") === col("key"))
        .select(col("key"), col("o_orderkey"))
      val lines = Tables.lineitem(s, d)
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("key"), col("l_orderkey"),
          col("l_linenumber").as("ln"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("price_c"))
      val perOrder = lines.groupBy("key", "l_orderkey").agg(
        count(lit(1)).as("n_lines"),
        sum("price_c").as("order_cents"),
        // the synthetic line numbers are NON-UNIQUE within an order
        // (the R149 tie trap), so the serialization order must be the
        // total (ln, price_c) key; full-duplicate lines concat
        // order-invariantly either way
        array_join(
          transform(
            sort_array(collect_list(struct(col("ln"), col("price_c"),
              concat(col("ln"), lit(":"), col("price_c")).as("s")))),
            x => x("s")),
          ",").as("lines_str"))
        .withColumn("order_str",
          concat(col("l_orderkey"), lit("["), col("lines_str"), lit("]")))
      val perSubject = perOrder.groupBy("key").agg(
        count(lit(1)).as("n_orders"),
        sum("n_lines").as("n_lines"),
        sum("order_cents").as("total_cents"),
        array_join(
          transform(
            sort_array(collect_list(struct(col("l_orderkey"),
              col("order_str").as("s")))),
            x => x("s")),
          ";").as("orders_str"))
      subjects.join(perSubject, Seq("key"), "left")
        .select(col("key"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_lines"), lit(0L)).as("n_lines"),
          coalesce(col("total_cents"), lit(0L)).as("total_cents"),
          md5(concat(col("key"), lit("|"), col("name"), lit("|"),
            coalesce(col("orders_str"), lit(""))).cast("binary"))
            .as("export_md5"))
        .orderBy("key")
    },
    Some("""WITH subjects AS (
              SELECT c_custkey AS key, c_name AS name FROM customer
              WHERE c_custkey % 199 = 1),
            lines AS (
              SELECT s.key, l.l_orderkey, l.l_linenumber AS ln,
                     CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS price_c
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN subjects s ON o.o_custkey = s.key),
            per_order AS (
              SELECT key, l_orderkey,
                     CAST(count(*) AS BIGINT) AS n_lines,
                     CAST(SUM(price_c) AS BIGINT) AS order_cents,
                     l_orderkey || '[' ||
                       string_agg(ln || ':' || price_c, ','
                                  ORDER BY ln, price_c)
                       || ']' AS order_str
              FROM lines GROUP BY 1, 2),
            per_subject AS (
              SELECT key,
                     CAST(count(*) AS BIGINT) AS n_orders,
                     CAST(SUM(n_lines) AS BIGINT) AS n_lines,
                     CAST(SUM(order_cents) AS BIGINT) AS total_cents,
                     string_agg(order_str, ';' ORDER BY l_orderkey)
                       AS orders_str
              FROM per_order GROUP BY 1)
            SELECT s.key,
                   COALESCE(p.n_orders, 0) AS n_orders,
                   COALESCE(p.n_lines, 0) AS n_lines,
                   COALESCE(p.total_cents, 0) AS total_cents,
                   md5(s.key || '|' || s.name || '|'
                       || COALESCE(p.orders_str, '')) AS export_md5
            FROM subjects s LEFT JOIN per_subject p ON s.key = p.key
            ORDER BY s.key"""))

  val all: Seq[QueryDef] = Seq(etlSubjectExport)
}
