package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E41 — subject-erasure CASCADE plan (GDPR right-to-be-forgotten,
  * the per-SUBJECT complement of E36's time-based retention sweep):
  * a set of data subjects must vanish, and their deletion has to
  * PROPAGATE through the referential chain — the customers
  * themselves, every order they placed, every line item of those
  * orders — or the "erased" subject survives in joinable shadows.
  *
  * The entry emits the reviewable erasure plan: per table the total /
  * delete / keep counts plus `n_orphans_after`, the referential-
  * integrity witness (kept orders referencing deleted customers, kept
  * line items referencing deleted orders — exactly zero when the
  * cascade is closed; a broken cascade shows up as a non-zero row the
  * oracle and spec both catch). Execution reuses E36's partition-
  * scoped rewrite machinery — planning, not writing, is the new
  * capability here.
  *
  * Scale shape: the cascade is two key-equi semi joins flowing DOWN
  * the FK chain (subjects → orders → lineitems) and the witnesses are
  * anti joins on the same keys — every stage keyed, no new operator
  * classes; the subject set is a filter, never a driver list. */
object Erasure {

  /** Deterministic "erasure request" subjects: ~1% of customers. */
  private def subjects(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).filter(col("c_custkey") % 100 === 7)
      .select(col("c_custkey"))

  def forgetPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val subj = subjects(s, dir)
    val cust = Tables.customer(s, dir).select(col("c_custkey"))
    val ords = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val line = Tables.lineitem(s, dir).select(col("l_orderkey"))

    val delOrders = ords.join(subj, col("o_custkey") === subj("c_custkey"),
      "left_semi")
    val keepOrders = ords.join(subj, col("o_custkey") === subj("c_custkey"),
      "left_anti")
    val delLine = line.join(delOrders.select("o_orderkey"),
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    val keepLine = line.join(delOrders.select("o_orderkey"),
      col("l_orderkey") === col("o_orderkey"), "left_anti")

    def row(tbl: String, total: DataFrame, del: DataFrame,
        orphans: DataFrame): DataFrame =
      total.agg(count(lit(1)).as("n_total"))
        .crossJoin(del.agg(count(lit(1)).as("n_delete")))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans_after")))
        .select(lit(tbl).as("tbl"), col("n_total"), col("n_delete"),
          (col("n_total") - col("n_delete")).as("n_keep"),
          col("n_orphans_after"))

    val keptCust = cust.join(subj, Seq("c_custkey"), "left_anti")
    // witnesses: kept rows still referencing an erased parent
    val orphanOrders = keepOrders
      .join(keptCust, col("o_custkey") === col("c_custkey"), "left_anti")
    val orphanLine = keepLine
      .join(keepOrders.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")

    row("customer", cust, subj, cust.limit(0))
      .unionByName(row("orders", ords, delOrders, orphanOrders))
      .unionByName(row("lineitem", line, delLine, orphanLine))
      .orderBy("tbl")
  }

  val qForgetCascade = QueryDef(
    "etl_forget_cascade",
    (s, d) => forgetPlan(s, d),
    Some("""WITH subj AS (SELECT c_custkey FROM customer
                          WHERE c_custkey % 100 = 7),
            del_o AS (SELECT o_orderkey, o_custkey FROM orders
                      WHERE o_custkey IN (SELECT c_custkey FROM subj)),
            keep_o AS (SELECT o_orderkey, o_custkey FROM orders
                       WHERE o_custkey NOT IN (SELECT c_custkey FROM subj)),
            del_l AS (SELECT l_orderkey FROM lineitem
                      WHERE l_orderkey IN (SELECT o_orderkey FROM del_o)),
            keep_l AS (SELECT l_orderkey FROM lineitem
                       WHERE l_orderkey NOT IN (SELECT o_orderkey FROM del_o)),
            kept_c AS (SELECT c_custkey FROM customer
                       WHERE c_custkey NOT IN (SELECT c_custkey FROM subj))
            SELECT * FROM (
              SELECT 'customer' AS tbl,
                     (SELECT count(*) FROM customer) AS n_total,
                     (SELECT count(*) FROM subj) AS n_delete,
                     (SELECT count(*) FROM customer)
                       - (SELECT count(*) FROM subj) AS n_keep,
                     CAST(0 AS BIGINT) AS n_orphans_after
              UNION ALL
              SELECT 'orders',
                     (SELECT count(*) FROM orders),
                     (SELECT count(*) FROM del_o),
                     (SELECT count(*) FROM orders)
                       - (SELECT count(*) FROM del_o),
                     (SELECT count(*) FROM keep_o WHERE o_custkey NOT IN
                        (SELECT c_custkey FROM kept_c))
              UNION ALL
              SELECT 'lineitem',
                     (SELECT count(*) FROM lineitem),
                     (SELECT count(*) FROM del_l),
                     (SELECT count(*) FROM lineitem)
                       - (SELECT count(*) FROM del_l),
                     (SELECT count(*) FROM keep_l WHERE l_orderkey IN
                        (SELECT o_orderkey FROM del_o)))
            ORDER BY tbl"""))

  val all: Seq[QueryDef] = Seq(qForgetCascade)
}
