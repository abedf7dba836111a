package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E25 — incremental view maintenance for a join view: the delta
  * algebra dV = (dA ⋈ C) ∪ (A ⋈ dC) ∪ (dA ⋈ dC) that lets a
  * materialized enrichment view absorb inserts WITHOUT re-joining the
  * full base tables — the maintenance shape behind every "refresh the
  * joined table nightly from the new rows" pipeline (the reference's
  * incremental exclusion idea, Net7-ETL-Bus ZipCodeImporter's skip of
  * already-processed rows, lifted from source filtering to view
  * algebra).
  *
  * The entry PARTITIONS both inputs deterministically into
  * base + insert-delta (orderkey % 5 / custkey % 7), assembles the
  * view incrementally, and must reproduce the direct full join
  * bit-for-bit — the law the oracle checks. At 100 TB the wins are
  * the joins' sizes: the three delta terms touch |dA|·|C|-selectivity
  * scale work instead of |A|·|C|, and the base view V is never
  * recomputed, only unioned. */
object Ivm {

  private def joined(a: DataFrame, c: DataFrame): DataFrame =
    a.join(c, a("o_custkey") === c("c_custkey"))
      .select(a("o_orderkey"), c("c_custkey"),
        c("c_mktsegment").as("segment"),
        floor(a("o_totalprice") * 100 + 0.5).cast("long").as("cents"))

  val etlIvmJoin = QueryDef(
    "etl_ivm_join",
    (s, d) => {
      val orders = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      val a0 = orders.filter(col("o_orderkey") % 5 =!= 0)
      val dA = orders.filter(col("o_orderkey") % 5 === 0)
      val c0 = cust.filter(col("c_custkey") % 7 =!= 0)
      val dC = cust.filter(col("c_custkey") % 7 === 0)
      val v0 = joined(a0, c0)
      val dV = joined(dA, c0).union(joined(a0, dC)).union(joined(dA, dC))
      v0.union(dV).orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, c_custkey, c_mktsegment AS segment,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            ORDER BY o_orderkey"""))

  def all: Seq[QueryDef] = Seq(etlIvmJoin)
}
