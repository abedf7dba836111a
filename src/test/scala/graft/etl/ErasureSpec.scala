package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E41 — erasure-cascade laws: closure (no joinable shadows survive),
  * no over-deletion, and conservation. */
class ErasureSpec extends SparkSpec {

  private lazy val rows = Erasure.forgetPlan(spark, sf).collect()
    .map(r => r.getAs[String]("tbl") -> r).toMap

  test("E41: the cascade leaves zero referential orphans") {
    assert(rows.keySet === Set("customer", "orders", "lineitem"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_orphans_after") === 0L,
        s"${r.getAs[String]("tbl")}: erased subjects must not survive in shadows")
      assert(r.getAs[Long]("n_keep") ===
        r.getAs[Long]("n_total") - r.getAs[Long]("n_delete"))
    }
    assert(rows("customer").getAs[Long]("n_delete") > 0,
      "the subject set must be non-empty for the entry to mean anything")
  }

  test("E41: cascade closure and no over-deletion, replayed independently") {
    val subj = graft.Tables.customer(spark, sf)
      .filter(col("c_custkey") % 100 === 7).select("c_custkey")
    val ords = graft.Tables.orders(spark, sf)
    // closure: counted deleted orders == orders of erased subjects
    val expectedDelOrders = ords
      .join(subj, col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(rows("orders").getAs[Long]("n_delete") === expectedDelOrders)
    // no over-deletion: deleted lineitems == lineitems of deleted orders
    val delO = ords.join(subj, col("o_custkey") === col("c_custkey"), "left_semi")
    val expectedDelLine = graft.Tables.lineitem(spark, sf)
      .join(delO.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(rows("lineitem").getAs[Long]("n_delete") === expectedDelLine)
  }
}
