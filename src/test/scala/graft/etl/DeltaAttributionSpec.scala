package graft.etl

import graft.SparkSpec

/** E43 — delta-attribution laws: the residual identity, class
  * conservation against independent totals, and non-vacuity. */
class DeltaAttributionSpec extends SparkSpec {

  private lazy val rows = DeltaAttribution.attribution(spark, sf).collect()

  test("E43: the attribution tiles the delta exactly on every month") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("residual") === 0L,
        s"${r.getAs[String]("month")}: ins+del+upd must equal the delta")
      assert(r.getAs[Long]("delta") ===
        r.getAs[Long]("m_v2") - r.getAs[Long]("m_base"))
    }
  }

  test("E43: all three change classes genuinely move money") {
    assert(rows.map(_.getAs[Long]("c_ins")).sum > 0, "inserts add revenue")
    assert(rows.map(_.getAs[Long]("c_del")).sum < 0, "deletes remove revenue")
    assert(rows.map(_.getAs[Long]("c_upd")).sum > 0, "the x1.1 reprice adds")
  }

  test("E43: global totals agree with independently computed snapshots") {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.orders(spark, sf)
      .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")))
      .head().getLong(0)
    assert(rows.map(_.getAs[Long]("m_base")).sum === base)
  }
}
