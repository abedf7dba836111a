package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E37 — as-of rate semantics (values are oracle-gated via a genuine
  * DuckDB ASOF JOIN). */
class FxSpec extends SparkSpec {

  test("E37: every order converts with the LATEST rate at or before its date") {
    val rows = Fx.etlFxNormalize.fn(spark, sf).collect()
    val nOrders = graft.Tables.orders(spark, sf).count()
    assert(rows.length === nOrders,
      "as-of semantics must lose no order (the equi-month-join trap)")
    rows.foreach { r =>
      val cents = r.getAs[Long]("cents")
      val rate = r.getAs[Long]("rate_ppm")
      assert(r.getAs[Long]("base_cents") === cents * rate / 1000000L)
      assert(rate >= 1000000L && rate < 1200000L, "rates in the generated band")
    }
    // replay the as-of pick for a sample: the chosen rate must be the
    // max valid_from <= order date for the order's currency
    val sample = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderdate")).limit(20).collect()
      .map(r => r.getLong(0) ->
        r.get(1).toString.substring(0, 7)).toMap
    val byKey = rows.map(r => r.getAs[Long]("o_orderkey") -> r).toMap
    sample.foreach { case (k, ym) =>
      val Array(y, m) = ym.split("-").map(_.toInt)
      val ymId = y * 12 + m - 1
      val cidx = (k % 3).toInt
      val expectRate = 1000000L + (ymId.toLong * 7919L +
        cidx * 104729L) % 200000L
      assert(byKey(k).getAs[Long]("rate_ppm") === expectRate,
        s"order $k in month $ym must use that month's rate")
    }
  }
}
