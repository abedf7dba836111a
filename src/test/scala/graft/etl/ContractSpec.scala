package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** E46 — row-level contract routing: exact reason lists per planted
  * corruption class, multi-violation rows, clean rows untouched. */
class ContractSpec extends SparkSpec {

  private lazy val routed = Contract.etlContractRoute.fn(spark, sf)
    .collect().map(r => r.getAs[Long]("okey") -> r.getAs[String]("reasons")).toMap

  private lazy val orderKeys = Tables.orders(spark, sf)
    .select("o_orderkey").collect().map(_.getLong(0))

  test("every planted corruption routes with exactly its reason set, in rule order") {
    orderKeys.foreach { k =>
      val expect = Seq(
        if (k % 7 == 0) Some("priority_null") else None,
        if (k % 10 == 0) Some("total_negative") else None,
        if (k % 11 == 0) Some("date_out_of_range") else None,
        if (k % 13 == 0) Some("customer_missing") else None).flatten.mkString(",")
      if (expect.isEmpty) assert(!routed.contains(k), s"clean order $k routed")
      else assert(routed.get(k).contains(expect), s"order $k")
    }
  }

  test("multi-violation rows exist and carry compound reason lists") {
    assert(routed.values.exists(_.contains(",")),
      "the lcm plants must produce at least one multi-rule violation")
  }

  test("quarantine size equals the planted corruption count exactly") {
    val expected = orderKeys.count(k =>
      k % 7 == 0 || k % 10 == 0 || k % 11 == 0 || k % 13 == 0)
    assert(routed.size == expected)
  }
}
