package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** E49 — export fidelity: the canonical serialization replays exactly
  * from a driver-side walk of the star, and counts conserve. */
class SubjectExportSpec extends SparkSpec {

  private lazy val out = SubjectExport.etlSubjectExport.fn(spark, sf).collect()

  test("every exported document replays byte-for-byte from a driver-side star walk") {
    assert(out.nonEmpty)
    val names = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 199 === 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orders = Tables.orders(spark, sf)
      .filter(col("o_custkey") % 199 === 1)
      .collect().map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("o_custkey")))
    val orderSet = orders.map(_._1).toSet
    val lines = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey").isInCollection(orderSet))
      .select("l_orderkey", "l_linenumber",
        "l_extendedprice")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
      .groupBy(_._1)
    val byCust = orders.groupBy(_._2)
    out.foreach { r =>
      val key = r.getAs[Long]("key")
      val myOrders = byCust.getOrElse(key, Array.empty).map(_._1)
        .filter(lines.contains).sorted
      val ordersStr = myOrders.map { ok =>
        val ls = lines(ok).sortBy(l => (l._2, l._3))
          .map(l => s"${l._2}:${l._3}").mkString(",")
        s"$ok[$ls]"
      }.mkString(";")
      val doc = s"$key|${names(key)}|$ordersStr"
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(doc.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("export_md5") == md, s"subject $key")
      assert(r.getAs[Long]("n_orders") == myOrders.length.toLong, s"subject $key")
      assert(r.getAs[Long]("n_lines") ==
        myOrders.map(ok => lines(ok).length.toLong).sum, s"subject $key")
      assert(r.getAs[Long]("total_cents") ==
        myOrders.flatMap(ok => lines(ok)).map(_._3).sum, s"subject $key")
    }
  }

  test("exactly the sampled subjects export, one row each") {
    val expected = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 199 === 1).count()
    assert(out.length.toLong == expected)
    assert(out.map(_.getAs[Long]("key")).distinct.length == out.length)
  }
}
