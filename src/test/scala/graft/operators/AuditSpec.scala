package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** R70/R71 — audit statistics vs driver-side references. */
class AuditSpec extends SparkSpec {

  test("R70: Benford digits are dense 1..9, proportions conserve, MAD matches") {
    val out = Audit.qBenford.fn(spark, sf).collect()
    assert(out.map(_.getAs[Int]("digit")).toSeq === (1 to 9))
    val positives = Tables.lineitem(spark, sf)
      .filter(floor(col("l_extendedprice") * 100 + 0.5) > 0).count()
    assert(out.map(_.getAs[Long]("n")).sum === positives)
    val obsSum = out.map(_.getAs[Long]("obs_q")).sum
    assert(obsSum <= 1000000L && obsSum >= 1000000L - 9,
      "observed ppm proportions must sum to 1e6 within integer-div slack")
    out.foreach { r =>
      val d = r.getAs[Int]("digit")
      assert(r.getAs[Long]("exp_q") ===
        math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)
    }
    val mad = out.map(_.getAs[Long]("dev_q")).sum / 9
    assert(out.forall(_.getAs[Long]("mad_q") === mad))
  }

  test("R71: per-nation Gini equals the sorted-sum reference exactly") {
    val out = Audit.qGini.fn(spark, sf).collect()
      .map(r => r.getAs[Int]("nation") ->
        (r.getAs[Long]("n_customers"), r.getAs[Long]("total_cents"),
          r.getAs[Long]("gini_q"))).toMap
    val rows = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("o_custkey").agg(sum("cents").as("rev"))
      .join(Tables.customer(spark, sf).select(col("c_custkey"),
        col("c_nationkey").cast("int").as("nation")),
        col("o_custkey") === col("c_custkey"))
      .select("nation", "o_custkey", "rev").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val ref = rows.groupBy(_._1).map { case (nation, rs) =>
      val sorted = rs.sortBy(t => (t._3, t._2)).map(_._3)
      val n = sorted.length.toLong
      val total = sorted.sum
      val weighted = sorted.zipWithIndex.map { case (x, i) =>
        BigInt(x) * (i + 1)
      }.sum
      val gini = 2.0 * weighted.toDouble / (n.toDouble * total.toDouble) -
        (n + 1).toDouble / n.toDouble
      nation -> (n, total, math.floor(gini * 1e6).toLong)
    }
    assert(out === ref)
    // Gini is a proportion: inside [0, 1)
    out.values.foreach { case (_, _, g) =>
      assert(g >= 0L && g < 1000000L)
    }
  }

  test("R88: the windowed skyline equals the naive dominance filter") {
    val pts = Tables.lineitem(spark, sf).select(
      col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long"),
      floor(col("l_quantity") * 100 + 0.5).cast("long"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ref = pts.groupBy(_._1).toSeq.flatMap { case (g, ps) =>
      ps.filter { p =>
        !ps.exists(q => q != p && q._2 <= p._2 && q._3 >= p._3 &&
          (q._2 < p._2 || q._3 > p._3))
      }.map(p => (g, p._2, p._3)).toSeq
    }.toSet
    val got = Audit.qSkyline.fn(spark, sf).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("price_c"),
        r.getAs[Long]("qty_c"))).toSet
    assert(got === ref)
    // frontier shape: maximizing qty while minimizing price means qty
    // strictly INCREASES along the frontier as price increases
    got.groupBy(_._1).values.foreach { ps =>
      val qtys = ps.toSeq.sortBy(_._2).map(_._3)
      assert(qtys === qtys.sorted && qtys.distinct === qtys,
        "frontier qty must strictly increase with price")
    }
  }
}
