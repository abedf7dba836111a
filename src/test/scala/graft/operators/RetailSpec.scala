package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** R76/R77 — RFM segmentation and basket rules vs exact driver-side
  * replays on sf0.001. */
class RetailSpec extends SparkSpec {

  test("R76: RFM segments replay exactly and quintiles are equal-count") {
    val perCust = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(max(to_date(col("o_orderdate"))).as("last"),
        count(lit(1)).as("freq"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toLocalDate,
        r.getLong(2), r.getLong(3)))
    val mx = perCust.map(_._2).max
    val nc = perCust.length.toLong
    def quint(ranked: Seq[Long]): Map[Long, Int] =
      ranked.zipWithIndex.map { case (k, i) =>
        k -> ((i.toLong * 5) / nc + 1).toInt
      }.toMap
    val r = quint(perCust.sortBy(c =>
      (-java.time.temporal.ChronoUnit.DAYS.between(c._2, mx), c._1))
      .map(_._1))
    val f = quint(perCust.sortBy(c => (c._3, c._1)).map(_._1))
    val m = quint(perCust.sortBy(c => (c._4, c._1)).map(_._1))
    val ref = perCust.groupBy(c => (r(c._1), f(c._1), m(c._1)))
      .map { case (seg, cs) =>
        seg -> (cs.length.toLong, cs.map(_._4).sum / cs.length)
      }
    val got = Retail.qRfm.fn(spark, sf).collect()
      .map(row => (row.getAs[Int]("r"), row.getAs[Int]("f"),
        row.getAs[Int]("m")) ->
        (row.getAs[Long]("n_customers"), row.getAs[Long]("avg_monetary_q")))
      .toMap
    assert(got === ref)
    // per dimension, quintile populations are equal within one
    Seq(r, f, m).foreach { dim =>
      val sizes = dim.values.groupBy(identity).map(_._2.size)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("R77: association rules replay the support/confidence/lift definitions") {
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).map { case (o, ps) =>
      o -> ps.map(_._2).toSet
    }
    val no = byOrder.size.toLong
    val supp = items.groupBy(_._2).map { case (p, os) => p -> os.length.toLong }
    val pairCounts = byOrder.values.toSeq.flatMap { ps =>
      val sorted = ps.toSeq.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        yield (sorted(i), sorted(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
      .filter(_._2 >= Retail.MinSupport)
    val ref = pairCounts.toSeq.map { case ((i1, i2), sp) =>
      val s1 = supp(i1); val s2 = supp(i2)
      (i1, i2, sp, s1, s2, sp * 1000000L / s1, sp * no * 1000000L / (s1 * s2))
    }.sortBy(t => (-t._7, t._1, t._2)).take(Retail.TopRules)
    val got = Retail.qMarketBasket.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("i1"), r.getAs[Long]("i2"),
        r.getAs[Long]("sp"), r.getAs[Long]("s1"), r.getAs[Long]("s2"),
        r.getAs[Long]("conf_q"), r.getAs[Long]("lift_q"))).toSeq
    assert(got === ref)
    // rule sanity: support never exceeds either side's singleton support
    got.foreach { case (_, _, sp, s1, s2, conf, _) =>
      assert(sp <= math.min(s1, s2))
      assert(conf <= 1000000L)
    }
  }

  test("R85: growth rates replay and are defined exactly when the lag period exists") {
    val monthly = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).select(col("c_custkey"),
        col("c_mktsegment").as("segment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("segment"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .as("ym"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        .as("rev"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val out = Retail.qGrowthRates.fn(spark, sf).collect()
    assert(out.length === monthly.size)
    out.foreach { r =>
      val seg = r.getAs[String]("segment")
      val ym = r.getAs[Int]("year") * 12 + r.getAs[Int]("month") - 1
      assert(r.getAs[Long]("rev_cents") === monthly((seg, ym)))
      (monthly.get((seg, ym - 1)), r.isNullAt(r.fieldIndex("mom_q"))) match {
        case (Some(p), isNull) =>
          // both engines' integer division truncates toward zero,
          // exactly like JVM Long division
          assert(!isNull && r.getAs[Long]("mom_q") ===
            (r.getAs[Long]("rev_cents") - p) * 1000000L / p)
        case (None, isNull) => assert(isNull)
      }
      (monthly.get((seg, ym - 12)), r.isNullAt(r.fieldIndex("yoy_q"))) match {
        case (Some(_), isNull) => assert(!isNull)
        case (None, isNull) => assert(isNull)
      }
    }
  }

  test("R143: drill-across conserves both facts and keeps single-fact months") {
    import org.apache.spark.sql.functions._
    val rows = Retail.qDrillAcross.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // measure conservation: summing the joined report reproduces each
    // fact's own totals exactly — the no-fan-out guarantee that makes
    // summarize-then-join the correct drill-across shape
    def sumCol(c: String) = rows.map(r =>
      if (r.isNullAt(r.fieldIndex(c))) 0L else r.getAs[Long](c)).sum
    assert(sumCol("n_orders") === graft.Tables.orders(spark, sf).count())
    assert(sumCol("n_events") === graft.Tables.events(spark, sf).count())
    // the two facts cover different calendars: months with one side
    // NULL must survive (the FULL-join clause doing real work)
    assert(rows.exists(_.isNullAt(rows.head.fieldIndex("n_events"))) ||
      rows.exists(_.isNullAt(rows.head.fieldIndex("n_orders"))),
      "fixture must exercise a single-fact month")
    // months are unique — one report row per conformed grain value
    val months = rows.map(_.getAs[java.sql.Date]("month"))
    assert(months.distinct.length === months.length)
  }

  test("R137: monthly ranks are dense and rank gains are zero-sum") {
    val rows = Retail.qTrendingRank.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("ym"), r.getAs[String]("p_brand"),
        r.getAs[Long]("rnk"),
        if (r.isNullAt(r.fieldIndex("rank_gain"))) None
        else Some(r.getAs[Long]("rank_gain"))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (ym, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq,
        s"month $ym ranks must be dense (tie-broken total order)")
    }
    // zero-sum: when consecutive months carry the SAME brand set,
    // rank positions are a permutation — gains cancel exactly
    val byYm = rows.groupBy(_._1)
    val consecutive = byYm.keys.toSeq.sorted.sliding(2)
      .filter(p => p.length == 2 && p(1) == p(0) + 1)
      .filter { p =>
        byYm(p(0)).map(_._2).toSet == byYm(p(1)).map(_._2).toSet }
      .toSeq
    assert(consecutive.nonEmpty, "fixture needs stable-brand-set months")
    consecutive.foreach { p =>
      val gains = byYm(p(1)).flatMap(_._4)
      assert(gains.sum === 0L, s"months $p: rank gains must cancel")
    }
  }

  test("R135: the price/volume bridge identity is exact on every row") {
    val rows = Retail.qPriceVolumeBridge.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("residual") === 0L,
        "scaled decomposition must be an exact integer identity")
      assert(r.getAs[Long]("volume_effect_scaled") +
        r.getAs[Long]("price_effect_scaled") ===
        r.getAs[Long]("delta_scaled"))
      // a pure-volume month (same unit value) would put the whole delta
      // in the volume term; directionally, more units at fixed revenue
      // per unit can't produce a negative volume effect
      if (r.getAs[Long]("q") > r.getAs[Long]("q_prev"))
        assert(r.getAs[Long]("volume_effect_scaled") >= 0L)
    }
  }

  test("R128: shares tile their totals within flooring loss, ranks are dense") {
    val rows = Retail.qShareOfTotal.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val byRegion = rows.groupBy(_.getAs[String]("r_name"))
    byRegion.foreach { case (_, rs) =>
      val regionShare = rs.map(_.getAs[Long]("share_region_ppm")).sum
      // n floors, each loses < 1 ppm
      assert(regionShare <= 1000000L &&
        regionShare > 1000000L - rs.length,
        s"region shares must sum to 1e6 within flooring loss: $regionShare")
      val ranks = rs.map(_.getAs[Long]("rank_in_region")).sorted.toSeq
      assert(ranks === (1L to rs.length).toSeq,
        "regional ranks must be dense 1..n (tie-broken total order)")
      // rank 1 carries the region's max revenue
      val top = rs.minBy(_.getAs[Long]("rank_in_region"))
      assert(top.getAs[Long]("rev_c") ===
        rs.map(_.getAs[Long]("rev_c")).max)
    }
    val worldShare = rows.map(_.getAs[Long]("share_world_ppm")).sum
    assert(worldShare <= 1000000L && worldShare > 1000000L - rows.length)
  }
}
