package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** R72-R74 — feature-engineering transforms vs exact driver-side
  * replays. */
class FeaturesSpec extends SparkSpec {

  test("R72: LOO encoding excludes the row's own label (anti-leakage direction)") {
    val all = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).select(col("c_custkey"),
        col("c_mktsegment").as("segment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("segment"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("y")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val stats = all.groupBy(_._1).map { case (seg, rs) =>
      seg -> (rs.length.toLong, rs.map(_._2).sum)
    }
    val out = Features.qTargetEncode.fn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, sy) = stats(r.getAs[String]("segment"))
      val y = r.getAs[Long]("y")
      val expected = if (n > 1) ((sy - y) * 1000000L) / (n - 1) else -1L
      if (n > 1) {
        assert(r.getAs[Long]("loo_q") === expected)
        // removing a positive label pulls the encoding DOWN vs the
        // plain mean; removing a negative pulls it UP (strictly, when
        // the category is mixed) — the anti-leakage direction itself
        val mean = (sy * 1000000L) / n
        if (sy > 0 && sy < n) {
          if (y == 1L) assert(r.getAs[Long]("loo_q") < mean)
          else assert(r.getAs[Long]("loo_q") >= mean)
        }
      } else assert(r.isNullAt(r.fieldIndex("loo_q")))
    }
  }

  test("R73: scaled features match a driver-side replay and are monotone in x") {
    val byG = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("g"),
        floor(col("l_quantity") * 100 + 0.5).cast("long").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2) }
    def interp(sorted: Array[Double], p: Double): Double = {
      val t = 1.0 + (sorted.length - 1) * p
      val lo = sorted(math.floor(t).toInt - 1)
      val hi = sorted(math.ceil(t).toInt - 1)
      lo + (hi - lo) * (t - math.floor(t))
    }
    val out = Features.qFeatureScale.fn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val g = r.getAs[String]("g")
      val xs = byG(g)
      val n = xs.length.toLong
      val sx = xs.map(BigInt(_)).sum
      val sxx = xs.map(x => BigInt(x) * x).sum
      val mean = sx.toDouble / n
      val std = math.sqrt((n.toDouble * sxx.toDouble
        - sx.toDouble * sx.toDouble) / (n.toDouble * n.toDouble))
      val sorted = xs.map(_.toDouble).sorted
      val med = interp(sorted, 0.5)
      val iqr = interp(sorted, 0.75) - interp(sorted, 0.25)
      val xc = r.getAs[Long]("xc")
      assert(r.getAs[Long]("z_q") ===
        math.floor((xc - mean) / std * 1e4).toLong)
      assert(r.getAs[Long]("robust_q") ===
        math.floor((xc - med) / iqr * 1e4).toLong)
    }
    // within a group both scalings preserve the order of x
    out.groupBy(_.getAs[String]("g")).values.foreach { rs =>
      val byX = rs.sortBy(_.getAs[Long]("xc"))
      assert(byX.map(_.getAs[Long]("z_q")).toSeq ===
        byX.map(_.getAs[Long]("z_q")).sorted.toSeq)
      assert(byX.map(_.getAs[Long]("robust_q")).toSeq ===
        byX.map(_.getAs[Long]("robust_q")).sorted.toSeq)
    }
  }

  test("R74: lagged autocorrelation equals the exact co-moment replay") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0),
        r.getAs[java.sql.Date](1).toLocalDate, r.getLong(2)))
    def ref(lag: Int): Map[String, (Long, Long)] =
      daily.groupBy(_._1).map { case (t, rs) =>
        val m = rs.map(r => r._2 -> r._3).toMap
        val pairs = m.toSeq.flatMap { case (day, x) =>
          m.get(day.minusDays(lag)).map(y => (x, y))
        }
        val n = pairs.length.toLong
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val r0 = (n * sxy - sx * sy).toDouble /
          math.sqrt((n * sxx - sx * sx).toDouble *
            (n * syy - sy * sy).toDouble)
        t -> (n, math.floor(r0 * 1e6).toLong)
      }
    val r1 = ref(1); val r7 = ref(7)
    val out = Features.qAutocorr.fn(spark, sf).collect()
    assert(out.map(_.getAs[String]("event_type")).toSet === r1.keySet)
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert((r.getAs[Long]("n_ac1_q"), r.getAs[Long]("ac1_q")) === r1(t))
      assert((r.getAs[Long]("n_ac7_q"), r.getAs[Long]("ac7_q")) === r7(t))
      assert(math.abs(r.getAs[Long]("ac1_q")) <= 1000000L)
      assert(math.abs(r.getAs[Long]("ac7_q")) <= 1000000L)
    }
  }

  test("R142: cross-correlation replays exactly from the daily series") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0),
        r.getAs[java.sql.Date](1).toLocalDate, r.getLong(2)))
    val x = daily.filter(_._1 == "view").map(d => d._2 -> d._3).toMap
    val y = daily.filter(_._1 == "purchase").map(d => d._2 -> d._3).toMap
    def refR(k: Int): (Long, Long) = {
      val pairs = x.toSeq.flatMap { case (d, xv) =>
        y.get(d.plusDays(k)).map(yv => (xv, yv)) }
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val r = (n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy))
      (n, math.floor(r * 1e6).toLong)
    }
    val got = Features.qCrossCorrelation.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("lead_days") ->
        (r.getAs[Long]("n"), r.getAs[Long]("r_q"))).toMap
    Seq(0, 1, 7).foreach { k =>
      assert(got(k.toLong) === refR(k), s"lead $k")
      assert(math.abs(got(k.toLong)._2) <= 1000000L)
    }
  }

  test("R134: MI replays exactly and detects a perfectly informative feature") {
    import org.apache.spark.sql.functions._
    val cells = graft.Tables.documents(spark, sf)
      .groupBy("source", "lang").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nx = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ny = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = cells.values.sum
    val ref = cells.map { case ((x, y), nxy) =>
      math.floor(nxy.toDouble / n *
        math.log(nxy.toDouble * n / (nx(x).toDouble * ny(y))) * 1e9).toLong
    }.sum
    val rows = Features.qMutualInfo.fn(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("mi_q")).distinct === Seq(ref))
    // MI of a variable with ITSELF is its entropy (maximal dependence):
    // recompute via the same operator shape driver-side on (lang, lang)
    val langs = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val selfMi = langs.map { case (_, c) =>
      math.floor(c.toDouble / n *
        math.log(c.toDouble * n / (c.toDouble * c)) * 1e9).toLong }.sum
    val entropy = langs.map { case (_, c) =>
      -c.toDouble / n * math.log(c.toDouble / n) }.sum
    assert(math.abs(selfMi / 1e9 - entropy) < 1e-6,
      "self-MI must equal the label entropy")
    // and the real feature's MI is bounded by that entropy
    assert(ref <= selfMi + rows.length,
      "I(X;Y) <= H(Y) within quantization slack")
  }

  test("D83: every feature replays from STRICTLY-prior history — no leakage") {
    import org.apache.spark.sql.functions._
    val hist = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("val_c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._3, e._2))).toMap
    val got = Features.qFeatureMatrix.fn(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val id = r.getAs[Long]("label_event_id")
      val seq = hist(u)
      val idx = seq.indexWhere(_._2 == id)
      val prior = seq.take(idx) // strictly before in the total order
      assert(r.getAs[Long]("n_prior") === prior.length)
      assert(r.getAs[Long]("n_prior_views") ===
        prior.count(_._4 == "view"))
      val lastVal = prior.reverse.collectFirst {
        case (_, _, _, _, Some(v)) => v }
      if (lastVal.isEmpty) assert(r.isNullAt(r.fieldIndex("last_val_c")))
      else assert(r.getAs[Long]("last_val_c") === lastVal.get)
      if (prior.isEmpty) assert(r.isNullAt(r.fieldIndex("tenure_us")))
      else assert(r.getAs[Long]("tenure_us") ===
        seq(idx)._3 - prior.map(_._3).min)
    }
    // first-ever-event purchases really occur in the fixture (the
    // null-feature path is exercised, not vacuous)
    assert(got.exists(_.getAs[Long]("n_prior") === 0L))
  }

  test("R152: WOE/IV replays bit-for-bit from raw category counts") {
    val li = Tables.lineitem(spark, sf)
      .groupBy(month(col("l_shipdate")).as("category"))
      .agg(
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("bad"),
        sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L)).as("good"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val k = li.length.toLong
    val gt = li.map(_._3).sum + k
    val bt = li.map(_._2).sum + k
    val expect = li.map { case (cat, bad, good) =>
      val g1 = good + 1; val b1 = bad + 1
      val gs = g1 * 1000000L / gt; val bs = b1 * 1000000L / bt
      val woe = math.floor(math.log(g1.toDouble * bt / (b1.toDouble * gt)) * 1e6).toLong
      val term = (gs - bs) * woe / 1000000L
      (cat, good, bad, gs, bs, woe, term)
    }
    val ivExpect = expect.map(_._7).sum
    val got = Features.qWoeIv.fn(spark, sf).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7))).sortBy(_._1)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert((g._1, g._2, g._3, g._4, g._5, g._6, g._7) == e, g._1)
      assert(g._8 == ivExpect)
    }
    // the WOE orientation law: a category whose smoothed bad share
    // exceeds its good share must carry a non-positive WOE and vice versa
    got.foreach { g =>
      if (g._4 > g._5) assert(g._6 >= 0, g._1)
      else if (g._4 < g._5) assert(g._6 < 0, g._1)
    }
  }
}
