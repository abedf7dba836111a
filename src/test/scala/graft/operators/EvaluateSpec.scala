package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** R66-R69 — evaluation/drift metrics verified against naive
  * driver-side references on sf0.001 (the references are the O(n²)
  * or single-pass forms the scalable entries must reproduce). */
class EvaluateSpec extends SparkSpec {

  test("R66: rank-sum AUC equals the naive all-pairs AUC per source") {
    val rows = Tables.documents(spark, sf).select(col("source"),
      graft.functions.Text.qualityScore(col("text")).as("score"),
      (col("lang") === "en").as("pos")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    val ref = rows.groupBy(_._1).flatMap { case (src, rs) =>
      val posS = rs.filter(_._3).map(_._2)
      val negS = rs.filterNot(_._3).map(_._2)
      if (posS.isEmpty || negS.isEmpty) None
      else {
        val s = (for (p <- posS; n <- negS)
          yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
        Some(src -> s / (posS.length.toLong * negS.length))
      }
    }
    val got = Evaluate.qAuc.fn(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("auc_q")).toMap
    assert(got.keySet === ref.keySet)
    ref.foreach { case (src, auc) =>
      assert(got(src) === math.floor(auc * 1e6).toLong,
        s"$src: rank-sum AUC diverges from the pairwise definition")
    }
  }

  test("R67: calibration bins conserve counts and ECE matches its definition") {
    val out = Evaluate.qCalibration.fn(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[Long]("n")).sum === total)
    val ece = out.map(r => r.getAs[Long]("n") * r.getAs[Long]("gap_q")).sum /
      out.map(_.getAs[Long]("n")).sum
    assert(out.forall(_.getAs[Long]("ece_q") === ece))
    out.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val m = r.getAs[Long]("mean_score_q")
      assert(m >= bin * 100000L && m <= (bin + 1) * 100000L,
        s"bin $bin: mean predicted score outside the bin's range")
      assert(r.getAs[Long]("gap_q") ===
        math.abs(m - r.getAs[Long]("rate_q")))
    }
  }

  test("R68: PSI emits the full 10-bin frame, conserves counts, and is non-negative") {
    val out = Evaluate.qPsi.fn(spark, sf).collect()
    assert(out.map(_.getAs[Int]("bin")).sorted.toSeq === (0 to 9))
    val totalEvents = Tables.events(spark, sf).count()
    assert(out.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum
      === totalEvents)
    // (pa-pb)·ln(pa/pb) ≥ 0 per bin, so every quantized contribution
    // and the total are ≥ 0
    assert(out.forall(_.getAs[Long]("contrib_q") >= 0L))
    val psi = out.head.getAs[Long]("psi_q")
    assert(out.forall(_.getAs[Long]("psi_q") === psi))
    assert(psi === out.map(_.getAs[Long]("contrib_q")).sum)
  }

  test("R80: two-proportion z replays exactly and the outcome rule is share-relative") {
    val users = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("np"), count(lit(1)).as("nt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gp = users.map(_._2).sum; val gt = users.map(_._3).sum
    val (as, bs) = users.partition(_._1 % 2 == 0)
    def x(us: Array[(Long, Long, Long)]) =
      us.count(u => u._2 * gt > gp * u._3).toLong
    val (na, xa, nb, xb) = (as.length.toLong, x(as), bs.length.toLong, x(bs))
    val pa = xa.toDouble / na; val pb = xb.toDouble / nb
    val pp = (xa + xb).toDouble / (na + nb)
    val den = math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    val r = Evaluate.qAbTest.fn(spark, sf).collect().head
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("x_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("x_b")) === ((na, xa, nb, xb)))
    assert(r.getAs[Long]("z_q") ===
      math.floor((pa - pb) / den * 1e4).toLong)
    assert(r.getAs[Boolean]("sig95") ===
      (math.abs((pa - pb) / den) > 1.959963984540054))
    // the share-relative outcome must actually discriminate: neither
    // cohort saturates at 0 or n (the failure mode that motivated it)
    assert(xa > 0 && xa < na && xb > 0 && xb < nb)
  }

  test("R69: gridded KS equals the naive per-type CDF sweep") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value")).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val grid = rows.map(_._2).distinct.sorted
    val types = rows.map(_._1).distinct
    val ref = types.map { t =>
      val a = rows.filter(_._1 == t).map(_._2)
      val b = rows.filterNot(_._1 == t).map(_._2)
      val gaps = grid.map { v =>
        v -> math.abs(a.count(_ <= v).toDouble / a.length -
          b.count(_ <= v).toDouble / b.length)
      }
      val ks = gaps.map(_._2).max
      t -> (math.floor(ks * 1e6).toLong, gaps.filter(_._2 == ks).map(_._1).min)
    }.toMap
    val got = Evaluate.qKsDrift.fn(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("ks_q"), r.getAs[Long]("v_at"))).toMap
    assert(got === ref)
  }

  test("R126: chi-square statistic equals a driver-side contingency recompute") {
    import org.apache.spark.sql.functions._
    val obs = graft.Tables.events(spark, sf)
      .select(col("event_type"), (dayofweek(col("ts")) - 1).as("dow"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val cells = obs.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val rowT = cells.groupBy(_._1._1).map { case (t, m) => t -> m.values.sum }
    val colT = cells.groupBy(_._1._2).map { case (c, m) => c -> m.values.sum }
    val n = cells.values.sum
    val chi2Ref = cells.map { case ((t, c), o) =>
      val e = (rowT(t) * colT(c)).toDouble / n
      math.floor((o - e) * (o - e) / e * 1e6).toLong
    }.sum
    val dfRef = (rowT.size - 1).toLong * (colT.size - 1)
    val rows = Evaluate.qChiSquare.fn(spark, sf).collect()
    assert(rows.length === cells.size)
    assert(rows.map(_.getAs[Long]("chi2_q")).distinct === Seq(chi2Ref))
    assert(rows.map(_.getAs[Long]("df")).distinct === Seq(dfRef))
    // per-cell terms also match
    val gotCells = rows.map(r => (r.getAs[String]("t"),
      r.getAs[Int]("dow")) -> r.getAs[Long]("o")).toMap
    assert(gotCells === cells)
  }
}
