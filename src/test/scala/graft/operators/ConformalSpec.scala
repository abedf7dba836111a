package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** R147 — conformal-interval laws the SQL oracle can't state: the
  * coverage guarantee actually lands near its target, the half-width
  * is the exact calibration order statistic, and the split is honest. */
class ConformalSpec extends SparkSpec {

  private lazy val rows = Conformal.conformalIntervals(spark, sf).collect()

  test("R147: intervals are symmetric, flags exact, one q-hat per type") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, f, q) = (r.getAs[Long]("n"), r.getAs[Long]("forecast"),
        r.getAs[Long]("qhat"))
      assert(r.getAs[Long]("lo") === f - q)
      assert(r.getAs[Long]("hi") === f + q)
      assert(r.getAs[Boolean]("covered") === (n >= f - q && n <= f + q))
      assert(q >= 0)
    }
    val perType = rows.groupBy(_.getAs[String]("t"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("qhat")).distinct.size }
    assert(perType.forall(_ === 1), "one calibrated half-width per type")
  }

  test("R147: empirical coverage sits near the 80% target") {
    val cov = rows.count(_.getAs[Boolean]("covered")).toDouble / rows.length
    assert(cov >= 0.7 && cov <= 1.0,
      s"overall held-out coverage $cov strays from the conformal guarantee")
  }

  test("R147: q-hat is exactly the conformal order statistic of the calibration residuals") {
    // independent replay: daily counts → residuals → 70% split →
    // ceil((n+1)·0.8) rank, in plain Scala
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type").as("t"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byT = daily.groupBy(_._1)
    val expected = byT.flatMap { case (t, rs) =>
      val n = rs.map(r => r._2 -> r._3).toMap
      val resid = rs.flatMap { case (_, day, y) =>
        n.get(day - 7).map(f => (day, (y - f).abs))
      }.sortBy(_._1)
      if (resid.isEmpty) None else {
        val days = resid.map(_._1)
        val split = days.min + (days.max - days.min) * 7 / 10
        val cal = resid.filter(_._1 < split)
          .sortBy { case (d, r) => (r, d) }.map(_._2)
        if (cal.isEmpty) None else {
          val rk = math.min(((cal.length + 1) * 8 + 9) / 10, cal.length)
          Some(t -> cal(rk - 1))
        }
      }
    }
    val got = rows.groupBy(_.getAs[String]("t"))
      .map { case (t, rs) => t -> rs.head.getAs[Long]("qhat") }
    assert(got === expected)
  }
}
