package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** R154 — Kaplan-Meier laws + exact driver replay. */
class SurvivalSpec extends SparkSpec {

  private lazy val km = Survival.qSurvivalKm.fn(spark, sf).collect()

  test("subject conservation: Σ(d + c) over the grid equals the user count") {
    val total = km.map(r => r.getAs[Long]("d") + r.getAs[Long]("c")).sum
    assert(total == Tables.events(spark, sf).select("user_id").distinct().count())
  }

  test("risk set telescopes: n_risk(t) = n_risk(prev) - d(prev) - c(prev)") {
    km.sliding(2).foreach { w =>
      assert(w(1).getAs[Long]("n_risk") ==
        w(0).getAs[Long]("n_risk") - w(0).getAs[Long]("d") - w(0).getAs[Long]("c"))
    }
    assert(km.head.getAs[Long]("n_risk") ==
      km.map(r => r.getAs[Long]("d") + r.getAs[Long]("c")).sum)
  }

  test("log-survival is non-increasing and matches a driver-side KM replay") {
    val durations = Tables.events(spark, sf)
      .groupBy("user_id").agg(
        min("ts").as("first_ts"),
        min(when(col("event_type") === "purchase", col("ts"))).as("conv_ts"),
        max("ts").as("last_ts"))
      .withColumn("converted", col("conv_ts").isNotNull)
      .withColumn("t",
        when(col("converted"), datediff(col("conv_ts"), col("first_ts")))
          .otherwise(datediff(col("last_ts"), col("first_ts")))
          .cast("long"))
      .select("t", "converted").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val grid = durations.groupBy(_._1).map { case (t, xs) =>
      (t, xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }.toSeq.sortBy(_._1)
    var atRisk = durations.length.toLong
    var cum = 0L
    var undef = 0L
    grid.zip(km.sortBy(_.getAs[Long]("t"))).foreach { case ((t, d, c), row) =>
      assert(row.getAs[Long]("t") == t)
      assert(row.getAs[Long]("d") == d)
      assert(row.getAs[Long]("c") == c)
      assert(row.getAs[Long]("n_risk") == atRisk)
      assert(row.getAs[Long]("n_undef_prior") == undef)
      if (atRisk > d) {
        val term = math.floor(math.log((atRisk - d).toDouble / atRisk) * 1e9).toLong
        assert(row.getAs[Long]("ln_term_q9") == term)
        cum += term
      } else undef += 1
      assert(row.getAs[Long]("ln_surv_q9") == cum)
      atRisk -= d + c
    }
    // monotone: survival only falls
    val lnSurv = km.sortBy(_.getAs[Long]("t")).map(_.getAs[Long]("ln_surv_q9"))
    lnSurv.sliding(2).foreach { w => assert(w(1) <= w(0)) }
  }
}
