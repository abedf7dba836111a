package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R147 — split-conformal prediction intervals around the R112
  * seasonal-naive forecaster: distribution-free uncertainty bands with
  * a finite-sample coverage guarantee (Vovk; Lei et al.) — the honest
  * answer to "how wrong can this forecast be" that a point backtest
  * (R112's sMAPE) cannot give. Per event type, the early 70% of the
  * daily span calibrates: the interval half-width q̂ is the
  * ⌈(n_cal+1)·(1−α)⌉-th smallest absolute residual (α = 0.2), and every
  * held-out day gets [forecast − q̂, forecast + q̂] plus its coverage
  * witness flag.
  *
  * Everything is exact integer arithmetic end to end — daily counts
  * and seasonal-naive forecasts are integers, residuals are integer
  * differences, the conformal RANK is ceil via `((n+1)·8 + 9) div 10`,
  * and q̂ is an order statistic, not a mean — so the DuckDB oracle
  * hash-matches bit for bit (the repo's R112/R85 integer-forecast
  * discipline). Scale shape: one keyed aggregation to the
  * O(types × calendar) daily frame; every window partitions by type
  * (never global), the calibration rank is one more window on that
  * bounded frame, and the q̂ join-back is O(types) rows. */
object Conformal {

  /** α = 0.2 expressed as the rank formula's integer pair (×8 // 10 =
    * ×(1−α) with ceil). */
  def conformalIntervals(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type").as("t"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val fc = daily.select(col("t").as("ft"), (col("day") + 7).as("fday"),
      col("n").as("forecast"))
    val r = daily
      .join(fc, col("t") === col("ft") && col("day") === col("fday"))
      .select(col("t"), col("day"), col("n"), col("forecast"),
        abs(col("n") - col("forecast")).as("resid"))
    val byT = org.apache.spark.sql.expressions.Window.partitionBy("t")
    val s2 = r
      .withColumn("split_day",
        min("day").over(byT) +
          expr("((max(day) OVER (PARTITION BY t) - min(day) OVER (PARTITION BY t)) * 7) div 10"))
    val cal = s2.filter(col("day") < col("split_day"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("t")
          .orderBy(col("resid"), col("day"))))
      .withColumn("n_cal", count(lit(1)).over(byT))
    val qhat = cal
      .filter(col("rk") === least(expr("((n_cal + 1) * 8 + 9) div 10"),
        col("n_cal")))
      .select(col("t").as("qt"), col("resid").as("qhat"))
    s2.filter(col("day") >= col("split_day"))
      .join(qhat, col("t") === col("qt"))
      .select(col("t"), col("day"), col("n"), col("forecast"), col("qhat"),
        (col("forecast") - col("qhat")).as("lo"),
        (col("forecast") + col("qhat")).as("hi"),
        (col("n") >= col("forecast") - col("qhat") &&
          col("n") <= col("forecast") + col("qhat")).as("covered"))
      .orderBy("t", "day")
  }

  val qConformalInterval = QueryDef(
    "q_conformal_interval",
    (s, d) => conformalIntervals(s, d),
    Some("""WITH daily AS (
              SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            r AS (SELECT a.t, a.day, a.n, f.n AS forecast,
                         abs(a.n - f.n) AS resid
                  FROM daily a JOIN daily f
                    ON a.t = f.t AND a.day = f.day + 7),
            s2 AS (SELECT *,
                     min(day) OVER (PARTITION BY t)
                       + ((max(day) OVER (PARTITION BY t)
                           - min(day) OVER (PARTITION BY t)) * 7) // 10
                       AS split_day
                   FROM r),
            cal AS (SELECT t, resid, day,
                      row_number() OVER
                        (PARTITION BY t ORDER BY resid, day) AS rk,
                      count(*) OVER (PARTITION BY t) AS n_cal
                    FROM s2 WHERE day < split_day),
            q AS (SELECT t AS qt, resid AS qhat FROM cal
                  WHERE rk = LEAST(((n_cal + 1) * 8 + 9) // 10, n_cal))
            SELECT t, day, n, forecast, qhat,
                   forecast - qhat AS lo, forecast + qhat AS hi,
                   (n >= forecast - qhat AND n <= forecast + qhat)
                     AS covered
            FROM s2 JOIN q ON qt = s2.t
            WHERE day >= split_day
            ORDER BY t, day"""))

  val all: Seq[QueryDef] = Seq(qConformalInterval)
}
