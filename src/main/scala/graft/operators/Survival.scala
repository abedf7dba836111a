package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R154 — Kaplan-Meier survival estimation over the event stream:
  * time-to-conversion (first event → first purchase, in days) with
  * RIGHT-CENSORING — users who never purchase contribute their
  * observation span and then leave the risk set, which is exactly what
  * a naive "average days to purchase over converters" silently throws
  * away (survivorship bias: fast converters dominate). The
  * churn/retention/activation read every product-analytics stack runs.
  *
  * Per user ONE aggregation: first event, first purchase, last seen →
  * (duration, converted). Everything after runs on the O(#days) grid:
  * d_t (conversions at t), c_t (censorings at t), at-risk
  * n_t = N − Σ_{t'<t}(d+c) via a running window. The KM factor
  * (n−d)/n enters as floor(ln((n−d)/n)·1e9) — ONE double division of
  * exact BIGINTs then ln (the D63/PSI quantize-then-sum convention) —
  * so the cumulative log-survival is an order-free integer sum and the
  * whole curve hash-matches cross-engine. Steps where n = d (everyone
  * remaining converts) have no finite log-factor; they and their
  * successors carry `n_undef_prior` > 0 — validity is visible in the
  * output, never silently interpolated.
  */
object Survival {

  val qSurvivalKm = QueryDef(
    "q_survival_km",
    (s, d) => {
      val ev = Tables.events(s, d)
      val perUser = ev.groupBy("user_id").agg(
        min(col("ts")).as("first_ts"),
        min(when(col("event_type") === "purchase", col("ts"))).as("conv_ts"),
        max(col("ts")).as("last_ts"))
        .withColumn("converted", col("conv_ts").isNotNull)
        .withColumn("t",
          when(col("converted"), datediff(col("conv_ts"), col("first_ts")))
            .otherwise(datediff(col("last_ts"), col("first_ts")))
            .cast("long"))
      val grid = perUser.groupBy("t").agg(
        sum(when(col("converted"), lit(1L)).otherwise(lit(0L))).as("d"),
        sum(when(col("converted"), lit(0L)).otherwise(lit(1L))).as("c"))
      val wCum = Window.partitionBy(lit(1)).orderBy("t")
      val wPrev = wCum.rowsBetween(Window.unboundedPreceding, -1)
      grid
        .withColumn("n_total", sum(col("d") + col("c"))
          .over(Window.partitionBy(lit(1))))
        .withColumn("left_before",
          coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
        .withColumn("n_risk", col("n_total") - col("left_before"))
        .withColumn("ln_term_q9",
          when(col("n_risk") > col("d"),
            floor(log((col("n_risk") - col("d")).cast("double") / col("n_risk"))
              * 1e9).cast("long")))
        .withColumn("n_undef_prior",
          coalesce(sum(when(col("n_risk") <= col("d"), lit(1L)).otherwise(lit(0L)))
            .over(wPrev), lit(0L)))
        .withColumn("ln_surv_q9", sum("ln_term_q9").over(wCum))
        .select(col("t"), col("d"), col("c"), col("n_risk"),
          col("ln_term_q9"), col("ln_surv_q9"), col("n_undef_prior"))
        .orderBy("t")
    },
    Some("""WITH pu AS (
              SELECT user_id,
                     min(ts) AS first_ts,
                     min(ts) FILTER (WHERE event_type = 'purchase') AS conv_ts,
                     max(ts) AS last_ts
              FROM events GROUP BY 1),
            du AS (SELECT user_id, conv_ts IS NOT NULL AS converted,
                     CAST(CASE WHEN conv_ts IS NOT NULL
                          THEN date_diff('day', first_ts, conv_ts)
                          ELSE date_diff('day', first_ts, last_ts) END AS BIGINT) AS t
                   FROM pu),
            grid AS (SELECT t,
                       CAST(count(*) FILTER (WHERE converted) AS BIGINT) AS d,
                       CAST(count(*) FILTER (WHERE NOT converted) AS BIGINT) AS c
                     FROM du GROUP BY 1),
            w AS (SELECT *,
                    CAST(SUM(d + c) OVER () AS BIGINT) AS n_total,
                    CAST(COALESCE(SUM(d + c) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS left_before
                  FROM grid),
            k AS (SELECT *, n_total - left_before AS n_risk FROM w),
            m AS (SELECT *,
                    CASE WHEN n_risk > d THEN
                      CAST(floor(ln(CAST(n_risk - d AS DOUBLE) / n_risk) * 1e9)
                        AS BIGINT) END AS ln_term_q9,
                    CAST(COALESCE(SUM(CASE WHEN n_risk <= d THEN 1 ELSE 0 END)
                      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT) AS n_undef_prior
                  FROM k)
            SELECT t, d, c, CAST(n_risk AS BIGINT) AS n_risk, ln_term_q9,
                   CAST(SUM(ln_term_q9) OVER (ORDER BY t) AS BIGINT) AS ln_surv_q9,
                   n_undef_prior
            FROM m ORDER BY t"""))

  val all: Seq[QueryDef] = Seq(qSurvivalKm)
}
