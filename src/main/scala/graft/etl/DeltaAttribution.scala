package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E43 — snapshot-delta METRIC attribution: when a report moves
  * between two versions of a table, say exactly WHY — how much of the
  * per-month revenue delta came from inserted rows, deleted rows, and
  * updated rows. R135's price/volume bridge explains month-over-month
  * movement INSIDE one snapshot; this explains version-over-version
  * movement of the SAME months — the "yesterday's report said X,
  * today it says Y" debugging read every warehouse owner runs after a
  * backfill.
  *
  * Construction: v2 derives from the base orders by a deterministic
  * synthetic change feed (keys ≡ 0 mod 101 deleted, ≡ 0 mod 97
  * repriced ×1.1, clones of keys ≡ 0 mod 89 inserted at key+10M).
  * Classes come from ONE full outer join on the key; contributions
  * are exact integer cents (the ×1.1 reprice is `cents·11 div 10`),
  * so the identity delta = ins + del + upd holds EXACTLY and ships as
  * an always-zero `residual` column — the oracle and spec both pin
  * it. One join + one keyed aggregation; classes are map-side CASE. */
object DeltaAttribution {

  /** Base rows as (key, month, cents). */
  private def base(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey").as("k"),
      date_format(col("o_orderdate"), "yyyy-MM").as("month"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))

  /** The deterministic v2: deletes, reprices, inserts. */
  private def v2(s: SparkSession, dir: String): DataFrame = {
    val b = base(s, dir)
    val kept = b.filter(col("k") % 101 =!= 0)
      .withColumn("cents",
        when(col("k") % 97 === 0, expr("cents * 11 div 10"))
          .otherwise(col("cents")))
    val inserted = b.filter(col("k") % 89 === 0)
      .select((col("k") + 10000000L).as("k"), col("month"), col("cents"))
    kept.unionByName(inserted)
  }

  def attribution(s: SparkSession, dir: String): DataFrame = {
    val a = base(s, dir)
      .select(col("k"), col("month").as("m_a"), col("cents").as("c_a"))
    val b = v2(s, dir)
      .select(col("k"), col("month").as("m_b"), col("cents").as("c_b"))
    val classes = a.join(b, Seq("k"), "full_outer")
      .select(coalesce(col("m_a"), col("m_b")).as("month"),
        when(col("c_a").isNull, col("c_b")).otherwise(lit(0L)).as("ins"),
        when(col("c_b").isNull, -col("c_a")).otherwise(lit(0L)).as("del"),
        when(col("c_a").isNotNull && col("c_b").isNotNull,
          col("c_b") - col("c_a")).otherwise(lit(0L)).as("upd"),
        coalesce(col("c_a"), lit(0L)).as("base_cents"),
        coalesce(col("c_b"), lit(0L)).as("v2_cents"))
    classes.groupBy("month")
      .agg(sum("base_cents").as("m_base"), sum("v2_cents").as("m_v2"),
        sum("ins").as("c_ins"), sum("del").as("c_del"),
        sum("upd").as("c_upd"))
      .withColumn("delta", col("m_v2") - col("m_base"))
      .withColumn("residual",
        col("delta") - col("c_ins") - col("c_del") - col("c_upd"))
      .select("month", "m_base", "m_v2", "delta", "c_ins", "c_del",
        "c_upd", "residual")
      .orderBy("month")
  }

  val qDeltaAttribution = QueryDef(
    "etl_delta_attribution",
    (s, d) => attribution(s, d),
    Some("""WITH base AS (
              SELECT o_orderkey AS k, strftime(o_orderdate, '%Y-%m') AS month,
                     CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders),
            v2 AS (
              SELECT k, month,
                     CASE WHEN k % 97 = 0 THEN cents * 11 // 10
                          ELSE cents END AS cents
              FROM base WHERE k % 101 <> 0
              UNION ALL
              SELECT k + 10000000 AS k, month, cents FROM base
              WHERE k % 89 = 0),
            cls AS (
              SELECT COALESCE(a.month, b.month) AS month,
                     CASE WHEN a.cents IS NULL THEN b.cents ELSE 0 END AS ins,
                     CASE WHEN b.cents IS NULL THEN -a.cents ELSE 0 END AS del,
                     CASE WHEN a.cents IS NOT NULL AND b.cents IS NOT NULL
                          THEN b.cents - a.cents ELSE 0 END AS upd,
                     COALESCE(a.cents, 0) AS base_cents,
                     COALESCE(b.cents, 0) AS v2_cents
              FROM base a FULL OUTER JOIN v2 b ON a.k = b.k)
            SELECT month,
                   CAST(SUM(base_cents) AS BIGINT) AS m_base,
                   CAST(SUM(v2_cents) AS BIGINT) AS m_v2,
                   CAST(SUM(v2_cents) - SUM(base_cents) AS BIGINT) AS delta,
                   CAST(SUM(ins) AS BIGINT) AS c_ins,
                   CAST(SUM(del) AS BIGINT) AS c_del,
                   CAST(SUM(upd) AS BIGINT) AS c_upd,
                   CAST(SUM(v2_cents) - SUM(base_cents)
                        - SUM(ins) - SUM(del) - SUM(upd) AS BIGINT)
                     AS residual
            FROM cls GROUP BY month ORDER BY month"""))

  val all: Seq[QueryDef] = Seq(qDeltaAttribution)
}
