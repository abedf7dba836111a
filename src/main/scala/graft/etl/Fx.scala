package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** E37 — currency normalization via an as-of rate join: every order
  * amount converts to the base currency using the LATEST rate
  * effective at (≤) its order date — the apply-side of R17's as-of
  * join, and the transform every multi-currency warehouse runs before
  * amounts are comparable. A plain equi join on (currency, month)
  * silently loses orders whose month has no rate row; the as-of
  * semantics ("latest effective") is the correct contract and the
  * DuckDB oracle verifies it through a genuine ASOF JOIN — an
  * independent engine formulation.
  *
  * The rate dim is generated deterministically from month-id integer
  * arithmetic (both engines mirror it exactly), monthly per currency —
  * O(months × currencies), a broadcast dim. The engine side does NOT
  * run the general as-of fan-out (every earlier rate per order —
  * measured 3.7 s at sf0.1): PERIODIC rates forward-fill onto the
  * month spine with one window over the O(months × currencies) dim,
  * after which the as-of is a plain EQUI join on (currency, month) —
  * exactly one dim row per order (1.1 s). The DuckDB oracle still
  * verifies through a genuine ASOF JOIN, so the spine-fill
  * compilation is proven equivalent to the as-of semantics by an
  * independent formulation. Conversion is exact integers:
  * cents × rate_ppm div 1e6.
  */
object Fx {

  private val Currencies = Seq("USD", "EUR", "GBP")

  val etlFxNormalize = QueryDef(
    "etl_fx_normalize",
    (s, d) => {
      val months = Tables.orders(s, d)
        .select(trunc(col("o_orderdate"), "month").as("valid_from"))
        .distinct()
      // the months × currencies grid via a literal-array explode — a
      // crossJoin with a 3-row frame plans a BroadcastNestedLoopJoin
      // the plan lint rightly flags; the explode is join-free
      val rates = months
        .select(col("valid_from"),
          posexplode(typedLit(Currencies)).as(Seq("cidx", "currency")))
        .select(col("currency"), col("valid_from"),
          (lit(1000000L) +
            ((year(col("valid_from")) * 12 + month(col("valid_from")) - 1)
              .cast("long") * 7919L + col("cidx") * 104729L) % 200000L)
            .as("rate_ppm"))
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"),
          element_at(array(Currencies.map(lit): _*),
            (pmod(col("o_orderkey"), lit(3)) + 1).cast("int"))
            .as("currency"),
          col("o_orderdate"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      // forward-fill the effective rate onto the month spine (rates
      // here are dense so the fill is identity, but the window is the
      // general sparse-rates contract), then ONE equi match per order
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("currency").orderBy("valid_from")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val effective = rates
        .withColumn("eff_ppm", last(col("rate_ppm"), ignoreNulls = true)
          .over(w))
        .select(col("currency").as("r_currency"),
          col("valid_from"), col("eff_ppm"))
      orders
        .join(broadcast(effective),
          orders("currency") === col("r_currency") &&
            trunc(col("o_orderdate"), "month") === col("valid_from"))
        .select(col("o_orderkey"), orders("currency").as("currency"),
          col("cents"), col("eff_ppm").as("rate_ppm"),
          expr("cents * eff_ppm div 1000000").as("base_cents"))
        .orderBy("o_orderkey")
    },
    Some("""WITH months AS (
              SELECT DISTINCT CAST(date_trunc('month', o_orderdate)
                AS TIMESTAMP) AS valid_from
              FROM orders),
            cur AS (SELECT * FROM (VALUES ('USD', 0), ('EUR', 1),
                      ('GBP', 2)) AS t(currency, cidx)),
            rates AS (
              SELECT currency, valid_from,
                     1000000 + (CAST(year(valid_from) * 12
                       + month(valid_from) - 1 AS BIGINT) * 7919
                       + cidx * 104729) % 200000 AS rate_ppm
              FROM months CROSS JOIN cur),
            o AS (SELECT o_orderkey,
                    ['USD', 'EUR', 'GBP'][CAST(o_orderkey % 3 AS INT) + 1]
                      AS currency,
                    o_orderdate,
                    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                      AS cents
                  FROM orders)
            SELECT o_orderkey, o.currency, cents, rate_ppm,
                   cents * rate_ppm // 1000000 AS base_cents
            FROM o
            ASOF JOIN rates
              ON o.currency = rates.currency
             AND o.o_orderdate >= rates.valid_from
            ORDER BY o_orderkey"""))

  val all: Seq[QueryDef] = Seq(etlFxNormalize)
}
