package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E46 — row-level data-contract routing: every ingested row is
  * evaluated against a rule set and FAILING rows route to quarantine
  * carrying the full list of rules they violated — the row-level
  * complement of E11 (which emits per-RULE aggregate metrics: "how
  * healthy is the table") and IO11 (which quarantines rows the PARSER
  * rejects; this quarantines rows the parser accepts but the contract
  * does not). Reasons are data (the E16/async-enrich error-as-data
  * convention), so an upstream fix can re-drive quarantined rows.
  *
  * Rules on the order feed: non-null priority, non-negative total,
  * order date inside the business calendar, and referential existence
  * of the customer. The dirty feed derives DETERMINISTICALLY from
  * orders (the E30/E45 discipline — the truth is known, so the oracle
  * verifies the routing and every reason list, including rows that
  * violate several rules at once).
  *
  * Scale: the three value rules are pure map-side predicates riding
  * the scan; the referential rule is one key join against the customer
  * dim (at 100 TB: the R31 bloom prefilter cuts the shuffled fact
  * volume; the join itself is unavoidable — existence is a property of
  * the dim). The reasons column is `concat_ws` over conditional
  * literals — codegen'd, no UDF, fixed rule order.
  */
object Contract {

  /** Deterministic corruption: every 10th order → negative total,
    * every 7th → NULL priority, every 13th → dangling customer key,
    * every 11th → out-of-calendar date. Multiples of lcm pairs violate
    * several rules at once. */
  private def dirty(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey").as("okey"),
      when(col("o_orderkey") % 13 === 0, col("o_custkey") + 1000000000L)
        .otherwise(col("o_custkey")).as("ckey"),
      when(col("o_orderkey") % 10 === 0, -col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("total"),
      when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderpriority")).as("priority"),
      when(col("o_orderkey") % 11 === 0, to_date(lit("1800-01-01")))
        .otherwise(col("o_orderdate").cast("date")).as("odate"))

  private val oDirty =
    """SELECT o_orderkey AS okey,
              CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1000000000
                   ELSE o_custkey END AS ckey,
              CASE WHEN o_orderkey % 10 = 0 THEN -o_totalprice
                   ELSE o_totalprice END AS total,
              CASE WHEN o_orderkey % 7 = 0 THEN NULL
                   ELSE o_orderpriority END AS priority,
              CASE WHEN o_orderkey % 11 = 0 THEN DATE '1800-01-01'
                   ELSE CAST(o_orderdate AS DATE) END AS odate
       FROM orders"""

  val etlContractRoute = QueryDef(
    "etl_contract_route",
    (s, d) => {
      val feed = dirty(s, d)
      val cust = Tables.customer(s, d).select(col("c_custkey").as("ckey"))
        .withColumn("c_exists", lit(true))
      feed.join(cust, Seq("ckey"), "left")
        .withColumn("reasons", concat_ws(",",
          when(col("priority").isNull, lit("priority_null")),
          when(col("total") < 0, lit("total_negative")),
          when(col("odate") < to_date(lit("1990-01-01")), lit("date_out_of_range")),
          when(col("c_exists").isNull, lit("customer_missing"))))
        .filter(col("reasons") =!= "")
        .select(col("okey"), col("ckey"), col("reasons"))
        .orderBy("okey")
    },
    Some(s"""WITH feed AS ($oDirty),
             r AS (SELECT feed.okey, feed.ckey,
                     concat_ws(',',
                       CASE WHEN feed.priority IS NULL THEN 'priority_null' END,
                       CASE WHEN feed.total < 0 THEN 'total_negative' END,
                       CASE WHEN feed.odate < DATE '1990-01-01'
                            THEN 'date_out_of_range' END,
                       CASE WHEN c.c_custkey IS NULL THEN 'customer_missing' END)
                       AS reasons
                   FROM feed LEFT JOIN customer c ON feed.ckey = c.c_custkey)
             SELECT okey, ckey, reasons FROM r
             WHERE reasons <> '' ORDER BY okey"""))

  val all: Seq[QueryDef] = Seq(etlContractRoute)
}
