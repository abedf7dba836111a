package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E34 — aggregate navigator (materialized-summary routing): a small
  * lattice of stored summary tables at different time grains, and a
  * router that answers each aggregate query from the COARSEST stored
  * summary that can serve it — the materialized-view-rewrite
  * capability every OLAP warehouse builds (Oracle's query rewrite,
  * BigQuery's materialized views), here as an explicit, testable
  * operator on plain parquet.
  *
  * Lattice discipline:
  *   - the DAY summary aggregates the fact once (E18's partials
  *     pattern — counts and exact cents sums, which MERGE; averages
  *     don't);
  *   - the MONTH summary derives FROM the day summary (compositional
  *     rollup — building it from the fact again would re-scan for
  *     nothing);
  *   - a WEEK query routes to the day summary (weeks don't align to
  *     months — the classic grain trap: month data cannot serve it);
  *   - a YEAR query routes to the month summary (coarsest server);
  *   - an unanswerable grain (hour — finer than any stored summary)
  *     fails LOUDLY instead of silently re-scanning the fact.
  *
  * At 100 TB the fact is petabytes and the summaries are megabytes:
  * the router turns dashboard queries from fact scans into
  * O(summary-rows) reads, and the routing decision itself is emitted
  * as data (`served_by`) so the choice is auditable — and
  * oracle-verified against the direct fact computation.
  */
object AggNavigator {

  /** Which requested grains each stored summary can serve: a stored
    * grain serves a requested grain iff the requested periods are
    * unions of stored periods. Weeks are unions of days but NOT of
    * months — the reason both summaries exist. */
  val Serves: Map[String, Set[String]] = Map(
    "day" -> Set("day", "week", "month", "quarter", "year"),
    "month" -> Set("month", "quarter", "year"))

  /** Route to the coarsest (cheapest) stored summary that can serve
    * the grain; loud failure when none can. */
  def route(grain: String): String =
    if (Serves("month")(grain)) "month"
    else if (Serves("day")(grain)) "day"
    else sys.error(
      s"no stored summary can serve grain '$grain' " +
        s"(stored: ${Serves.keys.mkString(", ")}) — build a finer summary " +
        "or query the fact explicitly")

  private val built =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def pathFor(dir: String, grain: String): String =
    "/tmp/graft_warehouse/aggnav_" + grain + "_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      ProcessHandle.current().pid()

  /** Materialize the summary lattice once per (process, dataset):
    * day from the fact, month FROM day. */
  private[etl] def summaryFor(s: SparkSession, dir: String,
      grain: String): String = {
    val path = pathFor(dir, grain)
    if (built.add(path)) {
      val df = grain match {
        case "day" =>
          Tables.orders(s, dir)
            .groupBy(to_date(col("o_orderdate")).as("period"),
              col("o_orderpriority"))
            .agg(count(lit(1)).as("n"),
              sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
                .as("sum_c"))
        case "month" =>
          s.read.parquet(summaryFor(s, dir, "day"))
            .groupBy(trunc(col("period"), "month").as("period"),
              col("o_orderpriority"))
            .agg(sum("n").as("n"), sum("sum_c").as("sum_c"))
        case other => sys.error(s"unknown summary grain '$other'")
      }
      df.write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Revenue by (grain period, priority), answered from the routed
    * summary — never the fact. Exposed for the spec's plan asserts. */
  def revenueBy(s: SparkSession, dir: String, grain: String): DataFrame = {
    val stored = route(grain)
    val summary = s.read.parquet(summaryFor(s, dir, stored))
    val period = grain match {
      case "day" | "month" if grain == stored => col("period")
      case "week"    => date_trunc("week", col("period")).cast("date")
      case "month"   => trunc(col("period"), "month")
      case "quarter" => trunc(col("period"), "quarter")
      case "year"    => trunc(col("period"), "year")
      case other     => sys.error(s"unhandled grain '$other'")
    }
    summary.groupBy(period.as("period"), col("o_orderpriority"))
      .agg(sum("n").as("n"), sum("sum_c").as("sum_c"))
      .withColumn("grain", lit(grain))
      .withColumn("served_by", lit(stored))
  }

  val etlAggNavigate = QueryDef(
    "etl_agg_navigate",
    (s, d) =>
      revenueBy(s, d, "week").unionByName(revenueBy(s, d, "year"))
        .select(col("grain"), col("period"), col("o_orderpriority"),
          col("n"), col("sum_c"), col("served_by"))
        .orderBy("grain", "period", "o_orderpriority"),
    Some("""SELECT 'week' AS grain,
                   CAST(date_trunc('week', o_orderdate) AS DATE) AS period,
                   o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     AS BIGINT) AS sum_c,
                   'day' AS served_by
            FROM orders GROUP BY 2, 3
            UNION ALL
            SELECT 'year' AS grain,
                   CAST(date_trunc('year', o_orderdate) AS DATE) AS period,
                   o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     AS BIGINT) AS sum_c,
                   'month' AS served_by
            FROM orders GROUP BY 2, 3
            ORDER BY grain, period, o_orderpriority"""))

  val all: Seq[QueryDef] = Seq(etlAggNavigate)
}
