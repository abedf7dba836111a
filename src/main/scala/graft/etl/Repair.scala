package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E19 — partition-level repair planning + targeted rewrite: the
  * maintenance workflow that turns E12's row-level reconciliation into
  * an executable fix. After a migration/backfill diverges, the repair
  * plan attributes every added/removed/changed key to the table
  * partition(s) it lives in, and the repair rewrites EXACTLY those
  * partitions via dynamic partition overwrite (IO13) — never the whole
  * table.
  *
  * The reference re-runs its whole import when anything is off
  * (`DataflowProcessor.cs:55-115` — ForceRun reprocesses the file);
  * at 100 TB a full rewrite is days of I/O, while divergence after an
  * incident is typically confined to a few partitions. Scale shape:
  * ONE full-outer key shuffle (the E12 diff), a partition-keyed
  * count aggregation over only the differing rows (output ∝
  * #divergent partitions), and a repair write whose input is pruned
  * to the flagged partitions by a partition-column filter the scan
  * prunes on. A row whose partition ASSIGNMENT changed repairs both
  * sides' partitions (both are stale).
  */
object Repair {

  /** Row-level diff with partition attribution. `a` = current table,
    * `b` = expected/recomputed; both must carry `key` and the
    * partition column `part`. Emits one row per differing key per
    * affected partition (a changed row whose partition moved emits
    * two rows — both partitions need the rewrite). */
  def partitionDiff(a: DataFrame, b: DataFrame, key: String,
      part: String, valueCols: Seq[String]): DataFrame = {
    val av = a.select((key +: part +: valueCols).map(col): _*)
      .withColumnsRenamed(
        (part +: valueCols).map(c => c -> s"${c}_a").toMap)
    val bv = b.select((key +: part +: valueCols).map(col): _*)
      .withColumnsRenamed(
        (part +: valueCols).map(c => c -> s"${c}_b").toMap)
    val anyNullA = valueCols.map(c => col(s"${c}_a").isNull)
      .reduce(_ && _) && col(s"${part}_a").isNull
    val anyNullB = valueCols.map(c => col(s"${c}_b").isNull)
      .reduce(_ && _) && col(s"${part}_b").isNull
    val valueChanged = (valueCols :+ part)
      .map(c => !(col(s"${c}_a") <=> col(s"${c}_b"))).reduce(_ || _)
    av.join(bv, Seq(key), "full_outer")
      .withColumn("change",
        when(anyNullA, lit("added"))
          .when(anyNullB, lit("removed"))
          .when(valueChanged, lit("changed")))
      .filter(col("change").isNotNull)
      .select(col(key), col("change"),
        explode(array_distinct(filter(
          array(col(s"${part}_a"), col(s"${part}_b")),
          p => p.isNotNull))).as(part))
  }

  /** The repair plan: divergent partitions with their damage counts —
    * what an operator reviews before the rewrite, and what [[repair]]
    * prunes the rewrite to. */
  def repairPlan(a: DataFrame, b: DataFrame, key: String, part: String,
      valueCols: Seq[String]): DataFrame =
    partitionDiff(a, b, key, part, valueCols)
      .groupBy(part)
      .agg(
        sum(when(col("change") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("change") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("change") === "changed", 1L).otherwise(0L)).as("n_changed"),
        count(lit(1)).as("n_diff"))

  /** Execute the plan: rewrite ONLY the flagged partitions of the
    * parquet table at `path` with `expected`'s rows, via dynamic
    * partition overwrite. `planParts` is the (small — one row per
    * divergent partition) plan output; its values are collected to a
    * pruning filter, the documented O(#divergent-partitions) driver
    * materialization class. */
  def repair(expected: DataFrame, planParts: DataFrame, part: String,
      path: String): Unit = {
    val parts = planParts.select(part).distinct().collect()
      .map(_.get(0)).toSeq
    if (parts.nonEmpty)
      expected.filter(col(part).isin(parts: _*))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(part)
        .parquet(path)
  }

  /** The coverage entry replays E12's deterministic synthetic edit of
    * orders, partitioned by order month: k%89 rows dropped, k%97 rows
    * price-bumped, k%101 re-keyed copies added (same month as their
    * source). The plan must attribute every divergence to its month. */
  val etlRepairPlan = QueryDef(
    "etl_repair_plan",
    (s, d) => {
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"),
          col("o_orderstatus").as("status"),
          date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      val updated = base.filter(col("k") % 89 =!= 0)
        .withColumn("price",
          when(col("k") % 97 === 0, col("price") + 1).otherwise(col("price")))
        .unionByName(base.filter(col("k") % 101 === 0)
          .select((col("k") + 10000000L).as("k"), col("price"),
            col("status"), col("month")))
      repairPlan(base, updated, "k", "month", Seq("price", "status"))
        .orderBy("month")
    },
    Some("""WITH base AS (
              SELECT o_orderkey AS k, o_totalprice AS price,
                     o_orderstatus AS status,
                     strftime(o_orderdate, '%Y-%m') AS month
              FROM orders),
            updated AS (
              SELECT k,
                     CASE WHEN k % 97 = 0 THEN price + 1 ELSE price END AS price,
                     status, month
              FROM base WHERE k % 89 <> 0
              UNION ALL
              SELECT k + 10000000, price, status, month
              FROM base WHERE k % 101 = 0),
            d AS (
              SELECT COALESCE(a.k, b.k) AS k,
                     CASE WHEN a.k IS NULL THEN 'added'
                          WHEN b.k IS NULL THEN 'removed'
                          WHEN (a.price IS DISTINCT FROM b.price)
                            OR (a.status IS DISTINCT FROM b.status)
                            OR (a.month IS DISTINCT FROM b.month) THEN 'changed'
                     END AS change,
                     a.month AS month_a, b.month AS month_b
              FROM base a FULL OUTER JOIN updated b ON a.k = b.k),
            e AS (
              SELECT k, change, month FROM (
                SELECT k, change, month_a AS month FROM d WHERE change IS NOT NULL
                UNION
                SELECT k, change, month_b AS month FROM d WHERE change IS NOT NULL)
              WHERE month IS NOT NULL)
            SELECT month,
                   CAST(SUM(CASE WHEN change = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
                   CAST(SUM(CASE WHEN change = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                   CAST(SUM(CASE WHEN change = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
                   CAST(COUNT(*) AS BIGINT) AS n_diff
            FROM e GROUP BY month
            ORDER BY month"""))

  /** E20 — count-level backfill plan: the CHEAP reconciliation that
    * runs on a schedule, where E19's row-level diff is the targeted
    * fix that runs when this fires. Source-of-truth counts per
    * partition vs loaded counts per partition — no key shuffle, no
    * full-outer row join: two partition-keyed count aggregations and
    * an O(#partitions) comparison. A partition entirely absent from
    * the warehouse surfaces via the left join's null→0. At 100 TB
    * this is the hourly freshness/completeness monitor (counts ride
    * map-side partials; the E14 argument: monitoring must not re-scan
    * what it monitors — here it scans counts, not rows, and in a real
    * deployment the source side comes from ingest-ledger counts (E6),
    * not a source re-scan). */
  def backfillPlan(source: DataFrame, loaded: DataFrame,
      part: String): DataFrame = {
    val srcCnt = source.groupBy(part).agg(count(lit(1)).as("n_src"))
    val ldCnt = loaded.groupBy(part).agg(count(lit(1)).as("n_loaded"))
    srcCnt.join(ldCnt, Seq(part), "left")
      .withColumn("n_loaded", coalesce(col("n_loaded"), lit(0L)))
      .filter(col("n_loaded") < col("n_src"))
      .withColumn("n_missing", col("n_src") - col("n_loaded"))
      .select(col(part), col("n_src"), col("n_loaded"), col("n_missing"))
  }

  val etlBackfillPlan = QueryDef(
    "etl_backfill_plan",
    (s, d) => {
      // deterministic damage: every 5th month index never loaded, and
      // month index % 7 == 1 months lost half their rows (orderkey odd)
      val src = Tables.orders(s, d)
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
        .withColumn("mi", year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
      val loaded = src.filter(col("mi") % 5 =!= 0)
        .filter(!(col("mi") % 7 === 1 && col("o_orderkey") % 2 === 1))
      backfillPlan(src, loaded, "month").orderBy("month")
    },
    Some("""WITH src AS (
              SELECT strftime(o_orderdate, '%Y-%m') AS month,
                     year(o_orderdate) * 12 + month(o_orderdate) AS mi,
                     o_orderkey
              FROM orders),
            loaded AS (
              SELECT * FROM src
              WHERE mi % 5 <> 0 AND NOT (mi % 7 = 1 AND o_orderkey % 2 = 1)),
            sc AS (SELECT month, CAST(count(*) AS BIGINT) AS n_src
                   FROM src GROUP BY month),
            lc AS (SELECT month, CAST(count(*) AS BIGINT) AS n_loaded
                   FROM loaded GROUP BY month)
            SELECT sc.month, sc.n_src,
                   COALESCE(lc.n_loaded, 0) AS n_loaded,
                   sc.n_src - COALESCE(lc.n_loaded, 0) AS n_missing
            FROM sc LEFT JOIN lc ON lc.month = sc.month
            WHERE COALESCE(lc.n_loaded, 0) < sc.n_src
            ORDER BY sc.month"""))

  val all: Seq[QueryDef] = Seq(etlRepairPlan, etlBackfillPlan)
}
