package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E36 — data-retention sweep (TTL / right-to-erasure delete) that
  * rewrites ONLY the partitions containing expired rows. At 100 TB a
  * compliance delete must not become a full-table rewrite: the sweep
  * plans which partitions are affected (one scan producing an
  * O(#partitions) plan), rewrites the partially-expired ones via
  * IO13's dynamic partition overwrite, and — the subtle case —
  * DELETES fully-expired partitions explicitly, because dynamic
  * overwrite only touches partitions PRESENT in the written frame: a
  * partition whose every row expired contributes no rows, so the
  * overwrite alone would silently retain all of it. The spec proves
  * all three partition fates (untouched byte-identical, partial
  * trimmed, empty removed); the entry's oracle proves the surviving
  * table equals the source filtered by the retention predicate.
  */
object Retention {

  /** Which partitions contain expired rows, with counts — the
    * reviewable sweep plan (O(#partitions) rows). */
  def sweepPlan(table: DataFrame, part: String,
      expired: Column): DataFrame =
    table.filter(expired)
      .groupBy(col(part)).agg(count(lit(1)).as("n_expired"))

  /** The directory name Spark's file writer produces for a partition
    * value: special chars URL-escaped, null as the Hive default
    * partition token. Building the delete path any other way misses
    * the real directory for non-alphanumeric or null values — the
    * silent-retention compliance failure the sweep exists to prevent
    * (and a value containing '/' would escape into an unintended
    * path). */
  private def partDirName(part: String, v: Any): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val s =
      if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
      else ExternalCatalogUtils.escapePathName(v.toString)
    ExternalCatalogUtils.escapePathName(part) + "=" + s
  }

  /** Execute the sweep at `path`: rewrite exactly the flagged
    * partitions with their surviving rows; drop fully-expired
    * partition directories. Returns the number of (rewritten,
    * deleted) partitions. */
  def sweep(spark: SparkSession, path: String, part: String,
      expired: Column): (Long, Long) = {
    val t = spark.read.parquet(path)
    // O(#partitions) driver rows — the documented bounded-collect class
    val flagged = sweepPlan(t, part, expired).select(part).collect()
      .map(_.get(0)).toSeq
    if (flagged.isEmpty) return (0L, 0L)
    // null-safe membership: isin() never matches a null partition
    // value, which would exempt the null partition from the rewrite
    val inFlagged = flagged.map(v => col(part) <=> lit(v)).reduce(_ || _)
    val survivors = t.filter(inFlagged && !expired)
    val survivedParts = survivors.select(part).distinct().collect()
      .map(_.get(0)).toSet
    if (survivedParts.nonEmpty)
      // cluster by the partition column before the dynamic overwrite:
      // an unclustered write fans every task across every partition
      // value (#tasks × #partitions files of a few KB each — the
      // small-files trap, guide §6); hash-clustered, each rewritten
      // partition is one file per holding task
      survivors.repartition(col(part)).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(part).parquet(path)
    // fully-expired partitions: no surviving row reaches the writer,
    // so dynamic overwrite leaves them — delete their dirs explicitly
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dead = flagged.filterNot(survivedParts)
    dead.foreach { v =>
      fs.delete(
        new org.apache.hadoop.fs.Path(path, partDirName(part, v)), true)
    }
    (survivedParts.size.toLong, dead.size.toLong)
  }

  /** Month-partitioned orders fixture, memoized per (process,
    * dataset); each entry invocation re-materializes a fresh copy to
    * sweep (the sweep mutates it). */
  private def freshTable(s: SparkSession, dir: String): String = {
    val path = "/tmp/graft_warehouse/retention_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      ProcessHandle.current().pid() + "_" + System.nanoTime()
    Tables.orders(s, dir)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      // cluster by partition value (same small-files rationale as the
      // sweep's rewrite): one file per month instead of up to
      // #tasks × #months — the sweep then lists, reads, and rewrites
      // ~32× fewer files
      .repartition(col("o_month"))
      .write.partitionBy("o_month").parquet(path)
    path
  }

  val Cutoff = "1996-06-15"

  val etlRetentionSweep = QueryDef(
    "etl_retention_sweep",
    (s, d) => {
      val path = freshTable(s, d)
      sweep(s, path, "o_month",
        col("o_orderdate") < lit(Cutoff).cast("timestamp"))
      s.read.parquet(path)
        .groupBy(col("o_month").cast("string").as("o_month"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("sum_c"))
        .orderBy("o_month")
    },
    Some(s"""SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
                    CAST(count(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5)
                      AS BIGINT)) AS BIGINT) AS sum_c
             FROM orders
             WHERE o_orderdate >= TIMESTAMP '$Cutoff'
             GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] = Seq(etlRetentionSweep)
}
