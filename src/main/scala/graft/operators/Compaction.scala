package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R75 — small-file compaction planning: the table-maintenance read
  * that keeps a 100 TB lake scannable. Streaming ingest and
  * fine-grained partitioning leave tables as thousands of tiny
  * parquet files; every scan then pays per-file open/footer cost and
  * the scheduler pays per-split overhead. The planner groups files
  * into target-sized rewrite bins: files ordered deterministically,
  * cumulative-row prefix, bin = prefix div target — the bin-packing
  * every lakehouse OPTIMIZE/compact command runs, expressed as a
  * window over FILE METADATA (O(files) rows, never data rows).
  *
  * The fragmented layout is a process-memoized fixture (the
  * Ivf/Partitioned convention): events hashed into [[SmallFiles]]
  * parquet files, written once; the entry itself reads only
  * per-file row counts via input_file_name(), so the benched cost is
  * the metadata aggregation — the data pass a real compactor would
  * PAY besides is exactly one rewrite of the binned files.
  *
  * Reference analogue: the batched-load housekeeping around
  * Net7-ETL-Bus's importer (DataflowProcessor.cs batches records per
  * load) applied to the storage layout itself.
  */
object Compaction {

  /** Rows per compacted output file — the knob a real compactor sets
    * from target file bytes / avg row width. */
  val TargetRows = 2500L

  val SmallFiles = 64

  private def scratch(dir: String): String =
    "/tmp/graft_warehouse/compact_" + dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + ProcessHandle.current().pid()

  private val built =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The fragmented events layout (built once per process+dataset). */
  def fragmentedDir(s: SparkSession, dir: String): String = {
    val base = scratch(dir)
    if (built.add(base)) {
      Tables.events(s, dir)
        .repartition(SmallFiles, col("event_id"))
        .write.mode("overwrite").parquet(s"$base/events_small")
    }
    s"$base/events_small"
  }

  /** Per-file rows + compaction bin + per-bin rollup columns. */
  def plan(s: SparkSession, dir: String): DataFrame = {
    val frag = fragmentedDir(s, dir)
    val perFile = s.read.parquet(frag)
      .groupBy(regexp_extract(input_file_name(), "([^/]+)$", 1).as("file"))
      .agg(count(lit(1)).as("rows"))
    // O(files) frames: global ordering over file metadata, not data
    val wCum = Window.orderBy("file")
      .rowsBetween(Window.unboundedPreceding, -1)
    val binned = perFile
      .withColumn("bin",
        expr(s"coalesce(sum(rows) OVER (ORDER BY file ROWS BETWEEN "
          + s"UNBOUNDED PRECEDING AND 1 PRECEDING), 0) div $TargetRows")
          .cast("long"))
    val wBin = Window.partitionBy("bin")
    binned
      .withColumn("bin_files", count(lit(1)).over(wBin))
      .withColumn("bin_rows", sum("rows").over(wBin))
      .select(col("file"), col("rows"), col("bin"), col("bin_files"),
        col("bin_rows"))
      .orderBy("file")
  }

  /** Execute the plan: rewrite the fragmented layout with ONE file
    * per bin. Each row joins its bin from the broadcast O(files)
    * plan, `repartition(bin)` co-locates every bin in exactly one
    * task, and the partitionBy write then emits exactly one file per
    * bin directory — the OPTIMIZE/compact action the plan describes.
    * The rewrite is the one data pass a compactor fundamentally pays;
    * the planning stayed metadata-only. */
  def execute(s: SparkSession, dir: String, outDir: String): Unit = {
    val frag = fragmentedDir(s, dir)
    val assignments = plan(s, dir).select("file", "bin")
    s.read.parquet(frag)
      .withColumn("file",
        regexp_extract(input_file_name(), "([^/]+)$", 1))
      .join(broadcast(assignments), "file")
      .drop("file")
      .repartition(col("bin"))
      .write.partitionBy("bin").mode("overwrite").parquet(outDir)
  }

  /** The oracle re-renders at dump time against the dir the entry last
    * ran on (QueryDef.dirOracle — per-entry, not a module global). */
  def all: Seq[QueryDef] = Seq(
    QueryDef.dirOracle("q_compaction_plan", (s, d) => plan(s, d),
      dir => oracleSqlFor(dir)))

  /** The oracle globs the SAME fragmented fixture dir. */
  private def oracleSqlFor(d: String): String = {
    val frag = scratch(d) + "/events_small"
    s"""WITH pf AS (SELECT regexp_extract(filename, '([^/]+)$$', 1)
             AS file, CAST(count(*) AS BIGINT) AS rows
           FROM read_parquet('$frag/*.parquet', filename=true)
           GROUP BY 1),
         b AS (SELECT file, rows,
                 CAST(COALESCE(SUM(rows) OVER (ORDER BY file
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // $TargetRows AS BIGINT) AS bin
               FROM pf)
         SELECT file, rows, bin,
                CAST(COUNT(*) OVER (PARTITION BY bin) AS BIGINT)
                  AS bin_files,
                CAST(SUM(rows) OVER (PARTITION BY bin) AS BIGINT)
                  AS bin_rows
         FROM b ORDER BY file"""
  }
}
