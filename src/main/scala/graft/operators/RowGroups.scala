package graft.operators

import scala.jdk.CollectionConverters._

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IO16 — parquet row-group statistics audit: the min/max footer
  * stats every engine's data-skipping actually reads (R37/R86 showed
  * FILE-level zone maps; predicate pushdown prunes at ROW-GROUP
  * granularity inside each file). The entry surfaces each row group's
  * key span straight from the footers — the tool for answering "will
  * a key-range predicate skip within these files, or did an unsorted
  * write smear every group across the whole key domain".
  *
  * The footer walk is DRIVER-SIDE by design: O(files × rowgroups)
  * metadata rows, no data read at all — the same documented class as
  * the Compaction file-metadata frame. The fixture is a sorted write
  * with a small parquet block size so multiple row groups exist at
  * every SF (process-memoized, the Ivf convention); the oracle reads
  * THE SAME footers through DuckDB's parquet_metadata(), so the two
  * engines independently parse identical physical metadata.
  */
object RowGroups {

  val KeyCol = "l_orderkey"

  private def scratch(dir: String): String =
    "/tmp/graft_warehouse/rgstats_" + dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + ProcessHandle.current().pid()

  private val built =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Sorted lineitem layout with ~128 KB row groups (several groups
    * per file at every SF). */
  def sortedDir(s: SparkSession, dir: String): String = {
    val base = scratch(dir)
    if (built.add(base)) {
      Tables.lineitem(s, dir)
        .sort(KeyCol, "l_linenumber")
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", 128 * 1024)
        .parquet(s"$base/sorted")
    }
    s"$base/sorted"
  }

  /** Footer stats for `col` over every parquet file in `path`:
    * (file, row_group_id, min_key, max_key, n_values). */
  def stats(s: SparkSession, path: String, col: String): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    val rows = files.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        reader.getFooter.getBlocks.asScala.zipWithIndex.map {
          case (block, i) =>
            val cc = block.getColumns.asScala
              .find(_.getPath.toDotString == col)
              .getOrElse(sys.error(s"column $col not in ${f.getName}"))
            val st = cc.getStatistics
            (f.getName, i.toLong,
              st.genericGetMin.asInstanceOf[Number].longValue(),
              st.genericGetMax.asInstanceOf[Number].longValue(),
              cc.getValueCount)
        }.toSeq
      } finally reader.close()
    }
    import s.implicits._
    rows.toSeq.toDF("file", "row_group_id", "min_key", "max_key", "n_values")
  }

  private def oracleSqlFor(d: String): String = {
    val dir = scratch(d) + "/sorted"
    s"""WITH m AS (
          SELECT regexp_extract(file_name, '([^/]+)$$', 1) AS file,
                 row_group_id,
                 CAST(stats_min_value AS BIGINT) AS min_key,
                 CAST(stats_max_value AS BIGINT) AS max_key,
                 CAST(num_values AS BIGINT) AS n_values
          FROM parquet_metadata('$dir/*.parquet')
          WHERE path_in_schema = '$KeyCol')
        SELECT file,
               ROW_NUMBER() OVER (PARTITION BY file ORDER BY row_group_id)
                 - 1 AS row_group_id,
               min_key, max_key, n_values
        FROM m ORDER BY file, row_group_id"""
  }

  /** IO19 — physical-encoding audit: per column chunk, the page
    * encodings, codec and compressed/uncompressed bytes straight from
    * the footers — the "is this column actually dictionary-encoding"
    * read behind storage-bill surprises (a high-cardinality string
    * that falls out of dictionary encoding can triple a table
    * silently; IO18 measures codecs, this shows WHERE the bytes go
    * per column). Driver-side O(files × rowgroups × columns) metadata
    * walk, zero data read; the oracle parses the SAME footers through
    * DuckDB's parquet_metadata, so two parquet implementations must
    * agree on encoding sets (order-normalized) and exact byte
    * counts. */
  def encodingAudit(s: SparkSession, path: String): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    val rows = files.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        reader.getFooter.getBlocks.asScala.zipWithIndex.flatMap {
          case (block, i) =>
            block.getColumns.asScala.map { cc =>
              (f.getName, i.toLong, cc.getPath.toDotString,
                cc.getEncodings.asScala.map(_.name).toSeq.sorted
                  .mkString(","),
                cc.getCodec.name, cc.getTotalSize,
                cc.getTotalUncompressedSize, cc.getValueCount)
            }
        }.toSeq
      } finally reader.close()
    }
    import s.implicits._
    rows.toSeq.toDF("file", "row_group_id", "column", "encodings",
      "codec", "compressed_bytes", "uncompressed_bytes", "n_values")
  }

  private def encodingOracleFor(d: String): String = {
    val dir = scratch(d) + "/sorted"
    s"""WITH m AS (
          SELECT regexp_extract(file_name, '([^/]+)$$', 1) AS file,
                 row_group_id, path_in_schema AS "column",
                 array_to_string(list_sort(string_split(encodings, ', ')),
                   ',') AS encodings,
                 compression AS codec,
                 CAST(total_compressed_size AS BIGINT)
                   AS compressed_bytes,
                 CAST(total_uncompressed_size AS BIGINT)
                   AS uncompressed_bytes,
                 CAST(num_values AS BIGINT) AS n_values
          FROM parquet_metadata('$dir/*.parquet')),
        r AS (SELECT file, DENSE_RANK() OVER (PARTITION BY file
                ORDER BY row_group_id) - 1 AS row_group_id,
                "column", encodings, codec, compressed_bytes,
                uncompressed_bytes, n_values
              FROM m)
        SELECT * FROM r ORDER BY file, row_group_id, "column""""
  }

  /** Fixture for IO22: the sorted layout re-written with ~8 KB pages
    * so every row group holds SEVERAL pages (the default 1 MB page
    * would leave one page per 128 KB group and the page level would
    * be vacuous). */
  def pagedDir(s: SparkSession, dir: String): String = {
    val base = scratch(dir)
    if (built.add(base + "/paged")) {
      Tables.lineitem(s, dir)
        .sort(KeyCol, "l_linenumber")
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", 256 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .option("parquet.page.row.count.limit", 2500)
        .parquet(s"$base/paged")
    }
    s"$base/paged"
  }

  /** IO22 — PAGE-level column-index audit: the min/max spans and row
    * counts of every DATA PAGE, read from the parquet column index /
    * offset index (PARQUET-1201) — the skipping granularity UNDER
    * IO16's row groups (engines prune groups by footer stats, then
    * pages by the column index; a sorted layout makes both levels
    * tile). Per page: key span, row count, and the column index's own
    * declared boundary order — on the sorted fixture it must say
    * ASCENDING, which is the machine-readable witness that page-level
    * range pruning will engage. Driver-side metadata walk (the IO16
    * class), zero data pages read. No SQL oracle: DuckDB 1.0.0's
    * parquet_metadata exposes row groups, not page indexes — rows-only
    * SV + RowGroupsSpec (spans tile per group and never overlap; page
    * row counts conserve the group count; several pages per group). */
  def pageIndexAudit(s: SparkSession, path: String,
      column: String): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val rows = files.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        reader.getFooter.getBlocks.asScala.zipWithIndex.flatMap {
          case (block, g) =>
            val cc = block.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .getOrElse(sys.error(s"column $column not in ${f.getName}"))
            val ci = reader.readColumnIndex(cc)
            val oi = reader.readOffsetIndex(cc)
            if (ci == null || oi == null) Nil
            else {
              def long(b: java.nio.ByteBuffer): Long =
                b.duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
              val mins = ci.getMinValues.asScala.map(long)
              val maxs = ci.getMaxValues.asScala.map(long)
              val n = oi.getPageCount
              (0 until n).map { p =>
                val nextFirst =
                  if (p + 1 < n) oi.getFirstRowIndex(p + 1)
                  else block.getRowCount
                (f.getName, g.toLong, p.toLong, mins(p), maxs(p),
                  nextFirst - oi.getFirstRowIndex(p),
                  ci.getBoundaryOrder.name)
              }
            }
        }.toSeq
      } finally reader.close()
    }
    import s.implicits._
    rows.toSeq.toDF("file", "row_group_id", "page_id", "min_key",
      "max_key", "n_rows", "boundary_order")
  }

  /** Oracles re-render at dump time against the dir each entry last
    * ran on (QueryDef.dirOracle — per-entry, not a module global). */
  def all: Seq[QueryDef] = Seq(
    QueryDef.dirOracle("io_rowgroup_stats",
      (s, d) => stats(s, sortedDir(s, d), KeyCol)
        .orderBy("file", "row_group_id"),
      dir => oracleSqlFor(dir)),
    QueryDef.dirOracle("io_encoding_audit",
      (s, d) => encodingAudit(s, sortedDir(s, d))
        .orderBy("file", "row_group_id", "column"),
      dir => encodingOracleFor(dir)),
    QueryDef("io_page_index_audit",
      (s, d) => pageIndexAudit(s, pagedDir(s, d), KeyCol)
        .orderBy("file", "row_group_id", "page_id")))
}
