package graft.operators

import scala.jdk.CollectionConverters._

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IO20 — parquet BLOOM FILTER audit: row-group skipping for point
  * lookups on high-cardinality unsorted keys, where min/max zone maps
  * (IO16) are useless because every group's key span smears across
  * the whole domain. The write side enables per-column bloom filters
  * (`parquet.bloom.filter.enabled#col`); the audit side reads them
  * back through the parquet-java footer API and PROBES them with
  * planted present/absent keys, reporting per-probe how many row
  * groups a point lookup would still have to read.
  *
  * Self-verifying output: a `plain` control variant written from the
  * SAME data without blooms carries bloom_groups = 0 and
  * pass_groups = total_groups (no signal, no skipping — proving the
  * bloom variant's skipping comes from the option, not the layout),
  * while the `bloom` variant must show every group carrying a filter,
  * zero false negatives at file level (present ⇒ pass_groups ≥ 1)
  * and absent keys passing only the fpp-bounded residue of groups.
  *
  * Scale shape: the fixture is the one-time write (process-memoized,
  * the Ivf/RowGroups convention); the audit is the documented
  * driver-side footer-metadata class — O(files × groups × probes)
  * bloom probes, zero data pages read. No DuckDB oracle: this
  * engine's parquet_metadata() (1.0.0) predates bloom exposure, so
  * the gate is the SV columns + spec, declared rows-only.
  */
object BloomFilters {

  val KeyCol = "l_partkey"
  private val Ndv = "20000"

  private def scratch(dir: String): String =
    "/tmp/graft_warehouse/bloomaudit_" + dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + ProcessHandle.current().pid()

  private val built =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Both fixture variants under one base: `bloom` (per-column filter
    * + small row groups) and `plain` (same data, no filter). lineitem
    * arrives in orderkey order, so partkeys are uniform across every
    * group — min/max cannot prune, exactly the bloom use case. */
  def fixtureDirs(s: SparkSession, dir: String): (String, String) = {
    val base = scratch(dir)
    if (built.add(base)) {
      val src = Tables.lineitem(s, dir)
        .select(col(KeyCol), col("l_orderkey"), col("l_quantity"))
      // parquet-mr silently DROPS the bloom when a chunk ends up fully
      // dictionary-encoded (the dictionary page is already an exact
      // membership filter) — at test SF the partkey domain fits a
      // dictionary, so the key column's dictionary is disabled to put
      // the fixture in the high-NDV regime blooms exist for (at 100 TB
      // partkey NDV overflows dictionary pages and this is the
      // natural state, no knob needed)
      src.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 128 * 1024)
        .option(s"parquet.bloom.filter.enabled#$KeyCol", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$KeyCol", Ndv)
        .option(s"parquet.enable.dictionary#$KeyCol", "false")
        .parquet(s"$base/bloom")
      src.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 128 * 1024)
        .parquet(s"$base/plain")
    }
    (s"$base/bloom", s"$base/plain")
  }

  /** Probe keys: 8 planted-present candidates (low partkeys — truth
    * is still computed from the data, never assumed) and 8 planted-
    * absent negatives (partkeys are positive by construction). */
  private val Probes: Seq[Long] = (1L to 8L) ++ (-8L to -1L)

  /** Walk one variant's footers: per probe key, how many row groups
    * its point lookup must read. A group with no bloom can never be
    * skipped, so it passes every probe. */
  private def audit(s: SparkSession, path: String, variant: String,
      present: Set[Long]): Seq[(String, Long, Boolean, Long, Long, Long)] = {
    val conf = s.sparkContext.hadoopConfiguration
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    // (probe -> passes, withBloom, total) accumulated across files
    var total = 0L
    var withBloom = 0L
    val passes = scala.collection.mutable.Map(Probes.map(_ -> 0L): _*)
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        reader.getFooter.getBlocks.asScala.foreach { block =>
          total += 1
          val cc = block.getColumns.asScala
            .find(_.getPath.toDotString == KeyCol)
            .getOrElse(sys.error(s"column $KeyCol not in ${f.getName}"))
          val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(cc)
          if (bloom != null) {
            withBloom += 1
            Probes.foreach { k =>
              if (bloom.findHash(bloom.hash(k))) passes(k) += 1
            }
          } else Probes.foreach(k => passes(k) += 1)
        }
      } finally reader.close()
    }
    Probes.map(k => (variant, k, present(k), passes(k), withBloom, total))
  }

  def bloomAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (bloomDir, plainDir) = fixtureDirs(s, dir)
    // file-level ground truth from the data itself — one pushed-filter
    // scan over the probe id set, O(probes) result
    val present = s.read.parquet(bloomDir)
      .filter(col(KeyCol).isin(Probes: _*))
      .select(KeyCol).distinct().collect().map(_.getLong(0)).toSet
    (audit(s, bloomDir, "bloom", present) ++
      audit(s, plainDir, "plain", present))
      .toDF("variant", "key", "present", "pass_groups", "bloom_groups",
        "total_groups")
      .orderBy("variant", "key")
  }

  val qBloomAudit = QueryDef("io_bloom_audit", (s, d) => bloomAudit(s, d))

  val all: Seq[QueryDef] = Seq(qBloomAudit)
}
