package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R37 — Z-order (Morton) multi-dimensional clustering for
  * data-skipping layouts.
  *
  * At 100 TB a table is filtered on MORE than its sort key: a layout
  * range-clustered on one column skips row groups for that column only,
  * while a Z-ordered layout interleaves the bits of several columns so
  * every file/row-group covers a small hyper-rectangle of the key
  * space — a range filter on ANY of the interleaved dimensions then
  * prunes most row groups via ordinary parquet min/max statistics (the
  * Delta/Iceberg OPTIMIZE ZORDER idea, expressed with nothing but a
  * codegen'd integer expression + repartitionByRange + sorted write;
  * no table format required).
  *
  * The z-value is pure integer arithmetic — bit i of each dimension
  * lands at position dims·i of the key — so the oracle mirrors it
  * term-for-term in DuckDB and the entry is exactly hash-gated.
  * Production use quantile-normalizes each dimension first (equal-depth
  * buckets over 2^bits); the raw masked form here keeps the whole
  * operator SQL-mirrorable, and [[ZorderSpec]] gates the part an SQL
  * oracle cannot: that the layout actually skips row groups for
  * two-dimensional range filters that a single-column sort cannot
  * serve.
  *
  * Reference analogue: Net7EtlBus keys its store on the composite
  * zipcode_statecode (`ZipCodeHelpers.cs:12-15`) — a lexicographic
  * concat that clusters one dimension only; Z-ordering is the
  * multi-dimensional generalization a 100 TB layout needs.
  */
object Zorder {

  /** Morton interleave of two non-negative integer dims, `bits` low
    * bits each (defaults cover 16-bit-quantized dimensions):
    * z = Σ_i ((x>>i)&1)·4^i + 2·((y>>i)&1)·4^i. Codegen-friendly:
    * a flat sum of shifts/ands, no UDF, no loop at runtime. */
  def zvalue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31)
    val mask = (1L << bits) - 1
    val xb = x.cast("long").bitwiseAND(lit(mask))
    val yb = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftright(xb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(yb, i).bitwiseAND(lit(1L)) * lit(2L << (2 * i))
    }.reduce(_ + _)
  }

  /** Write `df` Z-clustered on (x, y): range-partition by z-value so
    * each output file owns a contiguous z-range (a small
    * hyper-rectangle of (x, y) space), sort within partitions so
    * row-group min/max stats are tight. The helper column never
    * reaches the files. */
  def writeZordered(df: DataFrame, x: Column, y: Column, path: String,
      numFiles: Int, bits: Int = 16,
      options: Map[String, String] = Map.empty): Unit =
    df.withColumn("__zval", zvalue2(x, y, bits))
      .repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
      .write.options(options).mode("overwrite").parquet(path)

  /** Oracle-side mirror of [[zvalue2]]: the identical flat term sum in
    * DuckDB integer arithmetic. */
  private def oZ(xc: String, yc: String, bits: Int): String = {
    val mask = (1L << bits) - 1
    (0 until bits).map { i =>
      s"((($xc & $mask) >> $i) & 1) * ${1L << (2 * i)} + " +
        s"((($yc & $mask) >> $i) & 1) * ${2L << (2 * i)}"
    }.mkString("CAST(", " + ", " AS BIGINT)")
  }

  /** The z-value computation over lineitem's (l_partkey, l_suppkey) —
    * the two dimensions a part-supplier workload filters together. */
  val qZorder = QueryDef(
    "q_zorder_key",
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        zvalue2(col("l_partkey"), col("l_suppkey")).as("zval"))
      .orderBy("zval", "l_orderkey", "l_linenumber"),
    Some(s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                    ${oZ("l_partkey", "l_suppkey", 16)} AS zval
             FROM lineitem
             ORDER BY zval, l_orderkey, l_linenumber"""))

  // ---- R86: zone-map skipping readout over two stored layouts ----

  private def scratch(dir: String): String =
    "/tmp/graft_warehouse/zone_" + dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + ProcessHandle.current().pid()

  private val builtLayouts =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  val ZoneFiles = 16

  /** Writes the SAME events projection twice (once per process per
    * dataset): linearly clustered on user_id, and Z-ordered on
    * (user_id, value-grid). Returns the two layout dirs. */
  def zoneLayouts(s: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) = {
    val base = scratch(dir)
    if (builtLayouts.add(base)) {
      val ev = Tables.events(s, dir).select(col("event_id"),
        col("user_id"), floor(col("value")).cast("long").as("v"))
      ev.repartitionByRange(ZoneFiles, col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(s"$base/linear")
      writeZordered(ev, col("user_id"), col("v"), s"$base/zorder",
        ZoneFiles)
      // settle the freshly written fixtures: one read-through per
      // layout so footer parsing + OS page-cache population happen
      // HERE (the once-per-process build, i.e. the bench's untimed
      // warm-up) and never inside a timed rep — r8 saw this entry
      // move 0.32→0.44 s purely from fresh-write cache state
      s.read.parquet(s"$base/linear").count()
      s.read.parquet(s"$base/zorder").count()
    }
    (s"$base/linear", s"$base/zorder")
  }

  /** R86 — zone-map (file min/max) skipping effectiveness, measured:
    * for each stored layout and each predicate shape, how many files
    * could a min/max-pruning reader skip. The numbers BEHIND the R37
    * claim, emitted as data: the linear layout skips on its sort
    * dimension only (the value-only predicate prunes nothing), the
    * Z-ordered layout prunes on either dimension. Zone maps are
    * O(files) metadata — the whole entry aggregates per
    * input_file_name, never per row, after the first count. */
  val qZonemapSkipping = QueryDef.dirOracle(
    "q_zonemap_skipping",
    (s, d) => {
      val (lin, zo) = zoneLayouts(s, d)
      def zones(path: String, layout: String) =
        s.read.parquet(path)
          .groupBy(input_file_name().as("f"))
          .agg(count(lit(1)).as("rows"),
            min("user_id").as("mn_u"), max("user_id").as("mx_u"),
            min("v").as("mn_v"), max("v").as("mx_v"))
          .withColumn("layout", lit(layout))
      // predicate bounds derived from the observed spans (quartile
      // boxes as exact integer arithmetic) so the demonstration holds
      // at every scale factor's id range — a 1-row stats broadcast
      val st = s.read.parquet(lin).agg(
        min("user_id").as("gu0"), max("user_id").as("gu1"),
        min("v").as("gv0"), max("v").as("gv1"))
      val z = zones(lin, "linear").union(zones(zo, "zorder"))
        .crossJoin(broadcast(st))
        .withColumn("u_lo", expr("gu0 + (gu1 - gu0) div 4"))
        .withColumn("u_hi", expr("gu0 + (gu1 - gu0) div 2"))
        .withColumn("v_lo", expr("gv0 + (gv1 - gv0) div 5"))
        .withColumn("v_hi", expr("gv0 + ((gv1 - gv0) * 2) div 5"))
      // predicate shapes: a box on both dims, and value-dim only
      val skipBox = col("mn_u") > col("u_hi") ||
        col("mx_u") < col("u_lo") ||
        col("mn_v") > col("v_hi") || col("mx_v") < col("v_lo")
      val skipVal = col("mn_v") > col("v_hi") ||
        col("mx_v") < col("v_lo")
      z.select(col("layout"), col("rows"),
        when(skipBox, 1L).otherwise(0L).as("sb"),
        when(skipVal, 1L).otherwise(0L).as("sv"))
        .groupBy("layout")
        .agg(count(lit(1)).as("n_files"),
          sum("sb").as("skipped_box"),
          sum("sv").as("skipped_value"),
          sum("rows").as("n_rows"))
        .select(col("layout"), col("n_files"), col("skipped_box"),
          col("skipped_value"), col("n_rows"),
          expr("(skipped_box * 1000000) div n_files").as("box_ratio_q"),
          expr("(skipped_value * 1000000) div n_files")
            .as("value_ratio_q"))
        .orderBy("layout")
    },
    dir => oZoneSql(dir))

  private def oZoneSql(d: String): String = {
    val base = scratch(d)
    s"""WITH z AS (
          SELECT 'linear' AS layout, filename AS f, user_id, v
          FROM read_parquet('$base/linear/*.parquet', filename=true)
          UNION ALL
          SELECT 'zorder', filename, user_id, v
          FROM read_parquet('$base/zorder/*.parquet', filename=true)),
        pf AS (SELECT layout, f, CAST(count(*) AS BIGINT) AS rows,
                 MIN(user_id) AS mn_u, MAX(user_id) AS mx_u,
                 MIN(v) AS mn_v, MAX(v) AS mx_v
               FROM z GROUP BY 1, 2),
        st AS (SELECT MIN(user_id) AS gu0, MAX(user_id) AS gu1,
                 MIN(v) AS gv0, MAX(v) AS gv1
               FROM read_parquet('$base/linear/*.parquet')),
        bx AS (SELECT gu0 + (gu1 - gu0) // 4 AS u_lo,
                 gu0 + (gu1 - gu0) // 2 AS u_hi,
                 gv0 + (gv1 - gv0) // 5 AS v_lo,
                 gv0 + ((gv1 - gv0) * 2) // 5 AS v_hi
               FROM st),
        fl AS (SELECT layout, rows,
                 CASE WHEN mn_u > u_hi OR mx_u < u_lo OR mn_v > v_hi
                   OR mx_v < v_lo THEN 1 ELSE 0 END AS sb,
                 CASE WHEN mn_v > v_hi OR mx_v < v_lo THEN 1 ELSE 0 END
                   AS sv
               FROM pf CROSS JOIN bx)
        SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
               CAST(SUM(sb) AS BIGINT) AS skipped_box,
               CAST(SUM(sv) AS BIGINT) AS skipped_value,
               CAST(SUM(rows) AS BIGINT) AS n_rows,
               CAST((SUM(sb) * 1000000) // count(*) AS BIGINT)
                 AS box_ratio_q,
               CAST((SUM(sv) * 1000000) // count(*) AS BIGINT)
                 AS value_ratio_q
        FROM fl GROUP BY layout ORDER BY layout"""
  }

  /** The zonemap oracle re-renders the pid-scoped fixture path on
    * every access, against the dir the entry last ran on
    * (QueryDef.dirOracle — per-entry, not a module global). */
  def all: Seq[QueryDef] = Seq(qZorder, qZonemapSkipping)
}
