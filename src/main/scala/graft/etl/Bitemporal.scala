package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E35 — bitemporal AS-OF reads: valid time × transaction time (the
  * oracle-gated entry beside BitemporalSpec's hand-graph composition
  * witness; this file turns the E35 capability from test-only into a
  * DuckDB-checked query over the real tables).
  *
  * E13b answers "what was customer K's attribute at instant V" against
  * the FINAL belief. But beliefs change: late-arriving changes (loaded
  * in a later batch, stamped with an EARLIER real-world time) rewrite
  * history that earlier reports were already built on. The bitemporal
  * read adds the second axis — "as of load batch B, what did we
  * BELIEVE K's attribute was at instant V" — which is how a warehouse
  * explains why last month's report disagrees with today's re-run of
  * the same query.
  *
  * Construction: the change feed splits into load batches by a key
  * hash (arrival order deliberately UNCORRELATED with valid time, so
  * later batches genuinely rewrite early history); belief-at-B is the
  * E13 SCD2 build over the feed restricted to batches ≤ B. The entry
  * emits one row per probe with the believed attribute under EVERY
  * transaction batch side by side plus the `revised` witness flag
  * (belief changed across loads). The per-batch rebuild is the
  * bounded-B audit form — B is a report dimension (3 here), like the
  * schema-drift audit's snapshot versions; a deployment maintaining
  * beliefs continuously uses E13c's incremental apply and STORES
  * tx intervals instead of rebuilding. Everything is the E11
  * one-Exchange window shape × B, then key-equi probe joins with
  * interval residuals (the E13b shape). */
object Bitemporal {

  private val Batches = 3

  private def feed(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderpriority").as("attr"),
      col("o_orderdate").as("ts"), col("o_orderkey").as("seq"),
      (col("o_orderkey") % Batches).as("tx"))

  /** Believed attribute per probe under each transaction batch. */
  def asOf(s: SparkSession, dir: String): DataFrame = {
    val f = feed(s, dir)
    val probes = Tables.customer(s, dir)
      .filter(col("c_custkey") % 20 === 0)
      .select(col("c_custkey"))
    val probeTs = lit(java.sql.Date.valueOf("1995-06-01"))
    val joined = (0 until Batches).foldLeft(
      probes.withColumn("probe_ts", probeTs)) { (acc, b) =>
      val dim = Scd.scd2(f.filter(col("tx") <= b), "o_custkey", "attr")
        .select(col("o_custkey").as(s"k$b"), col("attr").as(s"attr_tx$b"),
          col("valid_from").as(s"vf$b"), col("valid_to").as(s"vt$b"))
      acc.join(dim,
          col("c_custkey") === col(s"k$b") &&
            col(s"vf$b") <= col("probe_ts") &&
            (col(s"vt$b").isNull || col("probe_ts") < col(s"vt$b")),
          "left")
        .drop(s"k$b", s"vf$b", s"vt$b")
    }
    joined
      .withColumn("revised",
        !(col("attr_tx0") <=> col("attr_tx1")) ||
          !(col("attr_tx1") <=> col("attr_tx2")))
      .select("c_custkey", "probe_ts", "attr_tx0", "attr_tx1", "attr_tx2",
        "revised")
      .orderBy("c_custkey")
  }

  private def oDim(b: Int): String =
    s"""dim$b AS (
          SELECT o_custkey, attr, ts AS valid_from,
                 lead(ts) OVER
                   (PARTITION BY o_custkey ORDER BY ts, seq) AS valid_to
          FROM (
            SELECT * FROM (
              SELECT o_custkey, attr, ts, seq,
                     lag(attr) OVER
                       (PARTITION BY o_custkey ORDER BY ts, seq) AS prev
              FROM feed WHERE tx <= $b)
            WHERE prev IS NULL OR attr <> prev))"""

  val qBitemporalAsof = QueryDef(
    "q_bitemporal_asof",
    (s, d) => asOf(s, d),
    Some {
      val dims = (0 until Batches).map(oDim).mkString(",\n          ")
      val joins = (0 until Batches).map(b =>
        s"""LEFT JOIN dim$b d$b ON d$b.o_custkey = p.c_custkey
             AND d$b.valid_from <= p.probe_ts
             AND (d$b.valid_to IS NULL OR p.probe_ts < d$b.valid_to)""")
        .mkString("\n          ")
      s"""WITH feed AS (
            SELECT o_custkey, o_orderpriority AS attr, o_orderdate AS ts,
                   o_orderkey AS seq, o_orderkey % $Batches AS tx
            FROM orders),
          probes AS (
            SELECT c_custkey, DATE '1995-06-01' AS probe_ts FROM customer
            WHERE c_custkey % 20 = 0),
          $dims
          SELECT p.c_custkey, p.probe_ts,
                 d0.attr AS attr_tx0, d1.attr AS attr_tx1,
                 d2.attr AS attr_tx2,
                 (d0.attr IS DISTINCT FROM d1.attr
                  OR d1.attr IS DISTINCT FROM d2.attr) AS revised
          FROM probes p
          $joins
          ORDER BY p.c_custkey"""
    })

  val all: Seq[QueryDef] = Seq(qBitemporalAsof)
}
