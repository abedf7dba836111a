package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E17 — CDC apply-changes with delete tombstones.
  *
  * The reference's merge surface is insert-or-update only
  * (`BulkInsertOrUpdateAsync`, Net7EtlBus.Service/DataflowProcessor
  * .cs:222-247) — a row, once loaded, can never be removed by the
  * feed. Real change-data-capture feeds carry three ops (insert /
  * update / delete), and applying them is the last missing piece of
  * the merge surface next to E5 (upsert), E8c (streaming upsert) and
  * E13 (SCD2 history): for every key take the LATEST change in feed
  * order; if that change is a tombstone the key is absent from the
  * final state — including delete-then-reinsert (later insert wins)
  * and update-then-delete (key gone).
  *
  * Shape at 100 TB: one hash Exchange on the key (the row_number
  * window), tombstone filtering map-side after the rank — identical
  * cost to the plain upsert; deletes add zero extra shuffles. The
  * same in-batch reduction feeds [[JdbcSink.applyCdc]], which pushes
  * the surviving ops into a transactional store (DELETE for
  * tombstones, UPDATE→INSERT otherwise) with the E5b/E15 machinery.
  */
object Cdc {

  /** Final table state after applying a keyed change feed.
    *
    * @param feed    change rows: payload + `opCol` + ordering columns
    * @param keyCols key identifying the logical row
    * @param seqCols total order of changes within a key (ties across
    *                rows of one key must be broken by the caller —
    *                e.g. include a unique change id)
    * @param opCol   'D' = tombstone; anything else = upsert payload
    */
  def applyChanges(feed: DataFrame, keyCols: Seq[String], seqCols: Seq[String],
      opCol: String = "op"): DataFrame =
    latestChanges(feed, keyCols, seqCols).filter(col(opCol) =!= "D")

  /** The winning change per key, tombstones INCLUDED — the reduction a
    * transactional sink consumes ([[JdbcSink.applyCdc]] needs the 'D'
    * rows to issue DELETEs; the parquet-state path drops them). */
  def latestChanges(feed: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(seqCols.map(c => col(c).desc): _*)
    feed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Deterministic CDC feed over the orders table: keys collide via
    * `o_orderkey % 3000` so most keys see several changes, and every
    * 7th change is a tombstone — exercising delete-then-reinsert and
    * update-then-delete. Feed order is (o_orderdate, o_orderkey);
    * o_orderkey is unique, so the order is total. */
  private def ordersFeed(df: DataFrame): DataFrame =
    df.select(
      (col("o_orderkey") % 3000).as("ck"),
      when(col("o_orderkey") % 7 === 0, lit("D")).otherwise(lit("U")).as("op"),
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"))

  /** E24 — CDC EXTRACTION: the inverse of [[applyChanges]] — given two
    * table states, emit the minimal change feed (I/U/D with payload,
    * tombstones payload-free) that transforms old into new. The
    * snapshot-diff-to-CDC bridge: systems without upstream CDC
    * backfill their change streams from successive snapshots exactly
    * this way (and E23's audit becomes replayable, not just
    * readable). One full-outer key shuffle; payloads ride the same
    * join. Round-trip law (spec-gated): applying the extracted feed
    * onto the old state reproduces the new state exactly. */
  def extractChanges(oldDf: DataFrame, newDf: DataFrame, key: String,
      valueCols: Seq[String]): DataFrame = {
    val o = oldDf.select((key +: valueCols).map(col): _*)
      .withColumnsRenamed(valueCols.map(c => c -> s"${c}_o").toMap)
      .withColumn("_in_o", lit(1))
    val n = newDf.select((key +: valueCols).map(col): _*)
      .withColumn("_in_n", lit(1))
    val changed = valueCols
      .map(c => !(col(s"${c}_o") <=> col(c))).reduce(_ || _)
    o.join(n, Seq(key), "full_outer")
      .withColumn("op",
        when(col("_in_o").isNull, lit("I"))
          .when(col("_in_n").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("op").isNotNull)
      .select(col(key) +: col("op") +:
        valueCols.map(c =>
          when(col("op") =!= "D", col(c)).otherwise(lit(null)).as(c)): _*)
  }

  /** Apply an extracted feed back onto the old state — the replay half
    * of the round-trip law. Deletes and updates displace old rows;
    * inserts and updates carry the new payload. */
  def applyExtracted(oldDf: DataFrame, changes: DataFrame, key: String,
      valueCols: Seq[String]): DataFrame = {
    val touched = changes.select(col(key))
    val kept = oldDf.select((key +: valueCols).map(col): _*)
      .join(touched, Seq(key), "left_anti")
    kept.unionByName(changes.filter(col("op") =!= "D")
      .select((key +: valueCols).map(col): _*))
  }

  val etlCdcExtract = QueryDef(
    "etl_cdc_extract",
    (s, d) => {
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"),
          col("o_orderstatus").as("status"))
      val updated = base.filter(col("k") % 89 =!= 0)
        .withColumn("price",
          when(col("k") % 97 === 0, col("price") + 1).otherwise(col("price")))
        .unionByName(base.filter(col("k") % 101 === 0)
          .select((col("k") + 10000000L).as("k"), col("price"),
            col("status")))
      extractChanges(base, updated, "k", Seq("price", "status"))
        .orderBy("k", "op")
    },
    Some("""WITH base AS (
              SELECT o_orderkey AS k, o_totalprice AS price,
                     o_orderstatus AS status
              FROM orders),
            updated AS (
              SELECT k,
                     CASE WHEN k % 97 = 0 THEN price + 1 ELSE price END AS price,
                     status
              FROM base WHERE k % 89 <> 0
              UNION ALL
              SELECT k + 10000000, price, status FROM base WHERE k % 101 = 0),
            j AS (
              SELECT COALESCE(o.k, n.k) AS k,
                     CASE WHEN o.k IS NULL THEN 'I'
                          WHEN n.k IS NULL THEN 'D'
                          WHEN (o.price IS DISTINCT FROM n.price)
                            OR (o.status IS DISTINCT FROM n.status) THEN 'U'
                     END AS op,
                     n.price, n.status
              FROM base o FULL OUTER JOIN updated n ON o.k = n.k)
            SELECT k, op,
                   CASE WHEN op <> 'D' THEN price END AS price,
                   CASE WHEN op <> 'D' THEN status END AS status
            FROM j WHERE op IS NOT NULL
            ORDER BY k, op"""))

  val etlCdcMerge = QueryDef(
    "etl_cdc_merge",
    (s, d) => applyChanges(ordersFeed(Tables.orders(s, d)),
        Seq("ck"), Seq("o_orderdate", "o_orderkey"))
      .orderBy("ck"),
    Some("""WITH feed AS (
              SELECT o_orderkey % 3000 AS ck,
                     CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
                     o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                     o_orderdate
              FROM orders),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY ck
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM feed)
            SELECT ck, op, o_orderkey, o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate
            FROM ranked WHERE rn = 1 AND op <> 'D'
            ORDER BY ck"""))

  val all: Seq[QueryDef] = Seq(etlCdcMerge, etlCdcExtract)
}
