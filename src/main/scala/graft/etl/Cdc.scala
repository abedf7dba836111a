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

  val all: Seq[QueryDef] = Seq(etlCdcMerge)
}
