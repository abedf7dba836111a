package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E11 — slowly-changing-dimension Type 2: turn a keyed change feed
  * into versioned rows with validity intervals.
  *
  * The reference's store is Type 1 — its upsert overwrites the row in
  * place (`Net7EtlBus.Service/EtlProcessor.cs` merge path), so history
  * is lost on every refresh. SCD2 is the warehouse-standard
  * alternative a user of an ETL bus asks for next: each attribute
  * change CLOSES the previous version (valid_to = change time) and
  * OPENS a new one (valid_to = NULL ⇒ current).
  *
  * Shape at 100 TB: everything happens inside ONE hash partitioning on
  * the dimension key — the change-detect lag, the consecutive-repeat
  * filter, and the interval lead all share `Window.partitionBy(key)`,
  * so the plan pays a single Exchange and two window passes over it
  * (ScdSpec asserts the one-Exchange plan). No global sort: ordering
  * is per-key within partitions.
  */
object Scd {

  /** Build SCD2 versions from a change feed. `feed` columns: the key,
    * the tracked attribute, an event time `ts`, and a total-order
    * tiebreaker `seq` (same-timestamp feeds are real: batch loads
    * stamp one ts). Consecutive duplicate attribute values are
    * collapsed — a version opens only when the value actually
    * changes. */
  def scd2(feed: DataFrame, key: String, attr: String): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col("ts"), col("seq"))
    val changes = feed
      .withColumn("prev", lag(col(attr), 1).over(byKey))
      .filter(col("prev").isNull || col(attr) =!= col("prev"))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(byKey))
      .select(col(key), col(attr), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"),
        col("seq"))
  }

  /** The coverage feed: each customer's order stream as a change feed
    * over o_orderpriority (key = o_custkey, tiebreak = o_orderkey). */
  private def orderFeed(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderpriority").as("attr"),
      col("o_orderdate").as("ts"), col("o_orderkey").as("seq"))

  val etlScd2 = QueryDef(
    "etl_scd2",
    // seq (the change feed's unique tiebreaker) stays in the output as
    // the version id AND the deterministic sort key: (key, valid_from,
    // attr) can tie when a key flips A→B→A within one timestamp.
    (s, d) => scd2(orderFeed(s, d), "o_custkey", "attr")
      .orderBy(col("o_custkey"), col("valid_from"), col("seq")),
    Some("""WITH feed AS (
              SELECT o_custkey, o_orderpriority AS attr,
                     o_orderdate AS ts, o_orderkey AS seq,
                     lag(o_orderpriority) OVER
                       (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                       AS prev
              FROM orders),
            changes AS (
              SELECT * FROM feed WHERE prev IS NULL OR attr <> prev),
            versions AS (
              SELECT o_custkey, attr, ts AS valid_from,
                     lead(ts) OVER
                       (PARTITION BY o_custkey ORDER BY ts, seq) AS valid_to,
                     seq
              FROM changes)
            SELECT o_custkey, attr, valid_from, valid_to,
                   (valid_to IS NULL) AS is_current, seq
            FROM versions
            ORDER BY o_custkey, valid_from, seq"""))

  /** E13b — point-in-time (temporal) lookup against the SCD2
    * dimension: for each probe row, the attribute version whose
    * half-open validity interval [valid_from, valid_to) contains the
    * probe instant — "what did the dimension say WHEN this happened",
    * the read that makes SCD2 worth building. At most one version
    * matches per probe (intervals are non-overlapping per key by
    * construction; same-timestamp change chains leave zero-length
    * intervals that can never match). Scale shape: an EQUI join on the
    * dimension key with the interval test as a residual predicate —
    * per-key version lists are small, so this is a plain key-partitioned
    * join, not R23's harder keyless range join. Probes 30 days before
    * their own order so the lookup genuinely walks history (probes
    * before a key's first version LEFT-join to null). */
  val qPitLookup = QueryDef(
    "q_pit_lookup",
    (s, d) => {
      val dim = scd2(orderFeed(s, d), "o_custkey", "attr")
        .select(col("o_custkey").as("k"), col("attr"),
          col("valid_from"), col("valid_to"))
      val probes = Tables.orders(s, d)
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          expr("o_orderdate - INTERVAL 30 DAYS").as("probe_ts"))
      probes.join(dim,
          col("o_custkey") === col("k") &&
            col("valid_from") <= col("probe_ts") &&
            (col("valid_to").isNull || col("probe_ts") < col("valid_to")),
          "left")
        .select(col("o_orderkey"), col("o_custkey"), col("probe_ts"),
          col("attr").as("attr_at_probe"), col("valid_from"))
        .orderBy("o_orderkey")
    },
    Some("""WITH feed AS (
              SELECT o_custkey, o_orderpriority AS attr,
                     o_orderdate AS ts, o_orderkey AS seq,
                     lag(o_orderpriority) OVER
                       (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                       AS prev
              FROM orders),
            changes AS (
              SELECT * FROM feed WHERE prev IS NULL OR attr <> prev),
            versions AS (
              SELECT o_custkey, attr, ts AS valid_from,
                     lead(ts) OVER
                       (PARTITION BY o_custkey ORDER BY ts, seq) AS valid_to
              FROM changes),
            probes AS (
              SELECT o_orderkey, o_custkey,
                     o_orderdate - INTERVAL 30 DAY AS probe_ts
              FROM orders WHERE o_orderkey % 10 = 0)
            SELECT p.o_orderkey, p.o_custkey, p.probe_ts,
                   v.attr AS attr_at_probe, v.valid_from
            FROM probes p LEFT JOIN versions v
              ON p.o_custkey = v.o_custkey
             AND v.valid_from <= p.probe_ts
             AND (v.valid_to IS NULL OR p.probe_ts < v.valid_to)
            ORDER BY p.o_orderkey"""))

  /** E13c — INCREMENTAL SCD2 maintenance: merge a new change-feed
    * delta into an existing SCD2 state without rebuilding history.
    * Closed versions are immutable facts — only the open (current)
    * version of a key the delta touches can change. So: split the
    * state on delta membership; untouched keys and closed versions
    * pass through untouched; each touched key's OPEN version is
    * re-fed (its valid_from/seq are the original change row) together
    * with that key's delta rows through the same [[scd2]] change
    * detection — consecutive-repeat collapse against the current
    * value and version chaining fall out of the one definition.
    *
    * Contract (the standard warehouse-loader assumption): per key,
    * delta rows are strictly newer than the state's open version
    * (event-time-ordered arrival). Rows at or before the open
    * version's (valid_from, seq) are dropped as STALE — either an
    * at-least-once replay of already-applied rows (making the whole
    * apply idempotent, which the streaming composition requires) or a
    * late row that should interleave into CLOSED history, which is a
    * restatement: rebuild the key from the raw feed; no incremental
    * loader can patch closed intervals without keeping the collapsed
    * raw rows it dropped.
    *
    * Scale: the refresh cost is O(touched keys' open versions + delta)
    * — state's closed history is anti/semi-joined (one key shuffle)
    * but never re-windowed; at 100 TB the delta-sized window pass is
    * what makes nightly dimension maintenance affordable (the E18
    * incremental-aggregate argument applied to E13). The gate is the
    * strongest statement available: the merged table must equal the
    * FULL rebuild over (history ∪ delta) bit-for-bit — the oracle IS
    * etl_scd2's full-feed SQL. */
  def scd2Apply(state: DataFrame, delta: DataFrame, key: String,
      attr: String): DataFrame = {
    val deltaKeys = delta.select(col(key)).distinct()
    val touched = state.join(deltaKeys, Seq(key), "left_semi")
    val untouched = state.join(deltaKeys, Seq(key), "left_anti")
    val closed = touched.filter(!col("is_current"))
    val open = touched.filter(col("is_current"))
    // The contract made executable: delta rows at or before the open
    // version's (valid_from, seq) are STALE — already folded into
    // history (an at-least-once replay) or a restatement this loader
    // must not corrupt closed intervals with. Dropping them makes the
    // apply IDEMPOTENT: re-applying an already-applied batch is a
    // provable no-op (the streaming S20 composition relies on this).
    val openV = open.select(col(key), col("valid_from").as("open_from"),
      col("seq").as("open_seq"))
    val freshDelta = delta.join(openV, Seq(key), "left")
      .filter(col("open_from").isNull ||
        col("ts") > col("open_from") ||
        (col("ts") === col("open_from") && col("seq") > col("open_seq")))
      .select(col(key), col(attr), col("ts"), col("seq"))
    val openFeed = open
      .select(col(key), col(attr), col("valid_from").as("ts"), col("seq"))
    val rebuilt = scd2(openFeed.union(freshDelta), key, attr)
    untouched.unionByName(closed).unionByName(rebuilt)
  }

  val etlScd2Apply = QueryDef(
    "etl_scd2_apply",
    (s, d) => {
      val cutoff = "1995-01-01"
      val history = orderFeed(s, d).filter(col("ts") <= lit(cutoff))
      val delta = orderFeed(s, d).filter(col("ts") > lit(cutoff))
      val state = scd2(history, "o_custkey", "attr")
      scd2Apply(state, delta, "o_custkey", "attr")
        .orderBy(col("o_custkey"), col("valid_from"), col("seq"))
    },
    // The full-rebuild SQL over the ENTIRE feed — incremental apply
    // must reproduce it exactly (same text as etl_scd2's oracle).
    Some("""WITH feed AS (
              SELECT o_custkey, o_orderpriority AS attr,
                     o_orderdate AS ts, o_orderkey AS seq,
                     lag(o_orderpriority) OVER
                       (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                       AS prev
              FROM orders),
            changes AS (
              SELECT * FROM feed WHERE prev IS NULL OR attr <> prev),
            versions AS (
              SELECT o_custkey, attr, ts AS valid_from,
                     lead(ts) OVER
                       (PARTITION BY o_custkey ORDER BY ts, seq) AS valid_to,
                     seq
              FROM changes)
            SELECT o_custkey, attr, valid_from, valid_to,
                   (valid_to IS NULL) AS is_current, seq
            FROM versions
            ORDER BY o_custkey, valid_from, seq"""))

  /** E13d — SCD2 from a CDC feed WITH delete tombstones: the version
    * history a real change-data-capture stream implies, which plain
    * [[scd2]] cannot express (E17's applyChanges keeps only final
    * state; this keeps the full timeline). Semantics per key, in
    * (ts, seq) order, over the row's EFFECTIVE state (attr, or NULL
    * while deleted):
    *
    *   - a version opens when the effective state changes (so a
    *     re-insert of the SAME value after a delete is a NEW version —
    *     the gap is real history — while consecutive equal upserts
    *     still collapse);
    *   - a tombstone closes the open version at its ts and emits no
    *     version of its own, UNLESS it is the key's trailing event, in
    *     which case it stays as the deleted-state marker row
    *     (attr NULL, valid_to NULL, is_current false) — what tells
    *     readers "this key ended deleted" and what makes the
    *     incremental apply idempotent for deleted keys;
    *   - a leading tombstone records "known deleted upstream" the same
    *     way (CDC asserts the key existed) — keeping full-rebuild ≡
    *     incremental-apply exact.
    *
    * Same one-Exchange shape as [[scd2]]: lag/row_number/lead all ride
    * Window.partitionBy(key). */
  def scd2Cdc(feed: DataFrame, key: String, attr: String,
      opCol: String = "op"): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col("ts"), col("seq"))
    feed
      .withColumn("eff",
        when(col(opCol) === "D", lit(null).cast("string"))
          .otherwise(col(attr)))
      .withColumn("prev_eff", lag(col("eff"), 1).over(byKey))
      .withColumn("rn", row_number().over(byKey))
      .filter(col("rn") === 1 || !(col("eff") <=> col("prev_eff")))
      .withColumn("valid_to", lead(col("ts"), 1).over(byKey))
      .filter(col("eff").isNotNull || col("valid_to").isNull)
      .select(col(key), col("eff").as(attr), col("ts").as("valid_from"),
        col("valid_to"),
        (col("valid_to").isNull && col("eff").isNotNull).as("is_current"),
        col("seq"))
  }

  /** E13d incremental half: [[scd2Apply]]'s merge for the CDC-feed
    * dimension. The "open" row of a key is its valid_to-IS-NULL row —
    * the current version OR the trailing tombstone; both re-enter
    * change detection (the tombstone as a 'D' row, so a delta
    * re-insert of the pre-delete value still opens a NEW version and
    * an empty delta reproduces the tombstone). The (valid_from, seq)
    * stale gate works unchanged because deleted keys keep their
    * tombstone's coordinates in the state. */
  def scd2ApplyCdc(state: DataFrame, delta: DataFrame, key: String,
      attr: String, opCol: String = "op"): DataFrame = {
    val deltaKeys = delta.select(col(key)).distinct()
    val touched = state.join(deltaKeys, Seq(key), "left_semi")
    val untouched = state.join(deltaKeys, Seq(key), "left_anti")
    val closed = touched.filter(col("valid_to").isNotNull)
    val open = touched.filter(col("valid_to").isNull)
    val openV = open.select(col(key), col("valid_from").as("open_from"),
      col("seq").as("open_seq"))
    val freshDelta = delta.join(openV, Seq(key), "left")
      .filter(col("open_from").isNull ||
        col("ts") > col("open_from") ||
        (col("ts") === col("open_from") && col("seq") > col("open_seq")))
      .select(col(key), col(attr), col(opCol), col("ts"), col("seq"))
    val openFeed = open.select(col(key), col(attr),
      when(col(attr).isNull, lit("D")).otherwise(lit("U")).as(opCol),
      col("valid_from").as("ts"), col("seq"))
    val rebuilt = scd2Cdc(openFeed.union(freshDelta), key, attr, opCol)
    untouched.unionByName(closed).unionByName(rebuilt)
  }

  private def cdcFeed(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      (col("o_orderkey") % 3000).as("ck"),
      when(col("o_orderkey") % 7 === 0, lit("D")).otherwise(lit("U")).as("op"),
      col("o_orderstatus").as("attr"),
      col("o_orderdate").as("ts"), col("o_orderkey").as("seq"))

  private val cdcRebuildSql =
    """WITH feed AS (
         SELECT o_orderkey % 3000 AS ck,
                CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
                o_orderstatus AS attr, o_orderdate AS ts, o_orderkey AS seq
         FROM orders),
       e AS (SELECT *, CASE WHEN op = 'D' THEN NULL ELSE attr END AS eff
             FROM feed),
       w AS (SELECT *,
               lag(eff) OVER (PARTITION BY ck ORDER BY ts, seq) AS prev_eff,
               row_number() OVER (PARTITION BY ck ORDER BY ts, seq) AS rn
             FROM e),
       kept AS (SELECT * FROM w
                WHERE rn = 1 OR (eff IS DISTINCT FROM prev_eff)),
       v AS (SELECT *,
               lead(ts) OVER (PARTITION BY ck ORDER BY ts, seq) AS valid_to
             FROM kept)
       SELECT ck, eff AS attr, ts AS valid_from, valid_to,
              (valid_to IS NULL AND eff IS NOT NULL) AS is_current, seq
       FROM v WHERE eff IS NOT NULL OR valid_to IS NULL
       ORDER BY ck, valid_from, seq"""

  val etlScd2Cdc = QueryDef(
    "etl_scd2_cdc",
    (s, d) => scd2Cdc(cdcFeed(s, d), "ck", "attr")
      .orderBy(col("ck"), col("valid_from"), col("seq")),
    Some(cdcRebuildSql))

  val etlScd2CdcApply = QueryDef(
    "etl_scd2_cdc_apply",
    (s, d) => {
      val cutoff = "1995-01-01"
      val history = cdcFeed(s, d).filter(col("ts") <= lit(cutoff))
      val delta = cdcFeed(s, d).filter(col("ts") > lit(cutoff))
      val state = scd2Cdc(history, "ck", "attr")
      scd2ApplyCdc(state, delta, "ck", "attr")
        .orderBy(col("ck"), col("valid_from"), col("seq"))
    },
    // incremental apply must reproduce the full rebuild bit-for-bit
    Some(cdcRebuildSql))

  val all: Seq[QueryDef] = Seq(etlScd2, qPitLookup, etlScd2Apply,
    etlScd2Cdc, etlScd2CdcApply)
}
