package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E30 — record linkage / entity resolution: incoming registry rows
  * with corrupted identifiers must link back to canonical records
  * WITHOUT a shared key — the identity-matching half of every master-
  * data ETL (the reference's composite-key dedup assumes clean keys;
  * linkage is what runs when they aren't). The classic two-phase
  * shape:
  *
  *  - BLOCK on a corruption-stable content key (here the last 3 name
  *    characters — the synthetic corruption hits the padding zone, as
  *    real OCR/typo noise clusters mid-field). Blocking keys must be
  *    CONTENT-derived so both sides compute them independently; block
  *    sizes are O(corpus / #blocks) — never all-pairs.
  *  - VERIFY candidates with edit distance (≤ 2) and keep each dirty
  *    row's BEST match (lowest distance, then lowest key — a
  *    deterministic rank-1 window with WindowGroupLimit pruning).
  *
  * The dirty feed is derived deterministically from the canonical
  * table (every 3rd customer, one key-positioned character swapped),
  * so the truth is KNOWN and the entry emits `is_correct` — the
  * linkage-quality readout real pipelines estimate by sampling, here
  * exact and oracle-gated end to end (DuckDB has levenshtein). */
object Linkage {

  /** Deterministic corrupted registry: dirty_id disjoint from real
    * keys; one char in the zero-padding zone (positions 11–15, value
    * derived from the key) replaced with 'x' — the last 3 chars
    * survive, so the block key holds. */
  def dirtyFeed(base: DataFrame): DataFrame =
    base.filter(col("c_custkey") % 3 === 0)
      .select((col("c_custkey") + 10000000L).as("dirty_id"),
        expr("concat(substr(c_name, 1, 10 + c_custkey % 5), 'x', " +
          "substr(c_name, 12 + c_custkey % 5))").as("dirty_name"))

  def link(s: SparkSession, d: String): DataFrame = {
    val base = Tables.customer(s, d).select("c_custkey", "c_name")
    val dirty = dirtyFeed(base)
    val cand = dirty
      .join(base,
        substring(col("dirty_name"), -3, 3) === substring(col("c_name"), -3, 3))
      .withColumn("lev", levenshtein(col("dirty_name"), col("c_name")))
      .filter(col("lev") <= 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dirty_id").orderBy(col("lev").asc, col("c_custkey").asc)
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("dirty_id"), col("c_custkey").as("matched_custkey"),
        col("lev"),
        (col("c_custkey") === col("dirty_id") - 10000000L).as("is_correct"))
      .orderBy("dirty_id")
  }

  val etlRecordLinkage = QueryDef(
    "etl_record_linkage",
    (s, d) => link(s, d),
    Some("""WITH base AS (SELECT c_custkey, c_name FROM customer),
            dirty AS (
              SELECT c_custkey + 10000000 AS dirty_id,
                     concat(substr(c_name, 1, CAST(10 + c_custkey % 5 AS INT)),
                            'x',
                            substr(c_name, CAST(12 + c_custkey % 5 AS INT)))
                       AS dirty_name
              FROM base WHERE c_custkey % 3 = 0),
            cand AS (
              SELECT d.dirty_id, b.c_custkey,
                     levenshtein(d.dirty_name, b.c_name) AS lev
              FROM dirty d JOIN base b
                ON right(d.dirty_name, 3) = right(b.c_name, 3)
              WHERE levenshtein(d.dirty_name, b.c_name) <= 2),
            best AS (
              SELECT *, row_number() OVER (PARTITION BY dirty_id
                       ORDER BY lev, c_custkey) AS rnk
              FROM cand)
            SELECT dirty_id, c_custkey AS matched_custkey,
                   CAST(lev AS INT) AS lev,
                   c_custkey = dirty_id - 10000000 AS is_correct
            FROM best WHERE rnk = 1 ORDER BY dirty_id"""))

  /** E30b — the same linkage verified with JARO-WINKLER (the census /
    * MDM comparator; prefix-weighted, transposition-tolerant — the
    * similarity edit distance over-penalizes). Spark has no Jaro
    * family, so this runs the native codegen'd
    * [[graft.plans.JaroWinkler]] expression (`graft_jaro_winkler`),
    * whose semantics are pinned to DuckDB's
    * `jaro_winkler_similarity` — empty→0, boost only above jaro 0.7,
    * prefix ≤ 4 at weight 0.1 — so the entry is fully oracle-gated
    * where a Scala-side-only comparator would be rows-only. Scores
    * round at 6 dp in BOTH engines (the graft_cosine convention) to
    * absorb last-ulp formula-order differences. Same block key, so
    * the join shape is identical to E30: block equi-join + map-side
    * score + one rank-1 window. */
  val etlRecordLinkageJw = QueryDef(
    "etl_record_linkage_jw",
    (s, d) => {
      val base = Tables.customer(s, d).select("c_custkey", "c_name")
      val dirty = dirtyFeed(base)
      val cand = dirty
        .join(base,
          substring(col("dirty_name"), -3, 3) === substring(col("c_name"), -3, 3))
        .withColumn("jw",
          round(call_function("graft_jaro_winkler",
            col("dirty_name"), col("c_name")), 6))
        .filter(col("jw") >= 0.85)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("dirty_id").orderBy(col("jw").desc, col("c_custkey").asc)
      cand.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select(col("dirty_id"), col("c_custkey").as("matched_custkey"),
          col("jw"),
          (col("c_custkey") === col("dirty_id") - 10000000L).as("is_correct"))
        .orderBy("dirty_id")
    },
    Some("""WITH base AS (SELECT c_custkey, c_name FROM customer),
            dirty AS (
              SELECT c_custkey + 10000000 AS dirty_id,
                     concat(substr(c_name, 1, CAST(10 + c_custkey % 5 AS INT)),
                            'x',
                            substr(c_name, CAST(12 + c_custkey % 5 AS INT)))
                       AS dirty_name
              FROM base WHERE c_custkey % 3 = 0),
            cand AS (
              SELECT d.dirty_id, b.c_custkey,
                     ROUND(jaro_winkler_similarity(d.dirty_name, b.c_name), 6)
                       AS jw
              FROM dirty d JOIN base b
                ON right(d.dirty_name, 3) = right(b.c_name, 3)),
            kept AS (SELECT * FROM cand WHERE jw >= 0.85),
            best AS (
              SELECT *, row_number() OVER (PARTITION BY dirty_id
                       ORDER BY jw DESC, c_custkey) AS rnk
              FROM kept)
            SELECT dirty_id, c_custkey AS matched_custkey, jw,
                   c_custkey = dirty_id - 10000000 AS is_correct
            FROM best WHERE rnk = 1 ORDER BY dirty_id"""))

  val all: Seq[QueryDef] = Seq(etlRecordLinkage, etlRecordLinkageJw)
}
