package graft.etl

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Coverage entries E1-E7 (SURVEY.md §2.1) with DuckDB oracles. The
  * oracle SQL mirrors each pipeline stage as a CTE over the same
  * checked-in CSV; shared fragments below keep the two sides literally
  * in sync.
  */
object EtlQueries {

  private val csv = ZipEtl.csvPath

  private[etl] val oIngest =
    s"""ingest AS (
       |  SELECT * FROM read_csv('$csv', header=true, columns={
       |    'state_fips':'INTEGER','state':'VARCHAR','state_abbr':'VARCHAR',
       |    'zipcode':'VARCHAR','county':'VARCHAR','city':'VARCHAR',
       |    'last_updated':'DATE'})
       |)""".stripMargin

  private[etl] val oDedup =
    """dedup AS (
      |  SELECT state_fips, state, state_abbr, zipcode, county, city, last_updated
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY zipcode, state_abbr
      |          ORDER BY last_updated DESC, state_fips DESC, county DESC, city DESC) AS rn
      |        FROM ingest)
      |  WHERE rn = 1
      |)""".stripMargin

  // Integer-exact enrichment stub — identical arithmetic to ZipEtl.enrich.
  private val oEnrich =
    """enriched AS (
      |  SELECT *,
      |    zipcode || '_' || state_abbr AS composite_key,
      |    -90 + CAST(CAST(zipcode AS BIGINT) * 7919 % 18000 AS DOUBLE) / 100.0 AS latitude,
      |    -180 + CAST(CAST(zipcode AS BIGINT) * 104729 % 36000 AS DOUBLE) / 100.0 AS longitude,
      |    CAST(zipcode AS BIGINT) * 31 % 4000 AS elevation,
      |    'UTC' || CASE WHEN CAST(zipcode AS BIGINT) % 25 - 12 >= 0
      |        THEN '+' || CAST(CAST(zipcode AS BIGINT) % 25 - 12 AS VARCHAR)
      |        ELSE CAST(CAST(zipcode AS BIGINT) % 25 - 12 AS VARCHAR) END AS timezone,
      |    CASE state_fips % 4 WHEN 0 THEN 'Eastern' WHEN 1 THEN 'Central'
      |                        WHEN 2 THEN 'Mountain' ELSE 'Pacific' END AS tz_region
      |  FROM dedup
      |)""".stripMargin

  private val oBaseline =
    s"""baseline AS (
       |  SELECT state_fips, state, state_abbr, zipcode, county, city, last_updated,
       |         composite_key, latitude, longitude,
       |         CASE WHEN CAST(zipcode AS BIGINT) % 10 = 7 THEN NULL ELSE elevation END AS elevation,
       |         timezone, tz_region, last_updated AS last_modified
       |  FROM enriched WHERE CAST(zipcode AS BIGINT) % 3 = 0
       |)""".stripMargin

  private val oValidKeys =
    s"""valid_keys AS (
       |  SELECT composite_key FROM baseline
       |  WHERE latitude IS NOT NULL AND longitude IS NOT NULL
       |    AND elevation IS NOT NULL AND timezone IS NOT NULL
       |    AND last_modified >= DATE '${ZipEtl.freshThreshold}'
       |)""".stripMargin

  private val oExcluded =
    """excluded AS (
      |  SELECT zipcode || '_' || state_abbr AS composite_key, *
      |  FROM dedup
      |  WHERE zipcode || '_' || state_abbr NOT IN (SELECT composite_key FROM valid_keys)
      |)""".stripMargin

  /** E1: schema'd CSV ingest. */
  val csvIngest = QueryDef(
    "etl_csv_ingest",
    (s, _) => ZipEtl.ingest(s)
      .orderBy("zipcode", "state_abbr", "last_updated", "county", "city"),
    Some(s"""WITH $oIngest
             SELECT * FROM ingest
             ORDER BY zipcode, state_abbr, last_updated, county, city"""))

  /** E2: dedup by composite key, deterministic last-wins. */
  val dedupeByKey = QueryDef(
    "etl_dedupe_by_key",
    (s, _) => ZipEtl.dedupeLastWins(ZipEtl.ingest(s))
      .orderBy("zipcode", "state_abbr"),
    Some(s"""WITH $oIngest, $oDedup
             SELECT * FROM dedup ORDER BY zipcode, state_abbr"""))

  /** E3: incremental exclusion of complete+fresh records. */
  val excludeProcessed = QueryDef(
    "etl_exclude_processed",
    (s, _) => {
      val deduped = ZipEtl.dedupeLastWins(ZipEtl.ingest(s))
      ZipEtl.excludeProcessed(deduped, ZipEtl.processedBaseline(s))
        .orderBy("composite_key")
    },
    Some(s"""WITH $oIngest, $oDedup, $oEnrich, $oBaseline, $oValidKeys, $oExcluded
             SELECT * FROM excluded ORDER BY composite_key"""))

  /** E4: deterministic enrichment + broadcast tz_region dim join. */
  val enrichQ = QueryDef(
    "etl_enrich",
    (s, _) => ZipEtl.enrich(ZipEtl.dedupeLastWins(ZipEtl.ingest(s)))
      .orderBy("composite_key"),
    Some(s"""WITH $oIngest, $oDedup, $oEnrich
             SELECT * FROM enriched ORDER BY composite_key"""))

  /** E5: upsert / merge-by-key — delta (all enriched records stamped
    * with the run date) over the simulated baseline. */
  val upsertMerge = QueryDef(
    "etl_upsert_merge",
    (s, _) => {
      val base = ZipEtl.processedBaseline(s)
      val delta = ZipEtl.enrich(ZipEtl.dedupeLastWins(ZipEtl.ingest(s)))
        .withColumn("last_modified", lit(ZipEtl.runDate).cast("date"))
      ZipEtl.upsert(base, delta).orderBy("composite_key")
    },
    Some(s"""WITH $oIngest, $oDedup, $oEnrich, $oBaseline,
             delta AS (
               SELECT *, DATE '${ZipEtl.runDate}' AS last_modified FROM enriched
             ),
             merged AS (
               SELECT state_fips, state, state_abbr, zipcode, county, city,
                      last_updated, composite_key, latitude, longitude, elevation,
                      timezone, tz_region, last_modified
               FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY composite_key
                       ORDER BY last_modified DESC, src DESC) AS rn
                     FROM (SELECT *, 0 AS src FROM baseline
                           UNION ALL BY NAME
                           SELECT *, 1 AS src FROM delta))
               WHERE rn = 1
             )
             SELECT * FROM merged ORDER BY composite_key"""))

  /** E7: the composed end-to-end pipeline — post-run target table. */
  val pipelineQ = QueryDef(
    "etl_pipeline",
    (s, _) => ZipEtl.pipeline(s).orderBy("composite_key"),
    Some(s"""WITH $oIngest, $oDedup, $oEnrich, $oBaseline, $oValidKeys,
             fresh AS (
               SELECT * FROM dedup
               WHERE zipcode || '_' || state_abbr NOT IN (SELECT composite_key FROM valid_keys)
             ),
             fresh_enriched AS (
               SELECT *,
                 zipcode || '_' || state_abbr AS composite_key,
                 -90 + CAST(CAST(zipcode AS BIGINT) * 7919 % 18000 AS DOUBLE) / 100.0 AS latitude,
                 -180 + CAST(CAST(zipcode AS BIGINT) * 104729 % 36000 AS DOUBLE) / 100.0 AS longitude,
                 CAST(zipcode AS BIGINT) * 31 % 4000 AS elevation,
                 'UTC' || CASE WHEN CAST(zipcode AS BIGINT) % 25 - 12 >= 0
                     THEN '+' || CAST(CAST(zipcode AS BIGINT) % 25 - 12 AS VARCHAR)
                     ELSE CAST(CAST(zipcode AS BIGINT) % 25 - 12 AS VARCHAR) END AS timezone,
                 CASE state_fips % 4 WHEN 0 THEN 'Eastern' WHEN 1 THEN 'Central'
                                     WHEN 2 THEN 'Mountain' ELSE 'Pacific' END AS tz_region,
                 DATE '${ZipEtl.runDate}' AS last_modified
               FROM fresh
             ),
             merged AS (
               SELECT state_fips, state, state_abbr, zipcode, county, city,
                      last_updated, composite_key, latitude, longitude, elevation,
                      timezone, tz_region, last_modified
               FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY composite_key
                       ORDER BY last_modified DESC, src DESC) AS rn
                     FROM (SELECT *, 0 AS src FROM baseline
                           UNION ALL BY NAME
                           SELECT *, 1 AS src FROM fresh_enriched))
               WHERE rn = 1
             )
             SELECT * FROM merged ORDER BY composite_key"""))

  /** E6: run-condition gate scenarios. The oracle rebuilds the same
    * per-scenario ledger states as VALUES rows, re-hashes the same CSV
    * (sha256(read_text) == sha256 of the bytes for the ASCII file), and
    * applies the reference's blocking predicate verbatim — so the gate
    * logic itself is cross-checked, not just the row count. */
  val ledgerQ = QueryDef(
    "etl_ledger",
    (s, _) => Ledger.scenarios(s).orderBy("scenario"),
    Some(s"""WITH cs AS (SELECT sha256(content) AS v FROM read_text('$csv')),
             scen(scenario, force_run, expected) AS (VALUES
               ('empty_ledger', false, true),
               ('in_flight', false, false),
               ('complete_fresh', false, false),
               ('complete_fresh_force', true, true),
               ('complete_stale', false, true),
               ('error_fresh', false, false),
               ('different_checksum', false, true)),
             ledger(scenario, file_checksum, is_active, start_date, end_date) AS (VALUES
               ('in_flight', (SELECT v FROM cs), true, DATE '2026-07-20', CAST(NULL AS DATE)),
               ('complete_fresh', (SELECT v FROM cs), false, DATE '2026-07-20', DATE '2026-07-20'),
               ('complete_fresh_force', (SELECT v FROM cs), false, DATE '2026-07-20', DATE '2026-07-20'),
               ('complete_stale', (SELECT v FROM cs), false, DATE '2026-05-01', DATE '2026-05-01'),
               ('error_fresh', (SELECT v FROM cs), false, DATE '2026-07-20', DATE '2026-07-20'),
               ('different_checksum', 'deadbeef', true, DATE '2026-07-20', CAST(NULL AS DATE))),
             b AS (
               SELECT scenario, MAX(CASE WHEN file_checksum = (SELECT v FROM cs)
                        AND (is_active OR (start_date >= DATE '${ZipEtl.freshThreshold}'
                             AND end_date IS NOT NULL)) THEN 1 ELSE 0 END) AS blocked
               FROM ledger GROUP BY scenario)
             SELECT s.scenario, s.force_run,
               (s.force_run OR COALESCE(b.blocked, 0) = 0) AS should_run,
               s.expected
             FROM scen s LEFT JOIN b USING (scenario) ORDER BY s.scenario"""))

  /** E21 — upsert dry-run preview: classify every delta key against
    * the target BEFORE the merge runs — insert (new key), update
    * (payload differs), noop (byte-identical payload). The
    * change-review gate every operator wants in front of a mutating
    * merge (the reference just runs; a 100 TB warehouse wants "this
    * delta updates 3 rows" vs "this delta rewrites the table" BEFORE
    * committing). One key-equi join, null-safe payload compare
    * map-side, zero writes; the class counts come free as a groupBy
    * over the preview. */
  val upsertPreview = QueryDef(
    "etl_upsert_preview",
    (s, _) => {
      val base = ZipEtl.processedBaseline(s)
        .select(col("composite_key"), col("latitude").as("b_lat"),
          col("longitude").as("b_lon"), col("elevation").as("b_elev"),
          col("timezone").as("b_tz"), col("tz_region").as("b_tzr"),
          lit(1).as("in_base"))
      ZipEtl.enrich(ZipEtl.dedupeLastWins(ZipEtl.ingest(s)))
        .join(base, Seq("composite_key"), "left")
        .withColumn("change_class",
          when(col("in_base").isNull, lit("insert"))
            .when(col("latitude") <=> col("b_lat") &&
              col("longitude") <=> col("b_lon") &&
              col("elevation") <=> col("b_elev") &&
              col("timezone") <=> col("b_tz") &&
              col("tz_region") <=> col("b_tzr"), lit("noop"))
            .otherwise(lit("update")))
        .select(col("composite_key"), col("change_class"))
        .orderBy("composite_key")
    },
    Some(s"""WITH $oIngest, $oDedup, $oEnrich, $oBaseline
             SELECT d.composite_key,
                    CASE WHEN b.composite_key IS NULL THEN 'insert'
                         WHEN d.latitude  IS NOT DISTINCT FROM b.latitude
                          AND d.longitude IS NOT DISTINCT FROM b.longitude
                          AND d.elevation IS NOT DISTINCT FROM b.elevation
                          AND d.timezone  IS NOT DISTINCT FROM b.timezone
                          AND d.tz_region IS NOT DISTINCT FROM b.tz_region
                         THEN 'noop'
                         ELSE 'update' END AS change_class
             FROM enriched d LEFT JOIN baseline b
               ON b.composite_key = d.composite_key
             ORDER BY d.composite_key"""))

  val all: Seq[QueryDef] = Seq(
    csvIngest, dedupeByKey, excludeProcessed, enrichQ, upsertMerge,
    pipelineQ, ledgerQ, upsertPreview)
}
