package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-first re-expression of the reference ETL pipeline
  * (SURVEY.md §2.1): schema'd CSV ingest → last-wins dedup by composite
  * key → exclusion of already-processed records → deterministic
  * enrichment → upsert-by-key. The reference drives this row-at-a-time
  * through hand-built dataflow blocks (buffer → transform → action,
  * `DataflowProcessor.cs:160-270`); here the whole pipeline is ONE lazy
  * DataFrame plan — parallelism, batching and back-pressure come from
  * partitioning, and the only wide operations are the two keyed window
  * shuffles (dedup, upsert) plus one broadcast dim join.
  *
  * Scale notes (100 TB): every step is linear and shuffle-minimal; no
  * step collects to the driver; enrichment is pure codegen'd column
  * arithmetic (an external per-row HTTP geocode call, as the reference
  * does in `GoogleApiService.cs:71-78`, is the wrong design at scale —
  * real deployments broadcast-join a geocode dimension, which the
  * tz_region join demonstrates).
  */
object ZipEtl {

  /** Checked-in deterministic replica of the reference's zip-code CSV
    * (`SampleData/geo_data.csv` shape, see tools/gen_zipcodes.py). */
  val csvPath = "/root/repo/data/zipcodes.csv"

  /** Logical run date: the reference stamps wall-clock `DateTime.UtcNow`
    * (`DataflowProcessor.cs:218-219`); a fixed logical date keeps every
    * run — and the oracle — reproducible. */
  val runDate = "2026-08-01"
  val ttlDays = 30
  /** runDate − ttlDays, precomputed so Spark and the oracle share one
    * literal (no cross-engine date arithmetic to disagree on). */
  val freshThreshold = "2026-07-02"

  /** E1: schema'd CSV ingest (reference: `CsvDataHandler.cs:16-24` with
    * CsvHelper attribute mapping, `Models/ZipCodeRecord.cs`). Explicit
    * schema — no sampling-based inference pass over 100 TB of input —
    * and zipcode stays a string (leading zeros). */
  val schema = StructType(Seq(
    StructField("state_fips", IntegerType),
    StructField("state", StringType),
    StructField("state_abbr", StringType),
    StructField("zipcode", StringType),
    StructField("county", StringType),
    StructField("city", StringType),
    StructField("last_updated", DateType)))

  def ingest(s: SparkSession, path: String = csvPath): DataFrame =
    s.read.schema(schema).option("header", "true").csv(path)

  /** Composite key `zipcode_statecode` (reference:
    * `ZipCodeHelpers.cs:12-15` — zips cross state borders). */
  private def compositeKey = concat(col("zipcode"), lit("_"), col("state_abbr"))

  /** E2: dedup by composite key, deterministic last-wins. The reference
    * relies on dictionary-build order = file order
    * (`ServiceBusWorker.cs:110`); file order is undefined for a
    * distributed multi-split read, so recency is an explicit
    * last_updated column with a full-attribute tiebreak. Single keyed
    * shuffle (window row_number), no driver-side map. */
  def dedupeLastWins(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("zipcode"), col("state_abbr"))
      .orderBy(col("last_updated").desc, col("state_fips").desc,
        col("county").desc, col("city").desc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** E4: enrichment — deterministic pure-column stub of the reference's
    * geocode/elevation/timezone lookups (`GoogleApiService.cs:71-78`),
    * plus a broadcast-join lookup variant (tz_region from a dim derived
    * off the distinct states — the pattern a real geocode dim uses).
    * All arithmetic is integer-exact (long, mod) so Spark and the
    * oracle agree bit-for-bit. */
  def enrich(df: DataFrame): DataFrame = {
    val z = col("zipcode").cast("long")
    val tzOff = (z % 25) - 12
    val enriched = df
      .withColumn("composite_key", compositeKey)
      .withColumn("latitude", lit(-90) + (z * 7919L % 18000L) / 100.0)
      .withColumn("longitude", lit(-180) + (z * 104729L % 36000L) / 100.0)
      .withColumn("elevation", z * 31L % 4000L)
      .withColumn("timezone",
        concat(lit("UTC"), when(tzOff >= 0, concat(lit("+"), tzOff.cast("string")))
          .otherwise(tzOff.cast("string"))))
    // dim keyed on the FULL (state_abbr, state_fips) pair: joining on
    // abbr alone would silently duplicate rows if an input ever mapped
    // one abbr to two fips values (the oracle computes tz_region from
    // the row's own fips, so the join must be keyed the same way)
    val tzDim = df.select(col("state_abbr").as("d_state_abbr"),
      col("state_fips").as("d_state_fips"))
      .distinct()
      .withColumn("tz_region",
        element_at(array(lit("Eastern"), lit("Central"), lit("Mountain"), lit("Pacific")),
          (col("d_state_fips") % 4 + 1).cast("int")))
    enriched.join(broadcast(tzDim),
      col("state_abbr") === col("d_state_abbr") &&
        col("state_fips") === col("d_state_fips"))
      .drop("d_state_abbr", "d_state_fips")
  }

  /** Simulated target-DB baseline: the subset of enriched records
    * "already imported" (zip divisible by 3), with elevation nulled for
    * zip%10==7 rows so the completeness predicate of E3 has work, and
    * last_modified carried from last_updated so the TTL predicate has
    * both fresh and stale rows. */
  def processedBaseline(s: SparkSession, path: String = csvPath): DataFrame = {
    val z = col("zipcode").cast("long")
    enrich(dedupeLastWins(ingest(s, path)))
      .filter(z % 3 === 0)
      .withColumn("elevation", when(z % 10 === 7, lit(null).cast("long"))
        .otherwise(col("elevation")))
      .withColumn("last_modified", col("last_updated"))
  }

  /** E3: incremental exclusion — drop records whose target-DB row is
    * complete (all enrichment fields non-null) and fresh within the TTL
    * (reference: `DataflowProcessor.cs:117-152`). Pure left-anti join
    * on the composite key: one shuffle, no driver-side HashSet. */
  def excludeProcessed(records: DataFrame, baseline: DataFrame): DataFrame = {
    val validKeys = baseline
      .filter(col("latitude").isNotNull && col("longitude").isNotNull &&
        col("elevation").isNotNull && col("timezone").isNotNull &&
        col("last_modified") >= lit(freshThreshold).cast("date"))
      .select(col("composite_key").as("processed_key"))
    records.withColumn("composite_key", compositeKey)
      .join(validKeys, col("composite_key") === col("processed_key"), "left_anti")
      .drop("processed_key")
  }

  /** E5: upsert / merge-by-key (reference: BulkInsertOrUpdateAsync,
    * `DataflowProcessor.cs:222-247`): union(base, delta) → last-wins
    * window keyed on composite_key, delta preferred on ties. One keyed
    * shuffle; output overwrites the base atomically at the sink. */
  def upsert(base: DataFrame, delta: DataFrame): DataFrame = {
    val cols = base.columns.toIndexedSeq.map(col)
    val tagged = base.withColumn("src", lit(0))
      .unionByName(delta.withColumn("src", lit(1)))
    val w = Window.partitionBy(col("composite_key"))
      .orderBy(col("last_modified").desc, col("src").desc)
    tagged.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(cols: _*)
  }

  /** E7: the composed end-to-end batch pipeline (reference flow:
    * `ServiceBusWorker.cs:96-141`, steps 2-4) — one lazy plan from CSV
    * to the post-run state of the target table. */
  def pipeline(s: SparkSession, path: String = csvPath): DataFrame = {
    // deduped feeds both the baseline branch and the fresh branch;
    // cache it so the CSV parse + dedup window run once (at deployment
    // scale the baseline is a real table, not a derived branch).
    val deduped = dedupeLastWins(ingest(s, path)).cache()
    val z = col("zipcode").cast("long")
    val baseline = enrich(deduped)
      .filter(z % 3 === 0)
      .withColumn("elevation", when(z % 10 === 7, lit(null).cast("long"))
        .otherwise(col("elevation")))
      .withColumn("last_modified", col("last_updated"))
    val fresh = excludeProcessed(deduped, baseline)
    val delta = enrich(fresh.drop("composite_key"))
      .withColumn("last_modified", lit(runDate).cast("date"))
    upsert(baseline, delta)
  }
}
