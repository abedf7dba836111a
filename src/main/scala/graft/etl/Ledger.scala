package graft.etl

import java.security.MessageDigest
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** E6/E10: run-condition gate + import ledger + SHA-256 checksum,
  * re-expressing the reference's `EvaluateEtlRunConditionsAsync`
  * (`DataflowProcessor.cs:51-115`) and terminal-state bookkeeping
  * (`SetImportRecordCompleteAsync`, `DataflowProcessor.cs:286-303`).
  *
  * The ledger is a tiny parquet table (one row per import attempt);
  * every operation here touches O(ledger) rows, never the data itself —
  * the reference's equivalent is a single-row DB query. Status values
  * mirror `Constants.ProcessingStatus` (None/Running/Error/Complete).
  */
object Ledger {

  val StatusRunning = "Running"
  val StatusComplete = "Complete"
  val StatusError = "Error"

  val schema = StructType(Seq(
    StructField("import_id", LongType),
    StructField("file_name", StringType),
    StructField("file_checksum", StringType),
    StructField("status", StringType),
    StructField("is_active", BooleanType),
    StructField("start_date", DateType),
    StructField("end_date", DateType)))

  /** SHA-256 of a file, lowercase hex (reference:
    * `Utilities/FileSystem.cs:16-24`). Driver-side: the gate hashes ONE
    * input manifest/file, not the dataset. */
  def fileChecksum(path: String): String = {
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(Files.readAllBytes(Paths.get(path)))
    digest.map("%02x".format(_)).mkString
  }

  def empty(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)

  def load(s: SparkSession, path: String): DataFrame =
    if (Files.exists(Paths.get(path))) s.read.parquet(path) else empty(s)

  /** Gate: skip when a ledger row with the same checksum is in-flight,
    * or finished (end_date set — the reference counts Error terminals
    * too, `DataflowProcessor.cs:90`) within the TTL window; forceRun
    * overrides. Faithful to the reference's predicate. */
  def shouldRun(ledger: DataFrame, checksum: String, runDate: String,
      ttlDays: Int, forceRun: Boolean): Boolean = {
    if (forceRun) return true
    val blocked = ledger.filter(
      col("file_checksum") === checksum &&
        (col("is_active") ||
          (col("start_date") >= date_sub(lit(runDate).cast("date"), ttlDays) &&
            col("end_date").isNotNull)))
      .limit(1).count() > 0
    !blocked
  }

  /** Append a Running row for a new import attempt. */
  def start(s: SparkSession, ledger: DataFrame, importId: Long,
      fileName: String, checksum: String, runDate: String): DataFrame = {
    val row = s.createDataFrame(
      java.util.List.of(Row(importId, fileName, checksum, StatusRunning,
        true, java.sql.Date.valueOf(runDate), null)), schema)
    ledger.unionByName(row)
  }

  /** E10: terminal transition Running → Complete|Error — stamps
    * end_date, clears is_active (reference:
    * `SetImportRecordCompleteAsync`). */
  def finish(ledger: DataFrame, importId: Long, terminalStatus: String,
      endDate: String): DataFrame = {
    val hit = col("import_id") === importId
    ledger
      .withColumn("status", when(hit, lit(terminalStatus)).otherwise(col("status")))
      .withColumn("is_active", when(hit, lit(false)).otherwise(col("is_active")))
      .withColumn("end_date",
        when(hit, lit(endDate).cast("date")).otherwise(col("end_date")))
  }

  /** Deterministic gate scenario table for the rows-only `etl_ledger`
    * coverage entry: each row is one gate decision over a synthetic
    * ledger state, using the real checksum of the checked-in CSV. All
    * scenarios evaluate in ONE job — the per-scenario ledgers are
    * tagged and unioned, and the blocking predicate aggregates per
    * tag — rather than a count() round-trip per scenario. The
    * ScalaTest spec asserts each expectation; the driver gate checks
    * rows>0 + schema stability. */
  def scenarios(s: SparkSession): DataFrame = {
    import s.implicits._
    val checksum = fileChecksum(ZipEtl.csvPath)
    val run = ZipEtl.runDate
    val fresh = "2026-07-20"  // within TTL of runDate
    val stale = "2026-05-01"  // outside TTL

    def one(id: Long, status: String, startD: String,
        endD: Option[String]): DataFrame = {
      val l = start(s, empty(s), id, "zipcodes.csv", checksum, startD)
      endD.map(e => finish(l, id, status, e)).getOrElse(l)
    }

    // (name, ledger, forceRun, expected shouldRun)
    val cases = Seq(
      ("empty_ledger", empty(s), false, true),
      ("in_flight", one(1, StatusRunning, fresh, None), false, false),
      ("complete_fresh", one(2, StatusComplete, fresh, Some(fresh)), false, false),
      ("complete_fresh_force", one(3, StatusComplete, fresh, Some(fresh)), true, true),
      ("complete_stale", one(4, StatusComplete, stale, Some(stale)), false, true),
      ("error_fresh", one(5, StatusError, fresh, Some(fresh)), false, false),
      ("different_checksum",
        start(s, empty(s), 6, "other.csv", "deadbeef", fresh), false, true))

    val tagged = cases.map { case (name, ledger, _, _) =>
      ledger.withColumn("scenario", lit(name))
    }.reduce(_ unionByName _)
    // the reference's blocking predicate (DataflowProcessor.cs:90),
    // evaluated per scenario tag in one aggregation
    val blockedCol = max(when(
      col("file_checksum") === checksum &&
        (col("is_active") ||
          (col("start_date") >= date_sub(lit(run).cast("date"), ZipEtl.ttlDays) &&
            col("end_date").isNotNull)), 1).otherwise(0))
    val blocked = tagged.groupBy("scenario").agg(blockedCol.as("blocked"))
      .collect().map(r => r.getAs[String]("scenario") -> (r.getAs[Int]("blocked") == 1))
      .toMap
    cases.map { case (name, _, force, expected) =>
      (name, force, force || !blocked.getOrElse(name, false), expected)
    }.toDF("scenario", "force_run", "should_run", "expected")
  }
}
