package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Specs for the reference ETL surface E1-E10 (SURVEY.md §2.1),
  * mirroring the coverage of Net7EtlBus.Tests (DataflowProcessorTests,
  * CsvDataHandlerTests). */
class EtlSpec extends SparkSpec {

  test("E1: CSV ingest applies the explicit schema and keeps leading zeros") {
    val df = ZipEtl.ingest(spark)
    assert(df.schema === ZipEtl.schema)
    val ct = df.filter(col("zipcode").startsWith("0")).count()
    assert(ct > 0, "zipcodes with leading zeros must survive as strings")
  }

  test("E2: dedup is last-wins per composite key and deterministic") {
    val deduped = ZipEtl.dedupeLastWins(ZipEtl.ingest(spark)).cache()
    val dupKeys = deduped.groupBy("zipcode", "state_abbr").count()
      .filter(col("count") > 1).count()
    assert(dupKeys === 0, "no composite key may survive twice")
    // last-wins: every surviving row carries its key's max last_updated
    val maxDates = ZipEtl.ingest(spark)
      .groupBy("zipcode", "state_abbr")
      .agg(max("last_updated").as("max_lu"))
    val wrong = deduped.join(maxDates, Seq("zipcode", "state_abbr"))
      .filter(col("last_updated") =!= col("max_lu")).count()
    assert(wrong === 0, "a surviving row must be its key's most recent")
    deduped.unpersist()
  }

  test("E3: exclusion drops exactly the complete+fresh baseline keys") {
    val deduped = ZipEtl.dedupeLastWins(ZipEtl.ingest(spark))
    val baseline = ZipEtl.processedBaseline(spark)
    val out = ZipEtl.excludeProcessed(deduped, baseline)
    val validKeys = baseline.filter(
      col("elevation").isNotNull &&
        col("last_modified") >= lit(ZipEtl.freshThreshold).cast("date"))
      .select("composite_key")
    val nValid = validKeys.count()
    assert(nValid > 0, "test data must exercise the exclusion branch")
    assert(out.count() === deduped.count() - nValid)
    assert(out.join(validKeys, Seq("composite_key"), "left_semi").count() === 0)
  }

  test("E4: enrichment is pure, complete, and join-free of data loss") {
    val deduped = ZipEtl.dedupeLastWins(ZipEtl.ingest(spark))
    val enriched = ZipEtl.enrich(deduped).cache()
    assert(enriched.count() === deduped.count(), "broadcast dim join must not drop rows")
    val bad = enriched.filter(
      col("latitude") < -90 || col("latitude") > 90 ||
        col("longitude") < -180 || col("longitude") > 180 ||
        col("elevation").isNull || col("timezone").isNull || col("tz_region").isNull)
    assert(bad.count() === 0)
    enriched.unpersist()
  }

  test("E5: upsert keeps delta on conflict and base rows otherwise") {
    val base = ZipEtl.processedBaseline(spark)
    val delta = ZipEtl.enrich(ZipEtl.dedupeLastWins(ZipEtl.ingest(spark)))
      .withColumn("last_modified", lit(ZipEtl.runDate).cast("date"))
    val merged = ZipEtl.upsert(base, delta).cache()
    // every delta key must carry the run date (delta wins on conflict)
    val staleDeltaKeys = merged
      .join(delta.select("composite_key"), Seq("composite_key"), "left_semi")
      .filter(col("last_modified") =!= lit(ZipEtl.runDate).cast("date")).count()
    assert(staleDeltaKeys === 0)
    assert(merged.groupBy("composite_key").count().filter(col("count") > 1).count() === 0)
    merged.unpersist()
  }

  test("E6: run-condition gate matches the reference predicate in every scenario") {
    val rows = Ledger.scenarios(spark).collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("should_run") === r.getAs[Boolean]("expected"),
        s"scenario ${r.getAs[String]("scenario")}")
    }
  }

  test("E6: shouldRun (the production gate method) matches every scenario outcome") {
    val checksum = Ledger.fileChecksum(ZipEtl.csvPath)
    def one(id: Long, status: String, startD: String, endD: Option[String]) = {
      val l = Ledger.start(spark, Ledger.empty(spark), id, "f.csv", checksum, startD)
      endD.map(e => Ledger.finish(l, id, status, e)).getOrElse(l)
    }
    val fresh = "2026-07-20"; val stale = "2026-05-01"
    val cases = Seq(
      (Ledger.empty(spark), false, true),
      (one(1, Ledger.StatusRunning, fresh, None), false, false),
      (one(2, Ledger.StatusComplete, fresh, Some(fresh)), false, false),
      (one(3, Ledger.StatusComplete, fresh, Some(fresh)), true, true),
      (one(4, Ledger.StatusComplete, stale, Some(stale)), false, true),
      (one(5, Ledger.StatusError, fresh, Some(fresh)), false, false),
      (Ledger.start(spark, Ledger.empty(spark), 6, "o.csv", "deadbeef", fresh), false, true))
    cases.zipWithIndex.foreach { case ((ledger, force, expected), i) =>
      assert(Ledger.shouldRun(ledger, checksum, ZipEtl.runDate, ZipEtl.ttlDays, force)
        === expected, s"case $i")
    }
  }

  test("E6: checksum is the stable SHA-256 of the input file") {
    val c1 = Ledger.fileChecksum(ZipEtl.csvPath)
    val c2 = Ledger.fileChecksum(ZipEtl.csvPath)
    assert(c1 === c2)
    assert(c1.matches("[0-9a-f]{64}"))
  }

  test("E10: ledger status transitions Running→Complete and Running→Error stamp end_date") {
    val l0 = Ledger.start(spark, Ledger.empty(spark), 1L, "f.csv", "abc", "2026-08-01")
    val completed = Ledger.finish(l0, 1L, Ledger.StatusComplete, "2026-08-02")
    val row = completed.collect().head
    assert(row.getAs[String]("status") === "Complete")
    assert(!row.getAs[Boolean]("is_active"))
    assert(row.getAs[java.sql.Date]("end_date").toString === "2026-08-02")
    val errored = Ledger.finish(l0, 1L, Ledger.StatusError, "2026-08-02")
    assert(errored.collect().head.getAs[String]("status") === "Error")
    // untouched rows keep their state
    val l2 = Ledger.start(spark, l0, 2L, "g.csv", "def", "2026-08-01")
    val partial = Ledger.finish(l2, 2L, Ledger.StatusComplete, "2026-08-03")
    val still = partial.filter(col("import_id") === 1L).collect().head
    assert(still.getAs[String]("status") === "Running" && still.getAs[Boolean]("is_active"))
  }

  test("E9/IO4: partitioned sink writes prunable layout and round-trips") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val df = ZipEtl.enrich(ZipEtl.dedupeLastWins(ZipEtl.ingest(spark)))
      .withColumn("last_modified", lit(ZipEtl.runDate).cast("date"))
    Sink.writePartitioned(df, s"$dir/out", Seq("state_abbr"), maxRecordsPerFile = 500)
    val partDirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("state_abbr="))
    assert(partDirs.length === 50, "one directory per state")
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() === df.count())
    // partition pruning: a state filter must scan a single directory
    val pruned = back.filter(col("state_abbr") === "CA")
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).headOption
    assert(pruned.count() === df.filter(col("state_abbr") === "CA").count())
  }
}
