package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E4b: the rate-limited async external-enrichment operator — bounded
  * in-flight concurrency per partition, per-record retry/backoff,
  * error-as-data resilience (reference: GoogleApiService.cs:66-81
  * behind a TransformBlock with bounded parallelism,
  * DataflowProcessor.cs:216). */
class AsyncEnrichSpec extends SparkSpec {

  private def keys(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"zip_$i")).toDF("id", "zipcode")
  }

  test("E4b: concurrency stays within the in-flight bound and actually overlaps") {
    AsyncEnrich.StubTransport.resetGauges()
    val bound = 4
    // single partition: the window IS the global bound, so the gauge
    // must never exceed it; the stub's latency forces real overlap
    val out = AsyncEnrich.enriched(
      keys(120).repartition(1), "zipcode",
      new AsyncEnrich.StubTransport(simulatedLatencyMs = 3),
      maxInFlight = bound, maxAttempts = 3, backoffMs = 1)
      .collect()
    assert(out.length === 120)
    val observed = AsyncEnrich.StubTransport.maxObservedConcurrent.get()
    assert(observed <= bound,
      s"observed $observed concurrent calls, bound is $bound")
    assert(observed >= 2,
      s"expected genuine overlap, observed $observed")
  }

  test("E4b: transient failures retry with backoff, permanent failures land in the error column") {
    AsyncEnrich.StubTransport.resetGauges()
    val df = keys(400)
    val out = AsyncEnrich.enriched(df, "zipcode",
      new AsyncEnrich.StubTransport(simulatedLatencyMs = 0),
      maxInFlight = 5, maxAttempts = 3, backoffMs = 1)
    val rows = out.collect()
    assert(rows.length === 400, "no row may be dropped by failures")

    def h(key: String) = AsyncEnrich.StubTransport.keyHash(key)
    val (permanent, rest) = rows.partition(r => h(r.getAs[String]("zipcode")) % 31 == 0)
    val (transient, clean) = rest.partition(r => h(r.getAs[String]("zipcode")) % 7 == 0)
    assert(permanent.nonEmpty && transient.nonEmpty && clean.nonEmpty,
      "test corpus must exercise all three outcomes")

    permanent.foreach { r =>
      assert(r.getAs[String]("enriched") == null)
      assert(r.getAs[Int]("enrich_attempts") === 3, "must exhaust maxAttempts")
      assert(r.getAs[String]("enrich_error") != null &&
        r.getAs[String]("enrich_error").contains("permanent"))
    }
    transient.foreach { r =>
      assert(r.getAs[String]("enriched") != null, "retry must recover")
      assert(r.getAs[Int]("enrich_attempts") === 2)
      assert(r.getAs[String]("enrich_error") == null)
    }
    clean.foreach { r =>
      assert(r.getAs[String]("enriched") != null)
      assert(r.getAs[Int]("enrich_attempts") === 1)
      assert(r.getAs[String]("enrich_error") == null)
    }
  }

  test("E4b ≡ E4: an async transport computing the geocode arithmetic matches the pure-expression enrichment") {
    // the switchability contract: a user moving per-record callouts
    // (E4b) onto the expression/broadcast path (E4) — or back — gets
    // identical values. The transport below computes the same
    // arithmetic ZipEtl.enrich compiles into codegen
    // (lat = -90 + z*7919 % 18000 / 100, lng, elevation).
    val geoTransport: AsyncEnrich.Transport = (key, _) => {
      val z = key.toLong
      s"${-90 + (z * 7919L % 18000L) / 100.0}|${-180 + (z * 104729L % 36000L) / 100.0}|${z * 31L % 4000L}"
    }
    val records = ZipEtl.ingest(spark).limit(200)
    val async = AsyncEnrich.enriched(records, "zipcode", geoTransport,
      maxInFlight = 6, backoffMs = 1)
      .select(col("zipcode"),
        split(col("enriched"), "\\|").getItem(0).cast("double").as("latitude"),
        split(col("enriched"), "\\|").getItem(1).cast("double").as("longitude"),
        split(col("enriched"), "\\|").getItem(2).cast("long").as("elevation"))
    val expr = ZipEtl.enrich(records)
      .select("zipcode", "latitude", "longitude", "elevation")
    assert(async.exceptAll(expr).count() === 0 &&
      expr.exceptAll(async).count() === 0,
      "async-transport enrichment must equal the pure-expression path")
  }

  test("E4b: payloads are deterministic, order-preserving, and schema appends cleanly") {
    val df = keys(50)
    val a = AsyncEnrich.enriched(df, "zipcode",
      new AsyncEnrich.StubTransport(0), maxInFlight = 3, backoffMs = 1)
    val b = AsyncEnrich.enriched(df, "zipcode",
      new AsyncEnrich.StubTransport(0), maxInFlight = 8, backoffMs = 1)
    // same rows regardless of the concurrency knob
    assert(a.orderBy("id").collect().toSeq === b.orderBy("id").collect().toSeq)
    assert(a.schema.fieldNames.toSeq ===
      Seq("id", "zipcode", "enriched", "enrich_attempts", "enrich_error"))
    // downstream plan composes over the appended columns
    val n = a.filter(col("enrich_error").isNull)
      .groupBy(length(col("enriched")) > 0).count().collect()
    assert(n.nonEmpty)
  }
}
