package graft.etl

import graft.SparkSpec

/** E44 — config-driven assembly: spec-resolved plans equal the
  * directly-composed ones; bad configs fail before any job runs. */
class PipelineConfigSpec extends SparkSpec {

  private val full =
    s"""{"input": "${ZipEtl.csvPath}",
        "stages": ["ingest", "dedupe", "enrich",
                   "exclude_processed", "upsert"]}"""

  test("E44: the full spec resolves to exactly the E7 pipeline") {
    val viaConfig = PipelineConfig.runJson(spark, full)
    val direct = ZipEtl.pipeline(spark)
    assert(viaConfig.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(viaConfig).count() === 0)
    assert(viaConfig.count() > 0)
  }

  test("E44: a prefix spec runs the pipeline to the configured depth") {
    val dedupeOnly = PipelineConfig.runJson(spark,
      s"""{"input": "${ZipEtl.csvPath}", "stages": ["ingest", "dedupe"]}""")
    val direct = ZipEtl.dedupeLastWins(ZipEtl.ingest(spark))
    assert(dedupeOnly.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(dedupeOnly).count() === 0)
  }

  test("E44: malformed or out-of-order configs fail loudly at parse time") {
    intercept[IllegalArgumentException] {
      PipelineConfig.parse("""{"input": "x", "stages": ["ingest", "frobnicate"]}""")
    }
    intercept[IllegalArgumentException] {
      PipelineConfig.parse("""{"input": "x", "stages": ["dedupe", "ingest"]}""")
    }
    intercept[IllegalArgumentException] {
      PipelineConfig.parse("""{"input": "x", "stages": ["ingest", "enrich"]}""")
    }
    intercept[IllegalArgumentException] {
      PipelineConfig.parse("""{"input": "", "stages": ["ingest"]}""")
    }
    intercept[IllegalArgumentException] {
      PipelineConfig.parse("""not json at all""")
    }
  }
}
