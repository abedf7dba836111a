package graft

import java.nio.file.Files
import graft.streaming.EventOps
import org.apache.spark.sql.functions._

/** Source/sink format depth beyond the §2.5 checklist: schema'd
  * JSON-lines and ORC round-trips must preserve the operators'
  * results exactly — a user switching storage formats keeps identical
  * semantics. */
class IoSpec extends SparkSpec {

  test("JSON-lines round-trip preserves event aggregation results") {
    val dir = Files.createTempDirectory("graft_io").toString
    val events = Tables.events(spark, sf)
    events.write.mode("overwrite").json(s"$dir/events_json")
    // explicit schema — no inference pass over the data at scale
    val back = spark.read.schema(events.schema).json(s"$dir/events_json")
    assert(back.count() === events.count())
    val a = EventOps.tumblingHourly(events).orderBy("window_start", "event_type").collect()
    val b = EventOps.tumblingHourly(back).orderBy("window_start", "event_type").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("IO10: mergeSchema parquet read unions evolved file schemas; old files read NULL") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString + "/docs"
    // v1 writer: two columns; later the pipeline grows a lang column —
    // the layout a long-lived dataset accumulates across code versions
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    Seq((3L, "gamma", "en"), (4L, "delta", "fr")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(dir)
    // default read may pick either file's schema; mergeSchema must union
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.sorted.toSeq === Seq("doc_id", "lang", "text"))
    val rows = merged.orderBy("doc_id").collect()
    assert(rows.length === 4)
    assert(rows.take(2).forall(_.isNullAt(rows.head.fieldIndex("lang"))),
      "pre-evolution files must surface NULL for the added column")
    assert(rows(2).getAs[String]("lang") === "en")
    // operators compose over the merged view exactly as over a uniform one
    val counts = merged.groupBy(coalesce(col("lang"), lit("unknown")).as("lang"))
      .count().orderBy("lang").collect()
    assert(counts.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("en", 1L), ("fr", 1L), ("unknown", 2L)))
  }

  test("IVF index written partitionBy(cell) prunes the probe scan to probed cells") {
    import graft.similarity.Ivf
    val dir = Files.createTempDirectory("graft_ivf_idx").toString + "/index"
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val codebook = Ivf.writeIndex(emb, dir, cells = 16, cacheKey = sf)
    val fromIndex = Ivf.topKFromIndex(spark, dir, codebook, queries, 10)
    // the scan must read ONLY the probed cell directories — that is the
    // point of the partitioned layout at 100 TB (inspect BEFORE cache:
    // caching substitutes an InMemoryTableScan for the file scan)
    val scan = fromIndex.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.output.exists(_.name == "cell") => f
    }.head
    val read = scan.selectedPartitions.partitionCount
    assert(read > 0 && read < 16,
      s"probe must prune partitions: read $read of 16 cells")
    // parity with the in-memory IVF path on the same (memoized) codebook
    // — cells pinned to the written index's (topK's cells=0 default is
    // the √N auto shape, 23 cells at this corpus ≠ the 16 on disk)
    val direct = Ivf.topK(emb, queries, 10, cells = 16, cacheKey = sf)
    assert(fromIndex.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(fromIndex).count() === 0)
  }

  test("ORC round-trip preserves relational results and predicate pushdown") {
    val dir = Files.createTempDirectory("graft_io").toString
    val li = Tables.lineitem(spark, sf)
    li.write.mode("overwrite").orc(s"$dir/lineitem_orc")
    val back = spark.read.orc(s"$dir/lineitem_orc")
    assert(back.count() === li.count())
    val filtered = back.filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), "ORC scan must receive pushed filters")
    assert(filtered.count() === li.filter(col("l_returnflag") === "R").count())
  }

  test("IO24: Avro round-trip preserves relational results; reader-schema " +
      "evolution fills added fields from defaults") {
    val dir = Files.createTempDirectory("graft_avro").toString
    // round-trip the fact table through the remaining standard lake
    // format. This Spark build bundles the avro FileFormat
    // implementation inside spark-sql (probed r10 — serializer,
    // deserializer, SchemaConverters all present) but NOT the
    // spark-avro module's DefaultSource/service registration, so the
    // short name "avro" does not resolve; the fully-qualified
    // FileFormat class is the documented alternative spelling.
    val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag",
        "l_extendedprice")
    li.write.mode("overwrite").format(AvroFormat).save(s"$dir/lineitem_avro")
    val back = spark.read.format(AvroFormat).load(s"$dir/lineitem_avro")
    assert(back.count() === li.count())
    assert(back.schema === li.schema,
      "Avro round-trip must preserve the Spark schema exactly")
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("l_returnflag")
        .agg(sum("l_quantity").as("q"), sum("l_extendedprice").as("p"))
        .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    assert(agg(back) === agg(li))
    // schema evolution, the Avro way: a READER schema with an added
    // field carrying a default — old files surface the default, no
    // rewrite. (Avro has no parquet-style mergeSchema; the reader
    // schema IS the evolution contract.)
    import spark.implicits._
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("overwrite").format(AvroFormat).save(s"$dir/docs_v1")
    val evolved = """{"type":"record","name":"topLevelRecord","fields":[
      {"name":"doc_id","type":["long","null"]},
      {"name":"text","type":["string","null"]},
      {"name":"lang","type":["null","string"],"default":null}]}"""
    val withLang = spark.read.format(AvroFormat)
      .option("avroSchema", evolved).load(s"$dir/docs_v1")
    assert(withLang.schema.fieldNames.toSeq === Seq("doc_id", "text", "lang"))
    val rows = withLang.orderBy("doc_id").collect()
    assert(rows.length === 2)
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("lang"))),
      "pre-evolution Avro files must surface the reader-schema default")
    assert(rows.map(_.getAs[String]("text")).toSeq === Seq("alpha", "beta"))
  }

  test("IO11: corrupt JSON records are quarantined as data, not crashes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_corrupt").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "good row"}""",
      """{"doc_id": 2, "text": "also good"}""",
      """{"doc_id": 3, "text": "truncated""", // broken mid-string
      """not json at all""",
      """{"doc_id": "not-a-number", "text": "type clash"}""")
    Files.write(java.nio.file.Paths.get(s"$dir/docs.jsonl"),
      lines.mkString("\n").getBytes)
    // 100 TB ingest contract: bad upstream bytes become rows in an
    // error column (the E4b/ledger error-as-data convention), the scan
    // NEVER throws mid-job. PERMISSIVE + explicit schema — no
    // inference pass, no corrupt-record crash.
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, _corrupt_record STRING")
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$dir/docs.jsonl")
      .cache() // required: corrupt-record column + raw-file re-parse
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() === 2)
    assert(bad.count() === 3)
    // quarantined rows keep the raw bytes for replay/debugging
    assert(bad.select("_corrupt_record").as[String].collect()
      .forall(_.nonEmpty))
    // the type-clash row is corrupt (doc_id unparseable), not silently
    // coerced
    assert(good.select("doc_id").as[Long].collect().sorted === Array(1L, 2L))
    df.unpersist()
  }

  test("IO12: small-file compaction hits the target file count and keeps data + clustering") {
    val dir = Files.createTempDirectory("graft_compact").toString
    val li = Tables.lineitem(spark, sf)
    // simulate a streaming sink's small-file problem: 64 splinter files
    li.repartition(64).write.mode("overwrite").parquet(s"$dir/splintered")
    val splintered = spark.read.parquet(s"$dir/splintered")
    def dataFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(dataFiles(s"$dir/splintered") === 64)
    // compact: range-partition on the query key so each output file owns
    // a contiguous key range (min/max stats stay tight), sort within
    val target = 4
    splintered
      .repartitionByRange(target, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/compacted")
    assert(dataFiles(s"$dir/compacted") === target)
    val back = spark.read.parquet(s"$dir/compacted")
    // bit-identical content
    assert(back.exceptAll(li).count() === 0 && li.exceptAll(back).count() === 0)
    // clustering materialized: a key-range filter prunes most row groups —
    // each file's l_orderkey span must be disjoint from its neighbors'
    val spans = back.groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .orderBy("lo").collect()
    assert(spans.length === target)
    spans.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
          "compacted files must own disjoint key ranges")
      case _ =>
    }
  }

  test("IO13: dynamic partition overwrite rewrites only touched partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dpo").toString + "/t"
    def rows(y: Int, tag: String) =
      (0 until 5).map(i => (y * 100L + i, tag, y)).toSeq
    (rows(1995, "v1") ++ rows(1996, "v1") ++ rows(1997, "v1"))
      .toDF("id", "tag", "year")
      .write.partitionBy("year").mode("overwrite").parquet(dir)
    // dynamic mode: an overwrite carrying ONLY year=1996 must replace
    // that partition and leave 1995/1997 untouched — the maintained-
    // warehouse incremental rewrite (a daily re-run overwrites its day,
    // not the table)
    rows(1996, "v2").toDF("id", "tag", "year")
      .write.partitionBy("year").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(dir)
    val afterDynamic = spark.read.parquet(dir)
    assert(afterDynamic.count() === 15)
    assert(afterDynamic.filter(col("year") === 1996)
      .select("tag").distinct().collect().map(_.getString(0)).toSeq === Seq("v2"))
    assert(afterDynamic.filter(col("year") =!= 1996)
      .select("tag").distinct().collect().map(_.getString(0)).toSeq === Seq("v1"),
      "untouched partitions must keep their files")
    // static mode (the default) truncates the WHOLE table first — the
    // contrast that makes dynamic mode load-bearing
    rows(1996, "v3").toDF("id", "tag", "year")
      .write.partitionBy("year").mode("overwrite").parquet(dir)
    val afterStatic = spark.read.parquet(dir)
    assert(afterStatic.count() === 5)
    assert(afterStatic.select("year").distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(1996))
  }
}
