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
    val direct = Ivf.topK(emb, queries, 10, cacheKey = sf)
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
}
