package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** S22 — streaming ingest dedup against the stored band index:
  * cross-batch duplicates quarantine, clean docs append, and the
  * index grows per batch so later batches dedupe against earlier
  * ones without a rebuild. */
class DedupStreamSpec extends SparkSpec {

  test("S22: duplicates of seed AND of earlier batches quarantine; index grows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_dedup_stream").toString
    val (idx, clean, dup, ckpt) =
      (s"$base/idx", s"$base/clean", s"$base/dup", s"$base/ckpt")

    // seed corpus → stored index
    val seed = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    graft.dedup.Dedup.writeBandIndex(seed, idx)

    val stream = MemoryStream[(Long, String)]
    def feed = stream.toDF().toDF("doc_id", "text")

    // wave 1: a verbatim copy of seed doc 1 + a novel doc
    stream.addData(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "red orange yellow green blue indigo violet ultraviolet"))
    DedupStream.attach(feed, idx, clean, dup, ckpt).awaitTermination()

    val dup1 = spark.read.parquet(dup).collect()
    assert(dup1.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((100L, 1L)),
      "the seed copy must quarantine against its original")
    val clean1 = spark.read.parquet(clean).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(clean1 === Set(101L))

    // wave 2: a copy of the WAVE-1 novel doc (not in the seed index) +
    // another novel doc — proves the index grew with batch 1
    stream.addData(
      (200L, "red orange yellow green blue indigo violet ultraviolet"),
      (201L, "solo unique text with completely different words here"))
    DedupStream.attach(feed, idx, clean, dup, ckpt).awaitTermination()

    val dup2 = spark.read.parquet(dup).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dup2 === Set((100L, 1L), (200L, 101L)),
      s"wave-2 copy must hit the grown index: $dup2")
    val clean2 = spark.read.parquet(clean).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(clean2 === Set(101L, 201L))
  }
}
