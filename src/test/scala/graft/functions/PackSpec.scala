package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Specs for training-sequence packing (D16). */
class PackSpec extends SparkSpec {

  private lazy val toks = Tables.documents(spark, sf)
    .select(col("doc_id"), Text.whitespaceTokenCount(col("text")).as("ws_tokens"))
    .cache()

  test("offsets are exact per-shard prefix sums and seq_ids chunk them by budget") {
    val budget = 100
    val packed = Pack.packSequences(toks, col("doc_id"), col("ws_tokens"), budget)
      .collect()
      .map(r => (r.getAs[String]("shard"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("ws_tokens").toLong, r.getAs[Long]("offset"),
        r.getAs[Long]("seq_id")))
    assert(packed.length === toks.count())
    packed.groupBy(_._1).foreach { case (_, rows) =>
      var expected = 0L
      rows.sortBy(_._2).foreach { case (_, _, t, offset, seqId) =>
        assert(offset === expected, "offset must be the running prefix sum")
        assert(seqId === offset / budget)
        expected += t
      }
    }
  }

  test("packing is invariant to input partitioning") {
    val a = Pack.packSequences(toks, col("doc_id"), col("ws_tokens"), 512)
    val b = Pack.packSequences(toks.repartition(7), col("doc_id"), col("ws_tokens"), 512)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }
}
