package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IO21 — binary-ingest fidelity laws. */
class BinaryIngestSpec extends SparkSpec {

  private lazy val rows = BinaryIngest.ingest(spark, sf).collect()

  test("IO21: every payload round-trips bit-identically from disk") {
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("matches_source")),
      "a corrupted or truncated ingest must show as matches_source=false")
  }

  test("IO21: one file per sampled doc, byte lengths equal source char counts") {
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0)
    assert(rows.length.toLong === docs.count())
    // the synthetic corpus is pure single-byte text, so chars == bytes
    val lens = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => f"doc_${r.getLong(0)}%07d.bin" -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getAs[Long]("n_bytes") ===
      lens(r.getAs[String]("fname"))))
  }
}
