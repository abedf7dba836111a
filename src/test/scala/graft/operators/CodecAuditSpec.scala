package graft.operators

import graft.SparkSpec

/** IO18 — the codec-audit guarantees behind the rows-only entry. */
class CodecAuditSpec extends SparkSpec {

  test("IO18: codecs change bytes, not rows — and compression actually compresses") {
    val rows = CodecAudit.ioCodecAudit.fn(spark, sf).collect()
      .map(r => r.getAs[String]("codec") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("bytes"),
          r.getAs[Long]("ratio_ppm"))).toMap
    assert(rows.keySet === CodecAudit.Codecs.toSet)
    // identical logical content under every codec
    assert(rows.values.map(_._1).toSet.size === 1,
      "row counts must agree across codecs")
    assert(rows.values.forall(_._2 > 0))
    val none = rows("none")._2
    assert(rows("snappy")._2 < none, "snappy must beat uncompressed")
    assert(rows("zstd")._2 < rows("snappy")._2,
      "zstd should out-compress snappy on this data")
    assert(rows("none")._3 === 1000000L, "the baseline ratio is exactly 1")
  }
}
