package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** IO18 — compression-codec audit: the same data written under
  * snappy, zstd and uncompressed parquet, with measured bytes and the
  * compression ratio emitted as data — the storage-bill decision
  * ("zstd costs CPU, buys how much?") quantified on YOUR data rather
  * than asserted from folklore. At 100 TB the codec choice is worth
  * petabytes; the audit is one slice write per codec, file sizes from
  * a driver-side metadata walk (O(files), no data read-back), and a
  * content-parity check that the codec changed BYTES, not rows.
  * SELF-VERIFYING rows-only (byte sizes are engine/version-specific —
  * no SQL oracle): row counts per codec ride beside the sizes and
  * must all agree; the spec additionally proves read-back parity and
  * the zstd ≤ snappy ≤ none ordering on this data. */
object CodecAudit {

  val Codecs = Seq("none", "snappy", "zstd")

  private def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(path))
  }

  val ioCodecAudit = QueryDef(
    "io_codec_audit",
    (s, d) => {
      val slice = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 10 === 0)
      val base = "/tmp/graft_warehouse/codec_audit_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
        ProcessHandle.current().pid()
      val rows = Codecs.map { c =>
        val path = s"$base/$c"
        slice.write.mode("overwrite").option("compression", c)
          .parquet(path)
        val n = s.read.parquet(path).count()
        (c, n, dirBytes(path))
      }
      import s.implicits._
      val df = rows.toDF("codec", "n_rows", "bytes")
      val none = rows.find(_._1 == "none").get._3
      df.withColumn("ratio_ppm",
          expr(s"bytes * 1000000 div ${none}L"))
        .orderBy("codec")
    },
    None)

  val all: Seq[QueryDef] = Seq(ioCodecAudit)
}
