package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** D76 — embedding drift vs an exact driver-side replay of the
  * quantized sum-vector cosine. */
class EmbDriftSpec extends SparkSpec {

  test("D76: per-label centroid cosine replays the integer sum-vector algebra") {
    val rows = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val dim = rows.head._2.length
    def qvec(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    val byLabel = rows.groupBy(_._1).map { case (l, vs) =>
      val sums = Array.fill(dim)(BigInt(0))
      vs.foreach(v => qvec(v._2).zipWithIndex.foreach { case (q, i) =>
        sums(i) += q
      })
      l -> (vs.length.toLong, sums)
    }
    val global = Array.fill(dim)(BigInt(0))
    byLabel.values.foreach(_._2.zipWithIndex.foreach { case (s, i) =>
      global(i) += s
    })
    val ref = byLabel.map { case (l, (n, sl)) =>
      val dot = sl.zip(global).map { case (a, b) => a * b }.sum
      val ll = sl.map(a => a * a).sum
      val gg = global.map(a => a * a).sum
      l -> (n, math.floor(dot.toDouble /
        (math.sqrt(ll.toDouble) * math.sqrt(gg.toDouble)) * 1e6).toLong)
    }
    val got = EmbDrift.qEmbDrift.fn(spark, sf).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Long]("cos_to_global_q")))
      .toMap
    assert(got === ref)
    // cosines bounded; a label pointing WITH the corpus reads positive
    assert(got.values.forall { case (_, c) =>
      c >= -1000000L && c <= 1000000L
    })
  }
}
