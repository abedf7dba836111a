package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** S31 — streaming bottom-k sampling: cross-batch displacement,
  * batch-recompute parity (order-freeness), replay dedup, O(k) state. */
class SampleStreamSpec extends SparkSpec {

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("S31: the streaming sample equals the batch bottom-k at every point, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksProvider)
    try {
      val stream = MemoryStream[SampleStream.Item]
      val q = SampleStream.bottomK(spark, stream.toDS(), 5)
        .writeStream.format("memory").queryName("s31_out")
        .outputMode("update").start()
      try {
        def currentSample(): Set[Long] = {
          // update mode re-emits the key's full sample each batch; the
          // LATEST batch's emission is the current sample
          val rows = spark.table("s31_out").collect()
          // memory sink appends; take the last 5 emitted for shard 0
          rows.takeRight(5).map(_.getAs[Long]("doc_id")).toSet
        }
        def expectBottomK(ids: Seq[Long]): Set[Long] =
          ids.distinct.sortBy(i => (md5hex(i.toString), i)).take(5).toSet

        stream.addData((1L to 20L).map(SampleStream.Item(0L, _)): _*)
        q.processAllAvailable()
        assert(currentSample() == expectBottomK(1L to 20L))

        // wave 2 displaces members (verified constants: 27/33/35/36 beat
        // most of wave 1's bottom-5) — the cross-batch merge is real
        stream.addData((21L to 40L).map(SampleStream.Item(0L, _)): _*)
        q.processAllAvailable()
        val after = currentSample()
        assert(after == expectBottomK(1L to 40L))
        assert(after != expectBottomK(1L to 20L), "wave 2 must displace")

        // replayed ids are deduped — the sample is a SET, idempotent
        stream.addData((1L to 40L).map(SampleStream.Item(0L, _)): _*)
        q.processAllAvailable()
        assert(currentSample() == expectBottomK(1L to 40L))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }
}
