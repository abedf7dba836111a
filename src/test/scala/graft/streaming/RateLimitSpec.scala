package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** S33 — event-time token bucket: exact deterministic admissions,
  * cross-batch state, burst/refill arithmetic, late-event clock law. */
class RateLimitSpec extends SparkSpec {

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  test("S33: admissions replay exactly — burst drains the bucket, refill re-admits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksProvider)
    try {
      // capacity 3, refill 1 token/sec
      val sec = 1000000L
      val wave1 = Seq( // burst of 5 at t=0ms..4ms: first 3 admit (burst), 4-5 reject
        RateLimit.Ev(1L, 1L, 0L), RateLimit.Ev(1L, 2L, 1000L),
        RateLimit.Ev(1L, 3L, 2000L), RateLimit.Ev(1L, 4L, 3000L),
        RateLimit.Ev(1L, 5L, 4000L))
      val wave2 = Seq(
        RateLimit.Ev(1L, 6L, 1 * sec + 4000L), // ~1s later: 1 token refilled → admit
        RateLimit.Ev(1L, 7L, 1 * sec + 5000L), // bucket empty again → reject
        RateLimit.Ev(1L, 8L, 500L))            // LATE event: no refill credit → reject
      val stream = MemoryStream[RateLimit.Ev]
      val q = RateLimit.decide(spark, stream.toDS(), capacity = 3L,
        refillPerSec = 1L)
        .writeStream.format("memory").queryName("s33_out")
        .outputMode("update").start()
      try {
        stream.addData(wave1: _*)
        q.processAllAvailable()
        stream.addData(wave2: _*)
        q.processAllAvailable()
        val rows = spark.table("s33_out").collect()
          .map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("admitted"))
          .toMap
        assert(rows == Map(1L -> true, 2L -> true, 3L -> true,
          4L -> false, 5L -> false,
          6L -> true, 7L -> false, 8L -> false))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }
}
