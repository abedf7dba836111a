package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** S23 — streaming distribution-drift monitor: R68's PSI computed per
  * micro-batch against a FIXED reference histogram, the "is today's
  * traffic still shaped like the traffic we validated on" gate a
  * scoring stream runs continuously.
  *
  * The reference is a bounded 10-bin histogram (counts + the bin
  * range) captured from a validation window — O(bins) driver state,
  * closure-broadcast to executors. Each micro-batch reduces to its
  * own 10 bin counts (one aggregation per batch), the PSI arithmetic
  * runs on the O(bins) frame, and ONE metrics row (batch id, rows,
  * psi_q, drifted flag) appends to the metrics table — the metrics
  * plane stays tiny no matter the stream rate. Laplace smoothing
  * (+0.5/bin) keeps empty bins finite exactly as R68 does.
  */
object DriftMonitor {

  val Bins = 10

  /** PSI of `counts` against `ref` in 1e-6 units, via the same
    * quantize-then-sum algebra as R68 (order-free, deterministic). */
  private[streaming] def psiQ(counts: Seq[Long], ref: Seq[Long]): Long = {
    require(counts.length == Bins && ref.length == Bins)
    val nA = counts.sum.toDouble + 0.5 * Bins
    val nR = ref.sum.toDouble + 0.5 * Bins
    (0 until Bins).map { i =>
      val pa = (counts(i) + 0.5) / nA
      val pr = (ref(i) + 0.5) / nR
      math.floor((pa - pr) * math.log(pa / pr) * 1e6).toLong
    }.sum
  }

  /** Bin a batch's `valueCol` into the reference's fixed [lo, hi)
    * grid and return the dense per-bin counts (O(bins) driver rows). */
  private[streaming] def binCounts(batch: DataFrame, valueCol: String,
      lo: Double, hi: Double): Seq[Long] = {
    val width = if (hi > lo) hi - lo else 1.0
    val binned = batch
      .select(least(greatest(floor((col(valueCol) - lo) * Bins / width)
        .cast("int"), lit(0)), lit(Bins - 1)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until Bins).map(b => binned.getOrElse(b, 0L))
  }

  /** Start the monitor: one metrics row per micro-batch appended to
    * `metricsDir` — (batch_id, n_rows, psi_q, drifted). */
  def attach(stream: DataFrame, valueCol: String, refCounts: Seq[Long],
      lo: Double, hi: Double, driftThresholdQ: Long,
      metricsDir: String, checkpointDir: String): StreamingQuery = {
    require(refCounts.length == Bins)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val n = batch.count()
        val psi = psiQ(binCounts(batch, valueCol, lo, hi), refCounts)
        val s = batch.sparkSession
        import s.implicits._
        Seq((batchId, n, psi, psi > driftThresholdQ))
          .toDF("batch_id", "n_rows", "psi_q", "drifted")
          .write.mode("append").parquet(metricsDir)
      }
      .start()
  }
}
