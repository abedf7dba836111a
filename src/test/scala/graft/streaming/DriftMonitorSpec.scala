package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** S23 — the per-micro-batch PSI monitor: an in-distribution batch
  * must read near zero, a shifted batch must cross the drift
  * threshold, and the metrics table carries exactly one row per
  * batch. */
class DriftMonitorSpec extends SparkSpec {

  test("S23: in-distribution batch passes, shifted batch flags drifted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_drift").toString
    // reference histogram: uniform over [0, 100) — 10 equal bins
    val ref = Seq.fill(DriftMonitor.Bins)(100L)
    val stream = MemoryStream[Double]
    val q = DriftMonitor.attach(stream.toDF().toDF("value"), "value",
      ref, 0.0, 100.0, driftThresholdQ = 250000L,
      s"$root/metrics", s"$root/cp")
    try {
      // batch 0: uniform like the reference
      stream.addData((0 until 1000).map(i => (i % 100) + 0.5): _*)
      q.processAllAvailable()
      // batch 1: mass collapsed into the top decile
      stream.addData((0 until 1000).map(i => 90.0 + (i % 10)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val m = spark.read.parquet(s"$root/metrics")
      .collect().map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("psi_q"),
          r.getAs[Boolean]("drifted"))).toMap
    assert(m.keySet === Set(0L, 1L))
    assert(m(0L)._1 === 1000L && m(1L)._1 === 1000L)
    assert(!m(0L)._3, s"uniform batch flagged drifted: psi=${m(0L)._2}")
    assert(m(1L)._3, s"shifted batch not flagged: psi=${m(1L)._2}")
    assert(m(1L)._2 > 10 * math.max(m(0L)._2, 1L),
      "drifted batch PSI must dominate the in-distribution batch")
    // the driver-side PSI algebra agrees with a hand histogram
    assert(DriftMonitor.psiQ(ref, ref) <= 0L,
      "identical distributions read ~zero (quantization may floor below)")
  }
}
