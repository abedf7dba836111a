package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** E14 — Observation-API flow metrics: correct values, and no extra
  * job beyond the action they piggyback. */
class ObserveSpec extends SparkSpec {

  test("stage metrics piggyback one action and report exact values") {
    val orders = Tables.orders(spark, sf)
    val (instrumented, obs) =
      Observe.stageMetrics(orders, "o_custkey", "o_orderdate")

    // count jobs triggered: the observation must NOT add a scan
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      instrumented.filter(col("o_totalprice") > 0)
        .write.format("noop").mode("overwrite").save()
      // listener events are async; poll briefly for the job-start event
      val deadline = System.nanoTime() + 5e9.toLong
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(jobs.get() === 1, "metrics must ride the existing action")
    } finally spark.sparkContext.removeSparkListener(listener)

    val m = obs.get
    assert(m("rows") === orders.count())
    assert(m("null_critical") === 0L)
    val Seq(lo, hi) = orders
      .agg(min("o_orderdate"), max("o_orderdate")).head().toSeq.toList
    assert(m("watermark_min") === lo && m("watermark_max") === hi)
  }

  test("metrics observe the node they are attached to, not the filtered output") {
    val docs = Tables.documents(spark, sf)
    val (instrumented, obs) = Observe.stageMetrics(docs, "text", "doc_id")
    val keptRows = instrumented.filter(col("n_chars") > 200).count()
    val m = obs.get
    // observation sits UPSTREAM of the filter: it sees the full input —
    // that is what makes (rows_in via observe, rows_out via count) the
    // selectivity pair a ledger wants
    assert(m("rows") === docs.count())
    assert(keptRows < m("rows").asInstanceOf[Long])
  }
}
