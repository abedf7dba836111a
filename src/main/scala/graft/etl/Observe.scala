package graft.etl

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** E14 — pipeline observability: flow metrics that piggyback the
  * action instead of costing a second scan.
  *
  * The reference logs per-batch progress counters from inside its
  * processing loop (`Net7EtlBus.Service/EtlProcessor.cs` status
  * updates); the Spark-native analogue is the Observation API — named
  * aggregates attached to a plan node that the executors accumulate
  * WHILE the job runs. At 100 TB this distinction is the whole point:
  * `df.count()` for monitoring doubles the I/O bill; an observation is
  * free.
  *
  * Metrics come back as a driver-side Map after any action touches the
  * observed node — wire them to the E6 ledger or a metrics sink.
  */
object Observe {

  /** Attach the standard stage metrics to a frame: row count, null
    * count of a critical column, and min/max of a monotonic column
    * (freshness watermarks). Returns the instrumented frame plus the
    * handle to read after the action. */
  def stageMetrics(df: DataFrame, criticalCol: String,
      watermarkCol: String): (DataFrame, Observation) = {
    val obs = Observation()
    val instrumented = df.observe(obs,
      count(lit(1)).as("rows"),
      sum(when(col(criticalCol).isNull, 1L).otherwise(0L)).as("null_critical"),
      min(col(watermarkCol)).as("watermark_min"),
      max(col(watermarkCol)).as("watermark_max"))
    (instrumented, obs)
  }
}
