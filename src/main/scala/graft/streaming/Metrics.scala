package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** S30 — streaming pipeline observability via `StreamingQueryListener`:
  * per-micro-batch flow metrics (input rows, processing duration, state
  * rows, watermark) captured WHILE queries run and exposed as an
  * ordinary DataFrame — the continuous counterpart of E14's batch
  * Observation metrics, and the feed a lag/health dashboard reads.
  * The reference polls its in-loop progress counters
  * (EtlProcessor.cs status updates); Structured Streaming pushes the
  * same numbers to listeners for free — no extra scans, no second job.
  *
  * Scale note: progress events are O(1) per micro-batch per query —
  * driver-side metadata, never data-path work. The buffer is bounded
  * (`maxEvents`, oldest dropped) so a long-running session cannot leak
  * driver memory; a deployment would forward each row to a metrics
  * sink instead of buffering.
  */
final class Metrics(maxEvents: Int = 4096) extends StreamingQueryListener {

  /** (query name, batch id, input rows, batch duration ms, state rows
    * across all stateful operators, watermark string). */
  private val buf =
    mutable.ArrayDeque.empty[(String, Long, Long, Long, Long, String)]

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    val row = (Option(p.name).getOrElse(""), p.batchId, p.numInputRows,
      p.batchDuration, stateRows,
      Option(p.eventTime.get("watermark")).getOrElse(""))
    buf.synchronized {
      buf.append(row)
      while (buf.size > maxEvents) buf.removeHead()
    }
  }

  /** Snapshot the captured metrics as a DataFrame. */
  def frame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = buf.synchronized(buf.toSeq)
    rows.toDF("query", "batch_id", "input_rows", "batch_ms",
      "state_rows", "watermark")
  }

  /** Blocks until `n` progress events for `query` have been captured
    * (micro-batch completion is asynchronous to `processAllAvailable`
    * returning on the caller's thread). */
  def awaitBatches(query: String, n: Int, timeoutMs: Long = 30000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (buf.synchronized(buf.count(_._1 == query)) < n) {
      if (System.currentTimeMillis() > deadline)
        sys.error(s"timed out waiting for $n progress events of $query")
      Thread.sleep(50)
    }
  }
}
