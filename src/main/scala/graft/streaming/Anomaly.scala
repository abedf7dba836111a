package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** S15 — STREAMING rate-anomaly detection: the continuous form of
  * R44's batch z-score monitor.
  *
  * Batch R44 re-derives each type's window distribution from the full
  * history; a stream cannot rescan history, so the per-type statistics
  * live in a `transformWithState` ValueState cell as Welford running
  * moments (n, mean, M2) — O(1) state per key, exact, and mergeable
  * batch-over-batch. Each incoming (type, window, count) row is scored
  * against the statistics BEFORE it is folded in (a spike must not
  * mask itself by inflating the variance it is judged against), then
  * updates them. State is bounded by #event-types; rows inside one
  * micro-batch fold in window order so replay determinism holds.
  *
  * Upstream: S1's watermarked tumbling counts in Append mode — closed
  * windows only, each window scored exactly once.
  */
object Anomaly {

  case class WinCount(event_type: String, win_start: java.sql.Timestamp,
      n: Long)
  case class Scored(event_type: String, win_start: java.sql.Timestamp,
      n: Long, z: Option[Double], is_anomaly: Boolean)

  /** Welford moments: count of folded windows, running mean, running
    * sum of squared deviations. */
  case class Moments(nw: Long, mean: Double, m2: Double) {
    def fold(x: Double): Moments = {
      val n1 = nw + 1
      val d = x - mean
      val mean1 = mean + d / n1
      Moments(n1, mean1, m2 + d * (x - mean1))
    }
    /** Sample variance; None until two windows exist. */
    def varS: Option[Double] =
      if (nw >= 2 && m2 > 0) Some(m2 / (nw - 1)) else None
  }

  class ZScoreProcessor(zThreshold: Double)
      extends StatefulProcessor[String, WinCount, Scored] {
    @transient private var state: ValueState[Moments] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Moments]("moments",
        Encoders.product[Moments], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[WinCount],
        timerValues: TimerValues): Iterator[Scored] = {
      var m = if (state.exists()) state.get() else Moments(0L, 0.0, 0.0)
      // deterministic fold order within the batch
      val out = rows.toSeq.sortBy(_.win_start.getTime).map { w =>
        val z = m.varS.map(v => (w.n - m.mean) / math.sqrt(v))
        m = m.fold(w.n.toDouble)
        Scored(w.event_type, w.win_start, w.n, z,
          z.exists(math.abs(_) > zThreshold))
      }
      state.update(m)
      out.iterator
    }
  }

  /** Score a stream of closed windows; Append mode — each window emits
    * exactly one verdict. */
  def scored(spark: SparkSession, windows: Dataset[WinCount],
      zThreshold: Double = 2.0): Dataset[Scored] = {
    import spark.implicits._
    windows
      .groupByKey(_.event_type)
      .transformWithState(new ZScoreProcessor(zThreshold),
        TimeMode.None(), OutputMode.Append())
  }
}
