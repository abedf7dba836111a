package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** S11: `transformWithState` — Spark 4's arbitrary-state operator API
  * (SPARK-46815 family), the successor to flatMapGroupsWithState:
  * typed named state cells (value/list/map), TTL, timers, and a
  * contract that REQUIRES the RocksDB state store provider — i.e. the
  * shape new stateful pipelines should be written in. graft keeps S4's
  * flatMapGroupsWithState sessionizer (the API a reference user is
  * migrating from) and carries this running-aggregate operator on the
  * new API alongside it.
  *
  * The operator: per-key running totals (event count + value sum)
  * maintained in a ValueState cell, emitted once per key per
  * micro-batch in Update mode — the "current account position"
  * reference-data shape. State is one small case class per key; TTL
  * (`ttl`) bounds abandoned keys, so state size tracks ACTIVE keys,
  * not stream history.
  */
object RunningState {

  case class Ev(user_id: Long, event_id: Long, value: Double)
  case class Totals(user_id: Long, n_events: Long, sum_value: Double)

  class RunningTotalsProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Ev, Totals] {
    @transient private var state: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Totals]("totals",
        Encoders.product[Totals], ttl)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Totals] = {
      val prev = if (state.exists()) state.get() else Totals(key, 0L, 0.0)
      var n = prev.n_events
      var sum = prev.sum_value
      rows.foreach { e => n += 1; sum += e.value }
      val next = Totals(key, n, sum)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** Wire the processor over a streaming Dataset[Ev]. Update mode: one
    * current-totals row per active key per micro-batch. */
  def totals(spark: SparkSession, events: Dataset[Ev],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Totals] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  // ---------------------------------------------------------- timers

  case class TimedEv(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, value: Double)
  case class Closed(user_id: Long, n_events: Long, sum_value: Double,
      closed: Boolean)

  /** The TIMER half of the new API: per-key totals accumulate silently;
    * when the event-time watermark passes the key's last activity +
    * `gapMs`, the registered timer fires and the key emits ONE final
    * closed row and clears its state — the idle-session-close shape,
    * expressed with explicit timers instead of S4's
    * GroupStateTimeout. Each batch re-arms the key's single timer
    * (delete + register), so state AND timers are bounded by active
    * keys. */
  class IdleCloseProcessor(gapMs: Long)
      extends StatefulProcessor[Long, TimedEv, Closed] {
    @transient private var state: ValueState[Closed] = _
    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[Closed]("totals",
        Encoders.product[Closed], TTLConfig.NONE)
      lastSeen = getHandle.getValueState[Long]("last_seen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[TimedEv],
        timerValues: TimerValues): Iterator[Closed] = {
      val prev = if (state.exists()) state.get() else Closed(key, 0L, 0.0, closed = false)
      var n = prev.n_events
      var sum = prev.sum_value
      var maxTs = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
      rows.foreach { e =>
        n += 1; sum += e.value
        maxTs = math.max(maxTs, e.ts.getTime)
      }
      state.update(Closed(key, n, sum, closed = false))
      lastSeen.update(maxTs)
      // one armed timer per key: re-arm at latest activity + gap
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(maxTs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Closed] = {
      val out = if (state.exists())
        Iterator.single(state.get().copy(closed = true))
      else Iterator.empty
      state.clear()
      lastSeen.clear()
      out
    }
  }

  /** Idle-close totals over a watermarked Dataset[TimedEv]. */
  def idleClosedTotals(spark: SparkSession, events: Dataset[TimedEv],
      gapMs: Long): Dataset[Closed] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new IdleCloseProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ------------------------------------------------------------ LOCF

  case class Reading(user_id: Long, event_id: Long, reading: Option[Double])
  case class FilledReading(user_id: Long, event_id: Long,
      reading: Option[Double], filled: Option[Double], was_gap: Boolean)

  /** S25: STREAMING forward fill — R105's gap repair as continuous
    * state: the last good reading per key lives in a ValueState cell
    * and survives across micro-batches, so a gap arriving days after
    * its last real observation still fills (the batch operator would
    * need the whole history re-scanned). Within a batch, rows sort by
    * event_id before folding — the per-key-per-batch slice is the
    * bounded-history valve class — and keys with no observation yet
    * emit honest nulls exactly like the batch form. TTL bounds state
    * by ACTIVE keys. */
  class ForwardFillProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Reading, FilledReading] {
    @transient private var last: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Double]("last_reading",
        Encoders.scalaDouble, ttl)

    override def handleInputRows(key: Long, rows: Iterator[Reading],
        timerValues: TimerValues): Iterator[FilledReading] = {
      val ordered = rows.toSeq.sortBy(_.event_id)
      val out = ordered.map { r =>
        r.reading match {
          case Some(v) =>
            last.update(v)
            FilledReading(key, r.event_id, r.reading, Some(v), was_gap = false)
          case None =>
            val f = if (last.exists()) Some(last.get()) else None
            FilledReading(key, r.event_id, None, f, was_gap = true)
        }
      }
      out.iterator
    }
  }

  def forwardFill(spark: SparkSession, readings: Dataset[Reading],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[FilledReading] = {
    import spark.implicits._
    readings
      .groupByKey(_.user_id)
      .transformWithState(new ForwardFillProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  // ------------------------------------------------------------- CEP

  case class TypedEv(user_id: Long, event_id: Long, ch: String)
  case class PatternCounts(user_id: Long, seq_len: Int,
      n_clean_funnels: Int, n_aborted_views: Int)

  /** S26: streaming CEP — R104's sequence-regex patterns evaluated
    * CONTINUOUSLY: each key's event-type string accumulates in a
    * ValueState cell (capped at `maxLen` characters, oldest dropped —
    * bounded state; patterns older than the horizon age out, the
    * explicit retention contract), and every batch re-emits the key's
    * current pattern counts. The essential property the batch form
    * cannot give: a pattern whose steps SPAN micro-batches (view in
    * batch 1, purchase in batch 3) completes and counts the moment
    * its last step arrives. */
  class SequencePatternProcessor(maxLen: Int)
      extends StatefulProcessor[Long, TypedEv, PatternCounts] {
    @transient private var seqState: ValueState[String] = _
    @transient private lazy val clean = "v[^e]*?c[^e]*?p".r
    @transient private lazy val aborted = "v[^ce]*?e".r

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seqState = getHandle.getValueState[String]("seq",
        Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TypedEv],
        timerValues: TimerValues): Iterator[PatternCounts] = {
      val prev = if (seqState.exists()) seqState.get() else ""
      val appended = prev +
        rows.toSeq.sortBy(_.event_id).map(_.ch).mkString
      val seq = appended.takeRight(maxLen)
      seqState.update(seq)
      Iterator.single(PatternCounts(key, seq.length,
        clean.findAllMatchIn(seq).length,
        aborted.findAllMatchIn(seq).length))
    }
  }

  def sequencePatterns(spark: SparkSession, events: Dataset[TypedEv],
      maxLen: Int = 1024): Dataset[PatternCounts] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SequencePatternProcessor(maxLen),
        TimeMode.None(), OutputMode.Update())
  }
}
