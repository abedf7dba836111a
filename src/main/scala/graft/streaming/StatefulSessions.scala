package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** S4: stateful sessionization with flatMapGroupsWithState — the
  * streaming equivalent of EventOps.sessionize for unbounded input,
  * where a lag/cumsum window is impossible (no end of input). State is
  * one open session per user; an event either extends it or closes it
  * and opens the next; event-time timeout (watermark-driven) closes
  * idle sessions so state is bounded — the scale-critical property the
  * reference's in-memory dictionary lacks.
  */
object StatefulSessions {

  case class Ev(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(startUs: Long, endUs: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  val GapUs: Long = EventOps.SessionGapMinutes * 60L * 1000000L

  private def toUs(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  private def emit(userId: Long, s: OpenSession): SessionOut =
    SessionOut(userId, toTs(s.startUs), toTs(s.endUs), s.n, s.sum)

  /** Handles one user's new events against its open-session state.
    * Events are sorted by event time inside the group (micro-batch
    * scope); late events beyond the watermark were already dropped. */
  def updateUser(userId: Long, events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(emit(userId, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(e => (toUs(e.ts), e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      val us = toUs(e.ts)
      open match {
        // in-watermark out-of-order events: anything within GapUs of
        // the session's SPAN merges (extending either boundary)
        case Some(s) if us >= s.startUs - GapUs && us <= s.endUs + GapUs =>
          open = Some(OpenSession(math.min(s.startUs, us),
            math.max(s.endUs, us), s.n + 1, s.sum + e.value))
        // a late event more than GapUs BEFORE the open session is its
        // own earlier session — emit it closed (a later bridging event
        // inside the same batch was already handled by the sort; one
        // arriving in a later batch is bounded by the watermark)
        case Some(s) if us < s.startUs - GapUs =>
          closed += emit(userId, OpenSession(us, us, 1L, e.value))
        case Some(s) =>
          closed += emit(userId, s)
          open = Some(OpenSession(us, us, 1L, e.value))
        case None =>
          open = Some(OpenSession(us, us, 1L, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      // close the session once the watermark passes its end + gap
      state.setTimeoutTimestamp((s.endUs + GapUs) / 1000L)
    }
    closed.result().iterator
  }

  /** Wire the stateful operator over a (possibly streaming) event
    * Dataset that already has a watermark on ts. */
  def sessions(spark: SparkSession, events: Dataset[Ev]): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateUser)
  }
}
