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
    // late events > GapUs before the open session accumulate here so
    // that consecutive late events within GapUs of EACH OTHER form one
    // merged earlier session (not singletons), matching batch
    // EventOps.sessionize; a pending session that grows to within GapUs
    // of the open session merges into it at absorb time.
    var pending: Option[OpenSession] = None
    val closed = Seq.newBuilder[SessionOut]

    def mergeSpan(a: OpenSession, b: OpenSession): OpenSession =
      OpenSession(math.min(a.startUs, b.startUs), math.max(a.endUs, b.endUs),
        a.n + b.n, a.sum + b.sum)

    /** Resolve the pending earlier session against s: merge if it
      * bridges (gap-close), otherwise emit it closed (sorted input ⇒
      * no later event can reach back into it). */
    def absorbPending(s: OpenSession): OpenSession = pending match {
      case Some(p) if p.endUs + GapUs >= s.startUs =>
        pending = None; mergeSpan(p, s)
      case Some(p) =>
        closed += emit(userId, p); pending = None; s
      case None => s
    }

    sorted.foreach { e =>
      val us = toUs(e.ts)
      val single = OpenSession(us, us, 1L, e.value)
      open match {
        // in-watermark out-of-order events: anything within GapUs of
        // the session's SPAN merges (extending either boundary)
        case Some(s) if us >= s.startUs - GapUs && us <= s.endUs + GapUs =>
          open = Some(mergeSpan(s, single))
        // a late event more than GapUs BEFORE the open session extends
        // (or starts) the pending earlier session
        case Some(s) if us < s.startUs - GapUs =>
          pending match {
            case Some(p) if us <= p.endUs + GapUs =>
              pending = Some(mergeSpan(p, single))
            case Some(p) =>
              closed += emit(userId, p); pending = Some(single)
            case None => pending = Some(single)
          }
        case Some(s) =>
          closed += emit(userId, absorbPending(s))
          open = Some(single)
        case None =>
          open = Some(single)
      }
    }
    open = open.map(absorbPending)
    pending.foreach { p => closed += emit(userId, p) }
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
