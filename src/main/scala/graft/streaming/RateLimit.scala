package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** S33 — per-key token-bucket rate limiting over EVENT TIME: each key
  * owns a bucket of `capacity` tokens refilling at `refillPerSec`;
  * an event is ADMITTED iff a token is available at its event time,
  * else it routes on as REJECTED — admission is data (the E16/E46
  * errors-as-data convention), so downstream can meter, alert on, or
  * replay the rejects. The ingest-protection primitive in front of a
  * per-key-expensive sink (the reference throttles with TPL Dataflow's
  * BoundedCapacity — wall-clock backpressure; event-time admission is
  * deterministic and replayable, which wall-clock never is).
  *
  * Determinism: the bucket is a pure fold over the key's event-time-
  * ordered history — (tokens, last_ts) state in `transformWithState`,
  * integer micro-token arithmetic (`refillPerSec` tokens per second =
  * `refillPerSec` µtokens per µs), so replaying the same events gives
  * the same admissions bit-for-bit. Within a batch rows fold in
  * (event time, event id) order; cross-batch order is the stream's
  * arrival contract (same as every stateful operator here).
  * State is O(1) per key; TTL bounds abandoned keys.
  */
object RateLimit {

  case class Ev(key: Long, event_id: Long, ts_us: Long)
  case class Decision(key: Long, event_id: Long, ts_us: Long,
      admitted: Boolean, tokens_after_q6: Long)
  private case class Bucket(tokens_q6: Long, last_us: Long)

  class TokenBucketProcessor(capacity: Long, refillPerSec: Long,
      ttl: TTLConfig)
      extends StatefulProcessor[Long, Ev, Decision] {
    @transient private var state: ValueState[Bucket] = _
    private val capQ6 = capacity * 1000000L

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Bucket]("bucket",
        Encoders.product[Bucket], ttl)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Decision] = {
      var b = if (state.exists()) state.get()
        else Bucket(capQ6, Long.MinValue)
      val out = rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).map { e =>
        // refill: refillPerSec µtokens per µs elapsed, capped
        val refill =
          if (b.last_us == Long.MinValue) 0L
          else (e.ts_us - b.last_us) * refillPerSec
        val avail = math.min(capQ6, b.tokens_q6 + math.max(refill, 0L))
        val admit = avail >= 1000000L
        val left = if (admit) avail - 1000000L else avail
        // the clock never rewinds: a cross-batch LATE event refills
        // nothing (its interval was already credited) instead of
        // double-crediting the same wall of time
        b = Bucket(left, math.max(b.last_us, e.ts_us))
        Decision(key, e.event_id, e.ts_us, admit, left)
      }
      state.update(b)
      out.iterator
    }
  }

  def decide(spark: SparkSession, events: Dataset[Ev], capacity: Long,
      refillPerSec: Long, ttl: TTLConfig = TTLConfig.NONE): Dataset[Decision] = {
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new TokenBucketProcessor(capacity, refillPerSec, ttl),
        TimeMode.None(), OutputMode.Update())
  }
}
