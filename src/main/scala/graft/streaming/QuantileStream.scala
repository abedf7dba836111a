package graft.streaming

import org.apache.datasketches.kll.KllLongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** S32 — streaming quantile monitor with MERGEABLE sketch state: per
  * key, a DataSketches KLL sketch accumulates across micro-batches in
  * a `transformWithState` ValueState (serialized bytes — O(k log n)
  * regardless of stream length) and every batch re-emits the current
  * p50/p95/p99 plus the observation count. The R129 stored-sketch
  * architecture made CONTINUOUS: the same sketch bytes a batch job
  * would store per day, maintained incrementally per key — latency
  * dashboards, SLA monitors, adaptive thresholds. KLL compaction is
  * RANDOMIZED (the error guarantee is probabilistic by design), so
  * the verifiable contract is the rank bound, not bit-equality: every
  * emitted quantile's TRUE empirical rank sits within the k=200 error
  * envelope of its target, and the observation count is exact — both
  * spec-asserted against a driver-side exact recompute after
  * cross-batch accumulation. The in-batch event_id sort still pins
  * the per-batch fold order (replay stability of the input side).
  */
object QuantileStream {

  case class Obs(key: Long, event_id: Long, value_q: Long)
  case class Quantiles(key: Long, n: Long, p50: Long, p95: Long, p99: Long)

  private val K = 200 // KLL accuracy parameter (~1.65% rank error)

  class KllProcessor extends StatefulProcessor[Long, Obs, Quantiles] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("kll",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[Quantiles] = {
      val sk =
        if (state.exists())
          KllLongsSketch.heapify(Memory.wrap(state.get()))
        else KllLongsSketch.newHeapInstance(K)
      // pin insertion order so the sketch state is replay-deterministic
      rows.toSeq.sortBy(_.event_id).foreach(o => sk.update(o.value_q))
      state.update(sk.toByteArray)
      if (sk.isEmpty) Iterator.empty
      else Iterator.single(Quantiles(key, sk.getN,
        sk.getQuantile(0.5), sk.getQuantile(0.95), sk.getQuantile(0.99)))
    }
  }

  /** Current per-key quantiles, refreshed every micro-batch. */
  def quantiles(spark: SparkSession, obs: Dataset[Obs]): Dataset[Quantiles] = {
    import spark.implicits._
    obs.groupByKey(_.key)
      .transformWithState(new KllProcessor,
        TimeMode.None(), OutputMode.Update())
  }

}
