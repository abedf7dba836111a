package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** S17 — STREAMING heavy hitters: a Misra-Gries frequency summary per
  * (window, shard) key in `transformWithState`, emitted when the
  * event-time watermark closes the window — the continuous form of
  * D21's batch approx-top-k.
  *
  * Why Misra-Gries: O(capacity) state per key REGARDLESS of stream
  * cardinality, with the classic guarantees — every item whose true
  * in-window count exceeds N/capacity survives the summary, and each
  * reported count is a lower bound within N/capacity of truth (N =
  * window volume). That is the only state shape that survives a
  * 100 TB/day stream; exact per-item counts would grow state with
  * distinct items.
  *
  * Sharding: items hash-partition across `shards` keys per window, so
  * summary maintenance parallelizes and no single task owns a window.
  * Per-shard summaries are mergeable downstream (sum of lower bounds
  * stays a lower bound; the survival guarantee degrades additively to
  * Σ N_shard/capacity = N/capacity) — the emitted rows groupBy(item)
  * in batch for the window's final table, exactly how DataSketches
  * rollups merge in R40.
  *
  * Each batch re-arms the (window, shard) key's single timer at
  * window end; expiry emits the summary ONCE and clears state+timer,
  * so both stay bounded by open windows × shards.
  */
object HeavyHitters {

  case class Item(win_start: java.sql.Timestamp, shard: Int, item: String)
  case class Hit(win_start: java.sql.Timestamp, shard: Int, item: String,
      count_lb: Long, n_seen: Long)

  /** Bounded frequency map as encodable state. */
  case class Summary(items: Seq[String], counts: Seq[Long], nSeen: Long)

  /** One Misra-Gries update step (count 1). */
  private[streaming] def mgUpdate(m: scala.collection.mutable.LinkedHashMap[String, Long],
      item: String, capacity: Int): Unit = {
    if (m.contains(item)) m(item) += 1L
    else if (m.size < capacity) m(item) = 1L
    else {
      // decrement-all: the summary trades one count from every tracked
      // item against the untracked newcomer
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      m.keysIterator.foreach { k =>
        val c = m(k) - 1L
        if (c <= 0L) dead += k else m(k) = c
      }
      dead.foreach(m.remove)
    }
  }

  class MgProcessor(capacity: Int, windowMs: Long)
      extends StatefulProcessor[(Long, Int), Item, Hit] {
    @transient private var state: ValueState[Summary] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Summary]("mg",
        Encoders.product[Summary], TTLConfig.NONE)

    override def handleInputRows(key: (Long, Int), rows: Iterator[Item],
        timerValues: TimerValues): Iterator[Hit] = {
      val prev = if (state.exists()) state.get() else Summary(Nil, Nil, 0L)
      val m = scala.collection.mutable.LinkedHashMap[String, Long](
        prev.items.zip(prev.counts): _*)
      var n = prev.nSeen
      rows.foreach { r => mgUpdate(m, r.item, capacity); n += 1 }
      state.update(Summary(m.keys.toSeq, m.values.toSeq, n))
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(key._1 + windowMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: (Long, Int), timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Hit] = {
      val out = if (state.exists()) {
        val s = state.get()
        val ts = new java.sql.Timestamp(key._1)
        s.items.zip(s.counts).sortBy { case (i, c) => (-c, i) }
          .iterator.map { case (i, c) => Hit(ts, key._2, i, c, s.nSeen) }
      } else Iterator.empty
      state.clear()
      out
    }
  }

  /** Column-level window + shard assignment, so the caller can hang
    * the event-time watermark on `win_start` BEFORE the stateful
    * operator (the watermark column must be a real column going into
    * transformWithState — an object-level map would detach it). A
    * watermark on the floored win_start is conservatively coarser than
    * one on the raw ts by at most one window. */
  def assign(raw: org.apache.spark.sql.DataFrame, tsCol: String,
      itemCol: String, windowMs: Long, shards: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    raw.select(
      timestamp_millis(
        (floor(unix_millis(col(tsCol)).cast("double") / windowMs) * windowMs)
          .cast("long")).as("win_start"),
      pmod(xxhash64(col(itemCol)), lit(shards)).cast("int").as("shard"),
      col(itemCol).cast("string").as("item"))
  }

  /** Maintain per-(window, shard) summaries over the assigned,
    * watermarked stream; each summary emits once on window close. */
  def hits(spark: SparkSession, items: Dataset[Item], windowMs: Long,
      capacity: Int): Dataset[Hit] = {
    import spark.implicits._
    items
      .groupByKey(r => (r.win_start.getTime, r.shard))
      .transformWithState(new MgProcessor(capacity, windowMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
