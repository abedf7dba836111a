package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** S31 — deterministic streaming BOTTOM-K sampling (the
  * reservoir-sample replacement for unbounded streams): per key, keep
  * the k items with the smallest md5(item id) — a uniform-without-
  * replacement sample whose membership is a pure function of the ids
  * seen (Algorithm R needs an RNG stream and is order-dependent;
  * bottom-k by a hash priority is order-FREE, mergeable across shards
  * and batches, and replayable — the same ids always produce the same
  * sample, which is what makes it testable and exactly-once-friendly).
  * The D69 weighted sampler uses the same hash-priority idea in batch;
  * this is its continuous form, and the bottom-k set doubles as a KMV
  * distinct-count sketch (R82) for free.
  *
  * State per key: ONE sorted vector of at most k (priority, id) pairs
  * in a `transformWithState` ValueState — O(k) regardless of stream
  * length. Each batch folds its rows into the vector and emits the
  * current sample (Update mode), so downstream always sees the
  * latest k-sample per key.
  */
object SampleStream {

  case class Item(shard: Long, doc_id: Long)
  case class Member(shard: Long, doc_id: Long, pri: String)
  private case class Reservoir(members: Vector[Member])

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  class BottomKProcessor(k: Int)
      extends StatefulProcessor[Long, Item, Member] {
    @transient private var state: ValueState[Reservoir] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Reservoir]("reservoir",
        Encoders.product[Reservoir], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Item],
        timerValues: TimerValues): Iterator[Member] = {
      val prev = if (state.exists()) state.get().members else Vector.empty
      // fold the batch in: dedup on id (a replayed id must not occupy
      // two slots), keep the k smallest (priority, id) pairs
      val merged = (prev ++ rows.map(i =>
        Member(key, i.doc_id, md5hex(i.doc_id.toString))))
        .groupBy(_.doc_id).map(_._2.head)
        .toVector
        .sortBy(m => (m.pri, m.doc_id))
        .take(k)
      state.update(Reservoir(merged))
      merged.iterator
    }
  }

  /** Current bottom-k sample per shard, refreshed every micro-batch. */
  def bottomK(spark: SparkSession, items: Dataset[Item], k: Int): Dataset[Member] = {
    import spark.implicits._
    items.groupByKey(_.shard)
      .transformWithState(new BottomKProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
