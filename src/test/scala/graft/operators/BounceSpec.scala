package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** R155 — session entry/exit + bounce laws, replayed from a driver-side
  * sessionization over the raw events. */
class BounceSpec extends SparkSpec {

  test("R155: report replays exactly from a sequential per-user session walk") {
    val gapUs = graft.streaming.EventOps.SessionGapMinutes * 60L * 1000000L
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // sequential reference: per user, order by (us, id), cut on gap
    case class Sess(entry: String, exit: String, n: Long, dur: Long)
    val sessions = raw.groupBy(_._1).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._4, e._2))
      val out = scala.collection.mutable.ArrayBuffer.empty[Vector[(Long, Long, String, Long)]]
      sorted.foreach { e =>
        if (out.isEmpty || e._4 - out.last.last._4 > gapUs) out += Vector(e)
        else out(out.length - 1) = out.last :+ e
      }
      out.map(s => Sess(s.head._3, s.last._3, s.length.toLong, s.last._4 - s.head._4))
    }.toSeq
    val expect = sessions.groupBy(_.entry).map { case (t, xs) =>
      val n = xs.length.toLong
      val b = xs.count(_.n == 1).toLong
      (t, n, b, b * 1000000L / n, xs.count(x => x.entry == x.exit).toLong,
        xs.map(_.dur).sum / n)
    }.toSeq.sortBy(_._1)
    val got = EventAnalytics.qBounceRate.fn(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).sortBy(_._1)
    assert(got.toSeq == expect)
    // the fixture is non-degenerate: bounces exist but are not universal
    assert(got.exists(_._3 > 0) && got.exists(g => g._3 < g._2))
  }
}
