package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tables.events must normalize every ts encoding the driver's
  * testdata generator has shipped — bigint nanos (TIMESTAMP(NANOS)
  * under nanosAsLong), TIMESTAMP_NTZ (MICROS, isAdjustedToUTC=false),
  * and plain session-zone timestamps — to ONE TimestampType schema
  * with identical instants. The r6 bench failed wholesale because the
  * loader assumed the first encoding unconditionally. */
class TablesSpec extends SparkSpec {

  private val usEpoch = 1704067207179575L // 2024-01-01 00:00:07.179575 UTC

  private def loadAs(writer: String => Unit): (DataType, Long) = {
    val dir = Files.createTempDirectory("graft_events_enc").toString
    writer(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    (df.schema("ts").dataType,
      df.select(unix_micros(col("ts"))).head().getLong(0))
  }

  test("bigint-nanos, TIMESTAMP_NTZ and timestamp ts all normalize to the same instant") {
    import spark.implicits._
    val asNanos = loadAs { p =>
      Seq((1L, usEpoch * 1000L)).toDF("event_id", "ts").write.parquet(p)
    }
    val asNtz = loadAs { p =>
      Seq((1L, usEpoch)).toDF("event_id", "us")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
        .write.parquet(p)
    }
    val asLtz = loadAs { p =>
      Seq((1L, usEpoch)).toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
        .write.parquet(p)
    }
    for ((enc, (dt, us)) <- Seq("nanos" -> asNanos, "ntz" -> asNtz, "ltz" -> asLtz)) {
      assert(dt === TimestampType, s"$enc: ts must normalize to TimestampType")
      assert(us === usEpoch, s"$enc: instant drifted")
    }
  }

  test("the real testdata loads as TimestampType with sane bounds") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType)
    val (lo, hi) = {
      val r = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      (r.getLong(0), r.getLong(1))
    }
    // events are generated inside a single recent-years window — a
    // unit slip (ns read as µs, µs as ms) lands centuries away
    assert(lo > 1262304000000000L && hi < 1893456000000000L, // 2010..2030
      s"event instants out of sane bounds: [$lo, $hi]")
  }
}
