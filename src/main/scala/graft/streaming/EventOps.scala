package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event/stream processing over the events table (SURVEY.md §2.3).
  * Each operator is defined once as a DataFrame transform and applied
  * to BOTH the batch table (oracle-gated parity queries S1/S2/S5) and
  * the streaming source (S3/S4/S6 specs) — the definition of
  * Structured Streaming's unified model.
  *
  * The reference's event loop (`ServiceBusWorker.cs:47-160`) is a
  * single-consumer message pump; these shapes scale it out: tumbling
  * windows and sessions shuffle once on their grouping key, and
  * watermarks bound state instead of an unbounded dictionary.
  */
object EventOps {

  val SessionGapMinutes = 30

  /** S1: tumbling-window aggregation (batch parity via date_trunc —
    * exactly what window(ts, "1 hour") produces for aligned hours). */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(38,6)")), 4).cast("double").as("sum_value"))

  /** S2: gap-based sessionization via lag + running sum — one keyed
    * shuffle on user_id, linear within each user's timeline. A new
    * session starts when the gap from the previous event exceeds
    * SessionGapMinutes. */
  def sessionize(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = lit(SessionGapMinutes * 60L * 1000000L)
    val withSession = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withSession
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        round(sum(col("value").cast("decimal(38,6)")), 4).cast("double").as("sum_value"))
  }

  /** S2b: sessionization via the NATIVE session_window aggregation —
    * the streaming-first shape (in Structured Streaming this exact
    * expression runs with a watermark and merging session state;
    * [[graft.streaming.StatefulSessions]] is the custom-state
    * alternative). Merge boundary matches [[sessionize]]: an event
    * landing exactly at last_ts + gap still MERGES into the session
    * (spec-verified — a new session needs a gap STRICTLY exceeded);
    * session_end here is last_ts + gap, not last_ts. Output times are
    * epoch micros so the oracle collates exactly. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$SessionGapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(38,6)")), 4).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"), col("sum_value"))

  /** S16: CHAINED stateful aggregations in ONE query — 10-minute
    * tumbling counts per event type re-aggregated downstream into
    * hourly (peak 10-min burst, total) rows. In streaming this plan
    * carries TWO stateful operators (Spark's chained time-window
    * aggregation support): the second groupBy windows over
    * `window_time()` of the first, so the hourly roll-up consumes
    * CLOSED 10-minute windows as they finalize, never raw events —
    * exactly how a 100 TB/day metrics topology avoids re-shuffling the
    * raw stream into every coarser granularity. Batch and streaming
    * run this same definition (the spec proves parity and counts the
    * state operators). */
  def chainedWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes").as("w10"), col("event_type"))
      .agg(count(lit(1)).as("n10"))
      .groupBy(window(window_time(col("w10")), "1 hour").as("w60"),
        col("event_type"))
      .agg(max(col("n10")).as("peak_10min"), sum(col("n10")).as("n_events"))
      .select(unix_micros(col("w60.start")).as("hour_start_us"),
        col("event_type"), col("peak_10min"), col("n_events"))

  /** S5: JSON props extraction — schema'd from_json, no string
    * munging. */
  val propsSchema = StructType(Seq(StructField("k", LongType)))
  def extractProps(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("user_id"),
      from_json(col("props"), propsSchema).getField("k").as("k"))
}
