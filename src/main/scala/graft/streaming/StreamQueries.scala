package graft.streaming

import graft.{QueryDef, Tables}

/** Oracle-gated batch-parity entries for the stream operators
  * (SURVEY.md §2.3 S1/S2/S5). The same EventOps transforms run under
  * readStream in the S3/S4/S6 specs. All ts ordering in the oracle
  * goes through epoch_us so DuckDB's nanosecond timestamps collate
  * exactly like Spark's microsecond ones.
  */
object StreamQueries {

  /** S1: tumbling hourly window aggregation. */
  val tumblingWindow = QueryDef(
    "q_tumbling_window",
    (s, d) => EventOps.tumblingHourly(Tables.events(s, d))
      .orderBy("window_start", "event_type"),
    Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
              COUNT(*) AS n_events,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_value
            FROM events
            GROUP BY 1, 2
            ORDER BY window_start, event_type"""))

  /** S2: gap-based sessionization (lag + running sum). */
  val sessionize = QueryDef(
    "q_sessionize",
    (s, d) => EventOps.sessionize(Tables.events(s, d))
      .orderBy("user_id", "session_seq"),
    Some(s"""WITH x AS (
               SELECT *, lag(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
               FROM events),
             y AS (
               SELECT *, CASE WHEN prev_us IS NULL
                   OR epoch_us(ts) - prev_us > ${EventOps.SessionGapMinutes * 60L * 1000000L}
                 THEN 1 ELSE 0 END AS new_session
               FROM x),
             z AS (
               SELECT *, SUM(new_session) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
               FROM y)
             SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
               CAST(MIN(ts) AS TIMESTAMP) AS session_start,
               CAST(MAX(ts) AS TIMESTAMP) AS session_end,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_value
             FROM z GROUP BY user_id, session_seq
             ORDER BY user_id, session_seq"""))

  /** S2b: native session_window sessionization — same merge boundary
    * as the lag-based S2 (an event exactly at last_ts + gap MERGES;
    * spec-verified), with end = last_ts + gap in the output. */
  val sessionWindowQ = QueryDef(
    "q_session_window",
    (s, d) => EventOps.sessionWindows(Tables.events(s, d))
      .orderBy("user_id", "session_start_us"),
    Some(s"""WITH x AS (
               SELECT user_id, epoch_us(ts) AS us, value,
                 lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev_us
               FROM events),
             y AS (
               SELECT *, CASE WHEN prev_us IS NULL
                   OR us - prev_us > ${EventOps.SessionGapMinutes * 60L * 1000000L}
                 THEN 1 ELSE 0 END AS new_session
               FROM x),
             z AS (
               SELECT *, SUM(new_session) OVER (
                 PARTITION BY user_id ORDER BY us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
               FROM y)
             SELECT user_id,
               CAST(MIN(us) AS BIGINT) AS session_start_us,
               CAST(MAX(us) + ${EventOps.SessionGapMinutes * 60L * 1000000L} AS BIGINT) AS session_end_us,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_value
             FROM z GROUP BY user_id, sid
             ORDER BY user_id, session_start_us"""))

  /** S5: JSON props extraction. */
  val jsonExtract = QueryDef(
    "q_json_extract",
    (s, d) => EventOps.extractProps(Tables.events(s, d))
      .orderBy("event_id"),
    Some("""SELECT event_id, user_id, CAST(props->>'k' AS BIGINT) AS k
            FROM events ORDER BY event_id"""))

  val all: Seq[QueryDef] = Seq(tumblingWindow, sessionize, sessionWindowQ, jsonExtract)
}
