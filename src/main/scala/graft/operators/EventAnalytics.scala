package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R38/R39 — ordered-event analytics: funnel conversion and cohort
  * retention.
  *
  * These are the two canonical "sequence over a keyed event stream"
  * aggregations a telemetry/ETL platform serves (the reference
  * persists per-entity processing events through its bus —
  * `Net7EtlBus.Service/EtlProcessor.cs` — and these are the queries a
  * user runs over that history). Both reduce to keyed min-aggregations
  * and re-joins on the SAME key, so at 100 TB every stage after the
  * first reuses the `user_id`/`o_custkey` hash partitioning — the plan
  * pays one fact-table shuffle per stage input, never a global sort,
  * and each funnel stage's input is the (monotonically shrinking)
  * survivor set of the previous stage, not the raw stream.
  */
object EventAnalytics {

  /** Earliest qualifying event per key strictly after a per-key lower
    * bound: the funnel-stage primitive. `bound` has columns (user_id,
    * bound_ts); result has (user_id, stage_ts). The join is
    * key-equi + a residual time predicate, so it stays a hash join on
    * the stage key — co-partitioned with the groupBy that follows. */
  private def nextStage(events: DataFrame, etype: String,
      bound: DataFrame, maxDelayHours: Option[Int] = None): DataFrame = {
    val inWindow = maxDelayHours.fold(lit(true))(h =>
      col("ts") <= col("bound_ts") + expr(s"INTERVAL $h HOURS"))
    events.filter(col("event_type") === etype)
      .join(bound, Seq("user_id"))
      .filter(col("ts") > col("bound_ts") && inWindow)
      .groupBy("user_id")
      .agg(min(col("ts")).as("stage_ts"))
  }

  /** R38: strict-order funnel view → click → purchase. A user converts
    * through stage N only with an event strictly after their stage-N−1
    * conversion time (earliest-completion semantics — the standard
    * product-analytics definition). Output: one row per stage with the
    * surviving-user count. */
  def funnel(s: SparkSession, dir: String,
      maxDelayHours: Option[Int] = None): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
    // view and click each feed TWO consumers (their stage row + the
    // next stage's bound); without the persist each reuse re-scans the
    // event stream, turning 3 fact passes into 6. The persisted sets
    // are user-cardinality min-aggregates — orders of magnitude
    // smaller than the stream — and shrink stage over stage.
    val view = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("stage_ts"))
      .persist()
    val click = nextStage(ev, "click",
      view.select(col("user_id"), col("stage_ts").as("bound_ts")),
      maxDelayHours)
      .persist()
    val purchase = nextStage(ev, "purchase",
      click.select(col("user_id"), col("stage_ts").as("bound_ts")),
      maxDelayHours)
    def stageRow(df: DataFrame, name: String, ord: Int) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(name).as("stage"), lit(ord).as("stage_ord"),
          col("n_users"))
    stageRow(view, "view", 1)
      .unionByName(stageRow(click, "click", 2))
      .unionByName(stageRow(purchase, "purchase", 3))
      .orderBy("stage_ord")
  }

  val qFunnel = QueryDef(
    "q_funnel",
    (s, d) => funnel(s, d),
    Some("""WITH v AS (
              SELECT user_id, min(ts) AS stage_ts FROM events
              WHERE event_type = 'view' GROUP BY user_id),
            c AS (
              SELECT e.user_id, min(e.ts) AS stage_ts
              FROM events e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts > v.stage_ts
              GROUP BY e.user_id),
            p AS (
              SELECT e.user_id, min(e.ts) AS stage_ts
              FROM events e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.stage_ts
              GROUP BY e.user_id)
            SELECT * FROM (
              SELECT 'view' AS stage, 1 AS stage_ord, count(*) AS n_users FROM v
              UNION ALL
              SELECT 'click', 2, count(*) FROM c
              UNION ALL
              SELECT 'purchase', 3, count(*) FROM p)
            ORDER BY stage_ord"""))

  /** R64 — funnel with a CONVERSION WINDOW: each stage must complete
    * within `maxDelayHours` of the previous stage's completion — the
    * product-analytics default (an unbounded funnel credits a
    * purchase months after the view; attribution policies don't).
    * Same persisted shrinking-survivor-set machinery as R41 with one
    * extra residual predicate on the stage joins; windowed counts are
    * by construction ≤ the unbounded funnel's (spec-gated). */
  val qFunnelWindowed = QueryDef(
    "q_funnel_windowed",
    (s, d) => funnel(s, d, maxDelayHours = Some(24)),
    Some("""WITH v AS (
              SELECT user_id, min(ts) AS stage_ts FROM events
              WHERE event_type = 'view' GROUP BY user_id),
            c AS (
              SELECT e.user_id, min(e.ts) AS stage_ts
              FROM events e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts > v.stage_ts
                AND e.ts <= v.stage_ts + INTERVAL 24 HOUR
              GROUP BY e.user_id),
            p AS (
              SELECT e.user_id, min(e.ts) AS stage_ts
              FROM events e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.stage_ts
                AND e.ts <= c.stage_ts + INTERVAL 24 HOUR
              GROUP BY e.user_id)
            SELECT * FROM (
              SELECT 'view' AS stage, 1 AS stage_ord, count(*) AS n_users FROM v
              UNION ALL
              SELECT 'click', 2, count(*) FROM c
              UNION ALL
              SELECT 'purchase', 3, count(*) FROM p)
            ORDER BY stage_ord"""))

  /** R39: cohort retention — customers grouped by first-order month,
    * counted distinct in each subsequent activity month. Two shuffles
    * total: the first-order min (on o_custkey) and the final
    * (cohort, offset) count-distinct; the fact re-join reuses the
    * o_custkey partitioning of the first aggregate. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select("o_custkey", "o_orderdate")
    val first = o.groupBy("o_custkey")
      .agg(min(trunc(col("o_orderdate"), "MM")).as("cohort"))
    o.join(first, Seq("o_custkey"))
      .select(col("cohort"),
        months_between(trunc(col("o_orderdate"), "MM"), col("cohort"))
          .cast("int").as("month_offset"),
        col("o_custkey"))
      .groupBy(date_format(col("cohort"), "yyyy-MM").as("cohort_month"),
        col("month_offset"))
      .agg(countDistinct(col("o_custkey")).as("n_active"))
      .orderBy("cohort_month", "month_offset")
  }

  val qCohortRetention = QueryDef(
    "q_cohort_retention",
    (s, d) => cohortRetention(s, d),
    Some("""WITH first AS (
              SELECT o_custkey,
                     min(date_trunc('month', o_orderdate)) AS cohort
              FROM orders GROUP BY o_custkey)
            SELECT strftime(f.cohort, '%Y-%m') AS cohort_month,
                   CAST(datediff('month', f.cohort,
                        date_trunc('month', o.o_orderdate)) AS INT)
                     AS month_offset,
                   count(DISTINCT o.o_custkey) AS n_active
            FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
            GROUP BY 1, 2 ORDER BY cohort_month, month_offset"""))

  /** R43: Markov transition matrix over the event stream — counts and
    * row-normalized probabilities of each event_type → next event_type
    * step per user. One window shuffle on user_id, then aggregation of
    * #types² cells; the probability is floor-quantized to 1e-6 (the
    * repo convention: floor has no rounding-tie rule, so identical
    * doubles floor identically in both engines). */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val seq = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("dst_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("dst_type").isNotNull)
    // pairs feeds two consumers (cells + row totals); it is ≤ #types²
    // rows, so the persist is O(1) and saves a second window pass
    val pairs = seq
      .groupBy(col("event_type").as("src_type"), col("dst_type"))
      .agg(count(lit(1)).as("n"))
      .persist()
    val tot = pairs.groupBy("src_type").agg(sum(col("n")).as("total"))
    pairs.join(tot, "src_type")
      .select(col("src_type"), col("dst_type"), col("n"),
        floor(col("n").cast("double") / col("total").cast("double") * lit(1e6))
          .as("prob_q"))
      .orderBy("src_type", "dst_type")
  }

  val qEventTransitions = QueryDef(
    "q_event_transitions",
    (s, d) => eventTransitions(s, d),
    Some("""WITH seq AS (
              SELECT user_id, event_type AS src_type,
                     lead(event_type) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                       AS dst_type
              FROM events),
            pairs AS (
              SELECT src_type, dst_type, count(*) AS n FROM seq
              WHERE dst_type IS NOT NULL GROUP BY src_type, dst_type),
            tot AS (SELECT src_type, sum(n) AS total FROM pairs
                    GROUP BY src_type)
            SELECT p.src_type, p.dst_type, p.n,
                   CAST(floor(CAST(p.n AS DOUBLE) / CAST(t.total AS DOUBLE)
                        * 1e6) AS BIGINT) AS prob_q
            FROM pairs p JOIN tot t ON p.src_type = t.src_type
            ORDER BY p.src_type, p.dst_type"""))

  /** R44: event-rate anomaly detection — per (event_type, hour) counts
    * z-scored against the type's own window distribution. The mean and
    * variance are derived from EXACT integer sums (S1 = Σn, S2 = Σn²,
    * nw = #windows), so every double op runs the same IEEE sequence in
    * both engines — no engine-specific stddev accumulation order — and
    * the z floor-quantizes to 1e-6 bit-identically. Variance-zero rows
    * are gated by the exact integer predicate nw·S2 − S1² > 0, never a
    * float epsilon. */
  def rateAnomalies(s: SparkSession, dir: String,
      zThreshold: Double = 2.0): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("win"))
      .agg(count(lit(1)).as("n"))
      .persist() // feeds stats AND the output join; O(#types × #hours)
    val stats = counts.groupBy("event_type")
      .agg(sum(col("n")).as("s1"), sum(col("n") * col("n")).as("s2"),
        count(lit(1)).as("nw"))
    val mean = col("s1").cast("double") / col("nw").cast("double")
    val varS = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / col("nw").cast("double")) /
      (col("nw") - 1).cast("double")
    val z = (col("n").cast("double") - mean) / sqrt(varS)
    val zq = when(col("nw") > 1 &&
        col("nw") * col("s2") - col("s1") * col("s1") > 0,
      floor(z * lit(1e6))).otherwise(lit(null).cast("long"))
    counts.join(stats, "event_type")
      .select(col("event_type"), col("win"), col("n"), zq.as("z_q"),
        (zq.isNotNull && abs(zq) > (zThreshold * 1e6).toLong).as("is_anomaly"))
      .orderBy("event_type", "win")
  }

  val qRateAnomalies = QueryDef(
    "q_rate_anomalies",
    (s, d) => rateAnomalies(s, d),
    Some("""WITH counts AS (
              SELECT event_type, date_trunc('hour', ts) AS win,
                     count(*) AS n
              FROM events GROUP BY event_type, date_trunc('hour', ts)),
            stats AS (
              SELECT event_type, sum(n) AS s1, sum(n * n) AS s2,
                     count(*) AS nw
              FROM counts GROUP BY event_type)
            SELECT c.event_type, c.win, c.n,
                   CASE WHEN s.nw > 1 AND s.nw * s.s2 - s.s1 * s.s1 > 0
                        THEN CAST(floor(
                          (CAST(c.n AS DOUBLE)
                             - CAST(s.s1 AS DOUBLE) / CAST(s.nw AS DOUBLE))
                          / sqrt((CAST(s.s2 AS DOUBLE)
                                    - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE)
                                      / CAST(s.nw AS DOUBLE))
                                 / CAST(s.nw - 1 AS DOUBLE))
                          * 1e6) AS BIGINT)
                        ELSE NULL END AS z_q,
                   (CASE WHEN s.nw > 1 AND s.nw * s.s2 - s.s1 * s.s1 > 0
                        THEN abs(CAST(floor(
                          (CAST(c.n AS DOUBLE)
                             - CAST(s.s1 AS DOUBLE) / CAST(s.nw AS DOUBLE))
                          / sqrt((CAST(s.s2 AS DOUBLE)
                                    - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE)
                                      / CAST(s.nw AS DOUBLE))
                                 / CAST(s.nw - 1 AS DOUBLE))
                          * 1e6) AS BIGINT)) > 2000000
                        ELSE FALSE END) AS is_anomaly
            FROM counts c JOIN stats s ON c.event_type = s.event_type
            ORDER BY c.event_type, c.win"""))

  /** R45: last-touch conversion attribution — each purchase is credited
    * to the user's most recent preceding view/click (the running
    * last-non-null window carry, one shuffle on user_id), then rolled
    * up to conversions + mean delay per touch type. The mean delay is
    * Σdelay/Σn from exact integer micros, floor-quantized — engines
    * must not be allowed to disagree on avg()'s accumulation. */
  def lastTouchAttribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touched = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("touch_type",
        last(when(col("event_type").isin("view", "click"), col("event_type")),
          ignoreNulls = true).over(byUser))
      .withColumn("touch_ts",
        last(when(col("event_type").isin("view", "click"), col("ts")),
          ignoreNulls = true).over(byUser))
    touched
      .filter(col("event_type") === "purchase" && col("touch_type").isNotNull)
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_conversions"),
        floor(sum(unix_micros(col("ts")) - unix_micros(col("touch_ts")))
            .cast("double") / count(lit(1)).cast("double"))
          .as("mean_delay_us_q"))
      .orderBy("touch_type")
  }

  val qAttribution = QueryDef(
    "q_attribution",
    (s, d) => lastTouchAttribution(s, d),
    Some("""WITH touched AS (
              SELECT user_id, event_type, ts,
                     last_value(CASE WHEN event_type IN ('view','click')
                                     THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS touch_type,
                     last_value(CASE WHEN event_type IN ('view','click')
                                     THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS touch_ts
              FROM events)
            SELECT touch_type, count(*) AS n_conversions,
                   CAST(floor(
                     CAST(sum(epoch_us(ts) - epoch_us(touch_ts)) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE)) AS BIGINT)
                     AS mean_delay_us_q
            FROM touched
            WHERE event_type = 'purchase' AND touch_type IS NOT NULL
            GROUP BY touch_type
            ORDER BY touch_type"""))

  /** R141 — isolated-event detection (temporal loners): events with NO
    * other event from the same user within ±15 minutes — the
    * sensor-glitch / fat-finger / bot-probe signal (organic sessions
    * cluster; a lone click an hour from anything else is a different
    * phenomenon). One lag + one lead on the shared (user, time, id)
    * ordering decide isolation map-side; the summary rolls up per
    * event type with ppm rates. Exact integer µs gaps; first/last
    * events of a history have NULL neighbors on that side — isolation
    * requires the EXISTING neighbors to be far, absent ones count as
    * far (a user's only event is maximally isolated). */
  val qIsolatedEvents = QueryDef(
    "q_isolated_events",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val gapUs = 15L * 60L * 1000000L
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("next_us", lead(col("ts_us"), 1).over(w))
        .withColumn("isolated",
          (col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs) &&
            (col("next_us").isNull || col("next_us") - col("ts_us") > gapUs))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("isolated"), 1L).otherwise(0L)).as("n_isolated"))
        .withColumn("isolated_ppm",
          expr("n_isolated * 1000000 div n"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
              SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
                     lag(epoch_us(ts), 1) OVER w AS prev_us,
                     lead(epoch_us(ts), 1) OVER w AS next_us
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts),
                event_id)),
            f AS (SELECT event_type,
                    (prev_us IS NULL OR ts_us - prev_us > 900000000)
                    AND (next_us IS NULL OR next_us - ts_us > 900000000)
                      AS isolated
                  FROM e)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN isolated THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_isolated,
                   CAST(SUM(CASE WHEN isolated THEN 1 ELSE 0 END)
                     AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
                     AS isolated_ppm
            FROM f GROUP BY 1 ORDER BY 1"""))

  /** R139 — attribution-model comparison (first-touch vs last-touch):
    * the SAME purchases credited under both models, per touch type,
    * with the disagreement quantified — the report that tells a
    * marketing team how much their channel story depends on the
    * attribution policy rather than the data (if first and last agree,
    * the argument is moot; where they diverge, the delta is the
    * budget at stake). Both touches come from ONE (user, time, id)
    * window pass (running first/last over the same frame R45 uses);
    * the model comparison then runs on the O(purchases) frame with
    * two bounded aggregations and a full outer join on the O(touch
    * types) key. n_agree counts purchases where both models credit
    * the SAME type — the per-type agreement mass. */
  val qAttributionCompare = QueryDef(
    "q_attribution_compare",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val touch = when(col("event_type").isin("view", "click"),
        col("event_type"))
      val purchases = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("lt", last(touch, ignoreNulls = true).over(byUser))
        .withColumn("ft", first(touch, ignoreNulls = true).over(byUser))
        .filter(col("event_type") === "purchase" && col("lt").isNotNull)
      val a = purchases.groupBy(col("lt").as("touch_type"))
        .agg(count(lit(1)).as("n_last"),
          sum(when(col("ft") === col("lt"), 1L).otherwise(0L))
            .as("n_agree"))
      val b = purchases.groupBy(col("ft").as("tt2"))
        .agg(count(lit(1)).as("n_first"))
      a.join(b, col("touch_type") === col("tt2"), "full_outer")
        .select(coalesce(col("touch_type"), col("tt2")).as("touch_type"),
          coalesce(col("n_last"), lit(0L)).as("n_last"),
          coalesce(col("n_first"), lit(0L)).as("n_first"),
          coalesce(col("n_agree"), lit(0L)).as("n_agree"))
        .withColumn("delta", col("n_first") - col("n_last"))
        .orderBy("touch_type")
    },
    Some("""WITH t AS (
              SELECT user_id, event_type, ts, event_id,
                     last_value(CASE WHEN event_type IN ('view','click')
                         THEN event_type END IGNORE NULLS)
                       OVER w AS lt,
                     first_value(CASE WHEN event_type IN ('view','click')
                         THEN event_type END IGNORE NULLS)
                       OVER w AS ft
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING)),
            p AS (SELECT lt, ft FROM t
                  WHERE event_type = 'purchase' AND lt IS NOT NULL),
            a AS (SELECT lt AS touch_type,
                    CAST(count(*) AS BIGINT) AS n_last,
                    CAST(SUM(CASE WHEN ft = lt THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_agree
                  FROM p GROUP BY 1),
            b AS (SELECT ft AS tt2, CAST(count(*) AS BIGINT) AS n_first
                  FROM p GROUP BY 1)
            SELECT COALESCE(touch_type, tt2) AS touch_type,
                   COALESCE(n_last, 0) AS n_last,
                   COALESCE(n_first, 0) AS n_first,
                   COALESCE(n_agree, 0) AS n_agree,
                   COALESCE(n_first, 0) - COALESCE(n_last, 0) AS delta
            FROM a FULL OUTER JOIN b ON touch_type = tt2
            ORDER BY touch_type"""))

  /** R50 — merge overlapping per-user intervals (gaps-and-islands):
    * each event opens an interval [ts, ts + ⌊value·60⌋ seconds]; any
    * interval starting at or before the running max end of its
    * predecessors joins that island. THE calendar primitive behind
    * session coverage, on-call unions, and machine-uptime rollups.
    * Shape at scale: ONE hash exchange on user_id feeds both windows
    * (running max, running island sum) and the final island groupBy —
    * the partitioning is reused end-to-end, no sort beyond the
    * per-partition window sort, no driver state. Exact integer
    * microsecond arithmetic both engines. */
  def mergedIntervals(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d).select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("s_us"),
      (unix_micros(col("ts")) +
        floor(col("value") * 60).cast("long") * 1000000L).as("e_us"))
    val w = Window.partitionBy("user_id").orderBy("s_us", "event_id")
    val prevMax = max(col("e_us"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val island = sum(
      when(prevMax.isNull || col("s_us") > prevMax, 1L).otherwise(0L))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ev.withColumn("island", island)
      .groupBy("user_id", "island")
      .agg(min(col("s_us")).as("start_us"), max(col("e_us")).as("end_us"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "island")
  }

  val qIntervalMerge = QueryDef(
    "q_interval_merge",
    (s, d) => mergedIntervals(s, d),
    Some("""WITH iv AS (
              SELECT user_id, event_id, epoch_us(ts) AS s_us,
                     epoch_us(ts) + CAST(floor(value * 60) AS BIGINT) * 1000000
                       AS e_us
              FROM events),
            pm AS (
              SELECT *, max(e_us) OVER
                       (PARTITION BY user_id ORDER BY s_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_max
              FROM iv),
            flagged AS (
              SELECT *, CASE WHEN prev_max IS NULL OR s_us > prev_max
                     THEN 1 ELSE 0 END AS new_island
              FROM pm),
            islands AS (
              SELECT *, sum(new_island) OVER
                       (PARTITION BY user_id ORDER BY s_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS island
              FROM flagged)
            SELECT user_id, CAST(island AS BIGINT) AS island,
                   min(s_us) AS start_us,
                   max(e_us) AS end_us, CAST(count(*) AS BIGINT) AS n_events
            FROM islands GROUP BY user_id, island
            ORDER BY user_id, island"""))

  /** R101 — interval×interval overlap join WITHOUT an equi key
    * (purchase activity windows × error windows — "which transactions
    * ran while an incident was open"): both sides are sf-proportional
    * interval sets, so the naive plan is a cartesian with a range
    * residual. [[RangeJoin.intervalOverlap]] buckets both sides at 1 h
    * and keeps only each pair's FIRST shared bucket
    * (greatest-of-start-buckets), so the join is a plain hash
    * equi-join emitting every overlapping pair exactly once with NO
    * dedup shuffle. Aggregated per start-day: pair count + exact
    * BIGINT intersection time. */
  def intervalOverlapDaily(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("s"),
      (unix_micros(col("ts")) +
        floor(col("value") * 6).cast("long") * 1000000L).as("e"))
    def side(t: String, p: String) = ev.filter(col("event_type") === t)
      .select(col("event_id").as(p + "id"), col("s").as(p + "s"),
        col("e").as(p + "e"))
    RangeJoin.intervalOverlap(
        side("purchase", "a_"), side("error", "b_"), bucketSeconds = 3600L)
      .groupBy(expr("a_s div 86400000000").as("a_day"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
          .cast("long").as("overlap_us"))
      .orderBy("a_day")
  }

  val qIntervalOverlap = QueryDef(
    "q_interval_overlap",
    (s, d) => intervalOverlapDaily(s, d),
    Some("""WITH ev AS (
              SELECT event_id, event_type, epoch_us(ts) AS s,
                     epoch_us(ts) + CAST(floor(value * 6) AS BIGINT) * 1000000
                       AS e
              FROM events),
            a AS (SELECT event_id AS a_id, s AS a_s, e AS a_e FROM ev
                  WHERE event_type = 'purchase' AND e > s),
            b AS (SELECT event_id AS b_id, s AS b_s, e AS b_e FROM ev
                  WHERE event_type = 'error' AND e > s),
            p AS (SELECT a_s,
                         least(a_e, b_e) - greatest(a_s, b_s) AS ov
                  FROM a JOIN b ON a_s < b_e AND b_s < a_e)
            SELECT a_s // 86400000000 AS a_day,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(ov) AS BIGINT) AS overlap_us
            FROM p GROUP BY 1 ORDER BY 1"""))

  /** R104 — sequence-pattern matching over per-key event histories
    * (the MATCH_RECOGNIZE / CEP class Spark SQL lacks, ClickHouse's
    * windowFunnel / sequenceCount): each user's time-ordered event
    * types collapse to one character string (one ordered listagg —
    * per-key history is the bounded sessionize/pack valve class), and
    * patterns become REGEXES over that string — here "clean funnel"
    * = view…click…purchase with NO error anywhere inside, counted
    * non-overlapping, plus "error-aborted view" = view reaching an
    * error before any click. Lazy quantifiers keep Java (Spark) and
    * RE2 (DuckDB) match spans identical — both leftmost-first with
    * minimal expansion; a greedy form could legally pick different
    * spans per engine. The per-user string is rebuilt per query; a
    * deployment stores it as a maintained column (the D37 stored-
    * artifact convention) and pattern queries become pure map-side
    * regex scans over O(users) rows. */
  def eventRegex(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        substring(col("event_type"), 1, 1).as("ch"))
      .groupBy("user_id")
      .agg(expr("listagg(ch) WITHIN GROUP (ORDER BY ts, event_id)")
        .as("seq"))
      .select(col("user_id"), length(col("seq")).as("seq_len"),
        regexp_count(col("seq"), lit("v[^e]*?c[^e]*?p"))
          .as("n_clean_funnels"),
        regexp_count(col("seq"), lit("v[^ce]*?e")).as("n_aborted_views"))
      .orderBy("user_id")

  val qEventRegex = QueryDef(
    "q_event_regex",
    (s, d) => eventRegex(s, d),
    Some("""WITH s AS (
              SELECT user_id,
                     string_agg(substr(event_type, 1, 1), ''
                       ORDER BY ts, event_id) AS seq
              FROM events GROUP BY user_id)
            SELECT user_id, CAST(len(seq) AS INT) AS seq_len,
                   CAST(len(regexp_extract_all(seq, 'v[^e]*?c[^e]*?p')) AS INT)
                     AS n_clean_funnels,
                   CAST(len(regexp_extract_all(seq, 'v[^ce]*?e')) AS INT)
                     AS n_aborted_views
            FROM s ORDER BY user_id"""))

  /** R105 — forward fill / last-observation-carried-forward: sensor
    * readings go missing (here: error events produce no reading) and
    * downstream features need a dense series — each gap takes the most
    * recent real observation, staying NULL before the first one. One
    * keyed window pass (`last(..., ignoreNulls)` over an unbounded-
    * preceding frame) on the same (user, time) partitioning every
    * other per-key operator shares; values pass through untouched
    * (no arithmetic), so raw doubles compare exactly cross-engine. */
  def forwardFill(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") =!= "error", col("value")).as("reading"))
      .withColumn("filled", last(col("reading"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("event_id"), col("reading"),
        col("filled"), col("reading").isNull.as("was_gap"))
      .orderBy("user_id", "event_id")
  }

  val qForwardFill = QueryDef(
    "q_forward_fill",
    (s, d) => forwardFill(s, d),
    Some("""WITH r AS (
              SELECT user_id, event_id, ts, event_type,
                     CASE WHEN event_type <> 'error' THEN value END AS reading
              FROM events)
            SELECT user_id, event_id, reading,
                   last_value(reading IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS filled,
                   reading IS NULL AS was_gap
            FROM r ORDER BY user_id, event_id"""))

  /** R106 — local-timezone daily rollup: the "daily report in the
    * business's OWN timezone" query — UTC instants shift into an IANA
    * zone BEFORE the day truncation, so days split at local midnight
    * (a UTC-day rollup misattributes the evening hours of every
    * west-of-Greenwich business day). Pure map-side conversion riding
    * the one aggregation shuffle; both engines resolve the same IANA
    * tzdata, so the boundary assignment is identical — the oracle's
    * double AT TIME ZONE hop mirrors from_utc_timestamp exactly. */
  def localDayRollup(s: SparkSession, d: String,
      tz: String = "America/New_York"): DataFrame =
    Tables.events(s, d)
      .groupBy(
        to_date(from_utc_timestamp(col("ts"), tz)).as("local_day"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(38,6)")), 4).cast("double")
          .as("sum_value"))
      .orderBy("local_day", "event_type")

  val qLocalDayRollup = QueryDef(
    "q_local_day_rollup",
    (s, d) => localDayRollup(s, d),
    Some("""SELECT CAST(((ts AT TIME ZONE 'UTC')
                     AT TIME ZONE 'America/New_York') AS DATE) AS local_day,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 4) AS DOUBLE)
                     AS sum_value
            FROM events
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** R111 — anchor-reset windows: per event, "how many events / how
    * much time since this user's last PURCHASE" — the recency features
    * every churn/propensity model starts from. Gap-based sessions
    * (R48) reset on silence; this resets on a SEMANTIC anchor: the
    * running count of anchors partitions each user's history into
    * islands, the island's first row is its anchor, and both features
    * are window arithmetic within (user, island) — all frames share
    * the one (user, time) hash exchange. Events before the first
    * anchor carry honest NULLs. */
  def sinceAnchor(s: SparkSession, d: String,
      anchorType: String = "purchase"): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val inIsland = Window.partitionBy("user_id", "island")
      .orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        when(col("event_type") === anchorType, 1L).otherwise(0L).as("anchor"))
      .withColumn("island", sum("anchor").over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_since",
        when(col("island") > 0, row_number().over(inIsland) - 1))
      .withColumn("us_since",
        when(col("island") > 0,
          unix_micros(col("ts")) -
            first(unix_micros(col("ts"))).over(
              inIsland.rowsBetween(Window.unboundedPreceding,
                Window.currentRow))))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("n_since"), col("us_since"))
      .orderBy("user_id", "event_id")
  }

  val qSinceAnchor = QueryDef(
    "q_since_anchor",
    (s, d) => sinceAnchor(s, d),
    Some("""WITH x AS (
              SELECT user_id, event_id, ts, event_type,
                     CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS anchor
              FROM events),
            i AS (SELECT *, SUM(anchor) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS island
                  FROM x),
            f AS (SELECT *,
                    CASE WHEN island > 0 THEN
                      CAST(row_number() OVER w - 1 AS BIGINT) END AS n_since,
                    CASE WHEN island > 0 THEN
                      epoch_us(ts) - first_value(epoch_us(ts)) OVER (
                        PARTITION BY user_id, island ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    END AS us_since
                  FROM i
                  WINDOW w AS (PARTITION BY user_id, island
                    ORDER BY ts, event_id))
            SELECT user_id, event_id, event_type, n_since, us_since
            FROM f ORDER BY user_id, event_id"""))

  /** R112 — seasonal-naive forecast backtest: forecast(day) =
    * actual(day − 7), scored per event type with sMAPE — the baseline
    * every real forecasting model must beat, and the backtest harness
    * shape (lag-join forecast vs actual, integer-exact error
    * aggregation) that any model's scores plug into. Runs on the
    * O(types × calendar) daily frame; the lag is an integer-day
    * self-join (gap-proof where lag(7) over sparse days silently
    * misaligns — the R85 lesson). sMAPE terms are floor-quantized ppm
    * BEFORE summing, so the mean is an exact integer both engines
    * agree on; days without a 7-back actual are excluded (honest
    * undefined, not zero-filled). */
  def seasonalNaiveBacktest(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type").as("t"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val fc = daily.select(col("t").as("ft"), (col("day") + 7).as("fday"),
      col("n").as("forecast"))
    daily.join(fc, col("t") === col("ft") && col("day") === col("fday"))
      .withColumn("smape_q",
        expr("(abs(n - forecast) * 2000000) div (n + forecast)"))
      .groupBy("t")
      .agg(count(lit(1)).as("n_days"),
        expr("sum(smape_q) div count(1)").as("mean_smape_q"),
        sum(abs(col("n") - col("forecast"))).as("total_abs_err"))
      .orderBy("t")
  }

  val qSeasonalBacktest = QueryDef(
    "q_seasonal_backtest",
    (s, d) => seasonalNaiveBacktest(s, d),
    Some("""WITH daily AS (
              SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            j AS (SELECT a.t, a.day, a.n, f.n AS forecast,
                    (abs(a.n - f.n) * 2000000) // (a.n + f.n) AS smape_q
                  FROM daily a JOIN daily f
                    ON a.t = f.t AND a.day = f.day + 7)
            SELECT t, CAST(count(*) AS BIGINT) AS n_days,
                   CAST(SUM(smape_q) // count(*) AS BIGINT) AS mean_smape_q,
                   CAST(SUM(abs(n - forecast)) AS BIGINT) AS total_abs_err
            FROM j GROUP BY t ORDER BY t"""))

  /** R113 — funnel time-to-convert: for users completing the full
    * view→click→purchase funnel, the latency of each stage transition
    * and end-to-end, summarized per transition with exact min / median
    * (the R107 doubled-median so even counts stay integer) / max and
    * the mean in exact integer µs. The stage times come from R38's
    * earliest-completion definitions, so "latency" is well-defined
    * (first qualifying event after the previous stage); the summary
    * runs on O(converting users) rows. */
  def funnelLatency(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val view = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t_view"))
    val click = ev.filter(col("event_type") === "click")
      .join(view, "user_id")
      .filter(unix_micros(col("ts")) > col("t_view"))
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("t_click"),
        first(col("t_view")).as("t_view"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(click, "user_id")
      .filter(unix_micros(col("ts")) > col("t_click"))
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("t_buy"),
        first(col("t_click")).as("t_click"),
        first(col("t_view")).as("t_view"))
    val lat = purchase.select(col("user_id"),
      (col("t_click") - col("t_view")).as("view_to_click"),
      (col("t_buy") - col("t_click")).as("click_to_buy"),
      (col("t_buy") - col("t_view")).as("end_to_end"))
    val long = lat.select(col("user_id"),
      expr("stack(3, 'view_to_click', view_to_click, " +
        "'click_to_buy', click_to_buy, 'end_to_end', end_to_end) " +
        "AS (transition, us)"))
    val w = Window.partitionBy("transition").orderBy("us", "user_id")
    long
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("transition")))
      .withColumn("mid_contrib",
        expr("CASE WHEN rn = (n + 1) div 2 THEN us ELSE 0 END + " +
          "CASE WHEN rn = n div 2 + 1 THEN us ELSE 0 END"))
      .groupBy("transition")
      .agg(first(col("n")).as("n_users"),
        min("us").as("min_us"),
        sum(col("mid_contrib")).as("med2_us"),
        max("us").as("max_us"),
        expr("sum(us) div count(1)").as("mean_us"))
      .orderBy("transition")
  }

  val qFunnelLatency = QueryDef(
    "q_funnel_latency",
    (s, d) => funnelLatency(s, d),
    Some("""WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t_view
              FROM events WHERE event_type = 'view' GROUP BY 1),
            c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_click,
                    ANY_VALUE(v.t_view) AS t_view
                  FROM events e JOIN v ON e.user_id = v.user_id
                  WHERE e.event_type = 'click'
                    AND epoch_us(e.ts) > v.t_view
                  GROUP BY 1),
            p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_buy,
                    ANY_VALUE(c.t_click) AS t_click,
                    ANY_VALUE(c.t_view) AS t_view
                  FROM events e JOIN c ON e.user_id = c.user_id
                  WHERE e.event_type = 'purchase'
                    AND epoch_us(e.ts) > c.t_click
                  GROUP BY 1),
            long AS (
              SELECT user_id, 'view_to_click' AS transition,
                     t_click - t_view AS us FROM p
              UNION ALL
              SELECT user_id, 'click_to_buy', t_buy - t_click FROM p
              UNION ALL
              SELECT user_id, 'end_to_end', t_buy - t_view FROM p),
            r AS (SELECT *,
                    row_number() OVER (PARTITION BY transition
                      ORDER BY us, user_id) AS rn,
                    count(*) OVER (PARTITION BY transition) AS n
                  FROM long)
            SELECT transition, CAST(ANY_VALUE(n) AS BIGINT) AS n_users,
                   min(us) AS min_us,
                   CAST(SUM((CASE WHEN rn = (n + 1) // 2 THEN us ELSE 0 END)
                     + (CASE WHEN rn = n // 2 + 1 THEN us ELSE 0 END))
                     AS BIGINT) AS med2_us,
                   max(us) AS max_us,
                   CAST(SUM(us) // count(*) AS BIGINT) AS mean_us
            FROM r GROUP BY transition ORDER BY transition"""))

  /** R51 — per-key EWMA over event history (the feature-store /
    * monitoring smoother): acc = α·x + (1−α)·acc folded over the
    * time-ordered value sequence, α = 0.25 (exactly representable, so
    * the recurrence is bit-identical across engines — mirrored by
    * DuckDB's list_reduce, whose first-element seeding the Spark fold
    * reproduces with element_at + slice). The per-key collect is the
    * bounded-history valve class (sessionize/pack): per-entity
    * sequences, never the corpus, sit in one task. */
  def ewmaByUser(s: SparkSession, d: String, alpha: Double = 0.25): DataFrame = {
    val sorted = sort_array(collect_list(struct(
      unix_micros(col("ts")).as("t"), col("event_id"), col("value"))))
    val vals = transform(sorted, p => p.getField("value"))
    val ewma = aggregate(
      slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
      element_at(vals, 1),
      (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc)
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (floor(ewma * 1e6 + 0.5) / 1e6).as("ewma_q"))
      .orderBy("user_id")
  }

  val qEwma = QueryDef(
    "q_ewma",
    (s, d) => ewmaByUser(s, d),
    Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   floor(list_reduce(list(value ORDER BY ts, event_id),
                       (acc, x) -> CAST(0.25 AS DOUBLE) * x
                                 + CAST(0.75 AS DOUBLE) * acc)
                     * 1e6 + 0.5) / 1e6 AS ewma_q
            FROM events GROUP BY user_id ORDER BY user_id"""))

  /** R55 — rolling 7-day distinct users (DAU/WAU): for every calendar
    * day with activity, the distinct-user count of that day and of the
    * trailing 7-day window. The naive formulation re-scans the fact
    * once per window (or range-joins day spine × pairs — quadratic in
    * window length × days); this shape is linear: dedup to (user, day)
    * pairs once, fan each pair out map-side into the ≤ 7 windows it
    * can serve, then aggregate. Two keyed aggregations, no Expand
    * (countDistinct would Expand ×2 — instead the first groupBy
    * reduces to one row per (window_day, user) carrying min(offset),
    * the second counts rows and offset-0 rows), no re-scan per window.
    * At 100 TB the same plan holds with window length as the only
    * fan-out multiplier; for long windows (90-day MAU) the stored
    * per-day HLL sketch rollup (R40) replaces exact counting. */
  def rollingDistinct(s: SparkSession, d: String,
      windowDays: Int = 7): DataFrame = {
    val pairs = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val fanned = pairs
      .select(col("user_id"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"),
        col("day"))
      .select(col("user_id"), col("off"),
        date_add(col("day"), col("off")).as("window_day"))
    fanned
      .groupBy(col("window_day"), col("user_id"))
      .agg(min(col("off")).as("min_off"))
      .groupBy(col("window_day"))
      .agg(count(lit(1)).as("wau_7d"),
        count(when(col("min_off") === 0, lit(1))).as("dau"))
      // a window day is reported only if it had activity itself (its
      // trailing window otherwise describes a day outside the data)
      .filter(col("dau") >= 1)
      .select(col("window_day"), col("dau"), col("wau_7d"))
      .orderBy(col("window_day"))
  }

  val qRollingDistinct = QueryDef(
    "q_rolling_distinct",
    (s, d) => rollingDistinct(s, d),
    Some("""WITH pairs AS (
              SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
              FROM events),
            days AS (SELECT DISTINCT day FROM pairs)
            SELECT d.day AS window_day,
                   CAST(COUNT(DISTINCT CASE WHEN p.day = d.day
                     THEN p.user_id END) AS BIGINT) AS dau,
                   CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS wau_7d
            FROM days d
            JOIN pairs p ON p.day >= d.day - 6 AND p.day <= d.day
            GROUP BY d.day
            ORDER BY window_day"""))

  /** R133 — run-length encoding of per-key event streams: collapse
    * each user's consecutive repeats of the same event type into one
    * (type, run_length, start, end) row — the lossless compression of
    * bursty behavioral logs (a poll loop emitting 10,000 identical
    * pings becomes one row) and the input shape for burst analytics
    * ("longest uninterrupted view streak"). Classic gaps-and-islands:
    * a lag-inequality flags run starts, a running sum numbers runs,
    * one groupBy collapses — all three frames share the single
    * (user, time, id) hash exchange (the R50 discipline). Everything
    * integer/string-exact. */
  val qRunLength = QueryDef(
    "q_runlength",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"))
        .withColumn("new_run",
          when(lag(col("event_type"), 1).over(w).isNull ||
            lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("run_id", sum("new_run").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ev.groupBy(col("user_id"), col("run_id"))
        .agg(first(col("event_type")).as("event_type"),
          count(lit(1)).as("run_len"),
          min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"))
        .orderBy("user_id", "run_id")
    },
    Some("""WITH ev AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
                     CASE WHEN lag(event_type, 1) OVER w IS NULL
                            OR lag(event_type, 1) OVER w <> event_type
                          THEN 1 ELSE 0 END AS new_run
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
            r AS (SELECT *,
                    CAST(SUM(new_run) OVER (PARTITION BY user_id
                      ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS run_id
                  FROM ev)
            SELECT user_id, run_id, ANY_VALUE(event_type) AS event_type,
                   CAST(count(*) AS BIGINT) AS run_len,
                   CAST(MIN(ts_us) AS BIGINT) AS start_us,
                   CAST(MAX(ts_us) AS BIGINT) AS end_us
            FROM r GROUP BY 1, 2
            ORDER BY user_id, run_id"""))

  /** R132 — rolling distinct users from STORED daily sketches: the
    * 100 TB swap R55's Scaladoc promises, made real. One pass builds a
    * per-day HLL sketch (the stored artifact — at scale these live
    * beside the daily partition); every trailing 7-day WAU then
    * computes by merging 7 SKETCHES per day (`hll_union_agg` as a
    * window aggregate over the O(calendar) day frame) — raw events
    * are never re-touched and the (user, day) fan-out R55 pays per
    * query disappears. SELF-VERIFYING rows-only: R55's exact
    * windowed recount rides beside the estimate with rel_err per day
    * (the exact side is eval instrumentation; production reads only
    * sketches). The window is global but its frame is the bounded
    * O(calendar) day table — the sanctioned spine class. */
  val qRollingDistinctSketch = QueryDef(
    "q_rolling_distinct_sketch",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("window_day"))
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      val w = Window.orderBy("window_day").rowsBetween(-6, 0)
      val approx = daily
        .withColumn("usk", expr("hll_union_agg(sk)").over(w))
        .select(col("window_day"),
          expr("hll_sketch_estimate(usk)").as("wau_approx"))
      val exact = rollingDistinct(s, d)
        .select(col("window_day"), col("wau_7d").as("wau_exact"))
      approx.join(exact, "window_day")
        .withColumn("rel_err",
          round(abs(col("wau_approx") - col("wau_exact")) /
            col("wau_exact"), 4))
        .orderBy("window_day")
    },
    None)

  /** R60 — time-weighted average value per key (TWAP — the metric/
    * pricing read where a plain mean over-weights bursts: each sample
    * holds until the NEXT sample, so it weighs by its holding
    * duration). Interval durations come from one lead window on the
    * key's timeline (the R50/S2 partitioning, reused); products and
    * durations accumulate as exact DECIMAL(38,0) (value quantized to
    * 1e-6 first), one double division at the end — hash-exact across
    * engines and partitionings, the R59 determinism recipe. Keys with
    * a single event (no interval) or zero total duration drop
    * explicitly. */
  def twapByUser(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("next_us", lead(col("us"), 1).over(byUser))
      .filter(col("next_us").isNotNull)
      .select(col("user_id"),
        (col("next_us") - col("us")).cast("decimal(38,0)").as("dur"),
        floor(col("value") * 1e6).cast("decimal(38,0)").as("vq"))
      .groupBy("user_id")
      .agg(sum(col("vq") * col("dur")).as("wsum"),
        sum(col("dur")).as("dsum"),
        count(lit(1)).as("n_intervals"))
      .filter(col("dsum") > 0)
      .select(col("user_id"), col("n_intervals"),
        floor(col("wsum").cast("double") / col("dsum").cast("double"))
          .cast("long").as("twap_q"))
      .orderBy("user_id")
  }

  val qTwap = QueryDef(
    "q_twap",
    (s, d) => twapByUser(s, d),
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value
                       FROM events),
            w AS (SELECT *, lead(us) OVER (PARTITION BY user_id
                    ORDER BY us, event_id) AS next_us FROM e),
            i AS (SELECT user_id, CAST(next_us - us AS HUGEINT) AS dur,
                    CAST(floor(value * 1e6) AS HUGEINT) AS vq
                  FROM w WHERE next_us IS NOT NULL),
            a AS (SELECT user_id, SUM(vq * dur) AS wsum, SUM(dur) AS dsum,
                    CAST(count(*) AS BIGINT) AS n_intervals
                  FROM i GROUP BY user_id HAVING SUM(dur) > 0)
            SELECT user_id, n_intervals,
                   CAST(floor(CAST(wsum AS DOUBLE) / CAST(dsum AS DOUBLE))
                     AS BIGINT) AS twap_q
            FROM a ORDER BY user_id"""))

  /** R61 — cumulative-distinct growth curve (new-user acquisition):
    * per day, how many users were seen that day for the FIRST time,
    * and the running total of distinct users to date. The naive
    * cumulative count-distinct re-scans an ever-growing prefix per
    * day; this is linear: distinct-to-date ≡ count of per-user FIRST
    * days ≤ d — one user-keyed min aggregation, one day-keyed count,
    * one running sum over the O(#days) day table. Complement of R55:
    * trailing window there, cumulative-to-date here. The final window
    * runs on the day-count table (hundreds of rows), a documented
    * O(calendar) frame — not a data-scale funnel. */
  def cumulativeDistinct(s: SparkSession, d: String): DataFrame = {
    val firstSeen = Tables.events(s, d)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .groupBy("user_id").agg(min("hr").as("first_hr"))
    val perHour = firstSeen.groupBy(col("first_hr").as("hr"))
      .agg(count(lit(1)).as("new_users"))
    val wCum = Window.orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perHour
      .withColumn("total_users", sum("new_users").over(wCum))
      .orderBy("hr")
  }

  val qCumulativeDistinct = QueryDef(
    "q_cumulative_distinct",
    (s, d) => cumulativeDistinct(s, d),
    Some("""WITH f AS (
              SELECT user_id,
                     MIN(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS first_hr
              FROM events GROUP BY user_id),
            p AS (SELECT first_hr AS hr,
                    CAST(count(*) AS BIGINT) AS new_users
                  FROM f GROUP BY first_hr)
            SELECT hr, new_users,
                   CAST(SUM(new_users) OVER (ORDER BY hr
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS total_users
            FROM p ORDER BY hr"""))

  val TopPaths = 25

  /** R78 — frequent event paths: the top 3-step journeys across all
    * user timelines (the Sankey/path-analysis read behind "what do
    * users actually do"). Trigrams come from two lead() frames over
    * ONE user-keyed ordering — the R41/R44 window family: a single
    * hash exchange on user_id, linear per-key work, no sequence
    * materialization or per-user collect. Tie order inside a
    * timestamp is pinned by event_id so paths are deterministic. */
  val qEventPaths = QueryDef(
    "q_event_paths",
    (s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      graft.Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("e2", lead("event_type", 1).over(w))
        .withColumn("e3", lead("event_type", 2).over(w))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("path"))
        .limit(TopPaths)
    },
    Some(s"""WITH seq AS (SELECT user_id, event_type,
                       lead(event_type, 1) OVER w AS e2,
                       lead(event_type, 2) OVER w AS e3
                     FROM events
                     WINDOW w AS (PARTITION BY user_id
                       ORDER BY ts, event_id)),
             p AS (SELECT event_type || '>' || e2 || '>' || e3 AS path
                   FROM seq WHERE e3 IS NOT NULL)
             SELECT path, CAST(count(*) AS BIGINT) AS n
             FROM p GROUP BY 1
             ORDER BY n DESC, path LIMIT $TopPaths"""))

  /** R81 — seasonality profile: the day-of-week × hour-of-day traffic
    * grid with each cell's share and its LIFT over the independence
    * expectation (dow-marginal × hour-marginal) — the heatmap that
    * separates "Mondays are busy" from "Monday 9am specifically
    * spikes". One 168-key aggregation; every window after runs on the
    * O(168) frame. Shares/lifts are ppm integers off exact counts
    * (marginal products ride one double division at the end, same
    * fixed sequence both engines). Day numbering pinned to
    * Sunday = 0 (Spark dayofweek−1 ≡ DuckDB dayofweek). */
  val qSeasonality = QueryDef(
    "q_seasonality",
    (s, d) => {
      val per = graft.Tables.events(s, d)
        .groupBy((dayofweek(col("ts")) - 1).as("dow"),
          hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
      val wAll = Window.partitionBy(lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wDow = Window.partitionBy("dow")
      val wHr = Window.partitionBy("hr")
      per
        .withColumn("tot", sum("n").over(wAll))
        .withColumn("n_dow", sum("n").over(wDow))
        .withColumn("n_hr", sum("n").over(wHr))
        .select(col("dow"), col("hr"), col("n"),
          expr("(n * 1000000) div tot").as("share_q"),
          floor(col("n").cast("double") * col("tot").cast("double")
            / (col("n_dow").cast("double") * col("n_hr").cast("double"))
            * 1e6).cast("long").as("lift_q"))
        .orderBy("dow", "hr")
    },
    Some("""WITH per AS (SELECT dayofweek(ts) AS dow, hour(ts) AS hr,
                           CAST(count(*) AS BIGINT) AS n
                         FROM events GROUP BY 1, 2),
             w AS (SELECT dow, hr, n,
                     SUM(n) OVER () AS tot,
                     SUM(n) OVER (PARTITION BY dow) AS n_dow,
                     SUM(n) OVER (PARTITION BY hr) AS n_hr
                   FROM per)
             SELECT CAST(dow AS INT) AS dow, CAST(hr AS INT) AS hr, n,
                    CAST((n * 1000000) // tot AS BIGINT) AS share_q,
                    CAST(floor(CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)
                      / (CAST(n_dow AS DOUBLE) * CAST(n_hr AS DOUBLE))
                      * 1e6) AS BIGINT) AS lift_q
             FROM w ORDER BY dow, hr"""))

  /** R89 — additive time-series decomposition of the daily event
    * rate: trend (centered 7-day moving average), day-of-week
    * seasonal component (mean detrended value per dow), and residual
    * — the classical decomposition behind "is this dip weekly
    * rhythm or a real drop". Everything runs on the O(calendar)
    * daily aggregate; every component is INTEGER ppm arithmetic
    * (sums div counts), so no float accumulation exists anywhere:
    * n·1e6 = trend_q + seasonal_q + resid_q holds as an exact
    * integer identity wherever the trend is defined. Edge days
    * (incomplete 7-day window) carry NULL trend/residual — honest
    * undefinedness, not zero-padding. */
  val qDecompose = QueryDef(
    "q_decompose",
    (s, d) => {
      val daily = graft.Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w7 = Window.orderBy("day").rowsBetween(-3, 3)
      val trended = daily
        .withColumn("win_n", count(lit(1)).over(w7))
        .withColumn("trend_q",
          when(col("win_n") === 7,
            expr("(sum(n) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING "
              + "AND 3 FOLLOWING) * 1000000) div 7")))
        .withColumn("dow", dayofweek(col("day")) - 1)
      val wDow = Window.partitionBy("dow")
      trended
        .withColumn("seasonal_q",
          expr("CASE WHEN count(trend_q) OVER (PARTITION BY dow) > 0 "
            + "THEN sum(CASE WHEN trend_q IS NOT NULL THEN n * 1000000 - "
            + "trend_q END) OVER (PARTITION BY dow) div "
            + "count(trend_q) OVER (PARTITION BY dow) END"))
        .select(col("day"), col("n"), col("trend_q"), col("seasonal_q"),
          (col("n") * 1000000L - col("trend_q") - col("seasonal_q"))
            .as("resid_q"))
        .orderBy("day")
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                             CAST(count(*) AS BIGINT) AS n
                           FROM events GROUP BY 1),
             t AS (SELECT day, n,
                     CASE WHEN count(*) OVER w7 = 7 THEN
                       CAST((SUM(n) OVER w7 * 1000000) // 7 AS BIGINT)
                     END AS trend_q,
                     dayofweek(day) AS dow
                   FROM daily
                   WINDOW w7 AS (ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             ss AS (SELECT *,
                      CASE WHEN count(trend_q) OVER (PARTITION BY dow) > 0
                        THEN CAST(SUM(CASE WHEN trend_q IS NOT NULL THEN
                            n * 1000000 - trend_q END)
                          OVER (PARTITION BY dow)
                          // count(trend_q) OVER (PARTITION BY dow)
                          AS BIGINT)
                      END AS seasonal_q
                    FROM t)
             SELECT day, n, trend_q, seasonal_q,
                    CAST(n * 1000000 - trend_q - seasonal_q AS BIGINT)
                      AS resid_q
             FROM ss ORDER BY day"""))

  /** R107 — rolling median smoother: centered 7-day MEDIAN of the
    * per-type daily rate — the robust alternative to the moving mean
    * (one outage spike drags a mean window for a week; the median
    * shrugs it off). Exact selection, not a sketch: the window's
    * values collect into a sorted array (frame width is a CONSTANT 7 —
    * per-row state is O(window), the bounded-frame valve) and the
    * median reads by index. Emitted as med2 = lower-middle +
    * upper-middle (= 2× median, integer-exact for even and odd widths
    * alike — no .5 float ever exists to diverge on). Edge windows
    * compute over their honest smaller width, flagged by win_n. */
  val qRollingMedian = QueryDef(
    "q_rolling_median",
    (s, d) => {
      val daily = graft.Tables.events(s, d)
        .groupBy(col("event_type").as("t"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w7 = Window.partitionBy("t").orderBy("day").rowsBetween(-3, 3)
      daily
        .withColumn("arr", array_sort(collect_list(col("n")).over(w7)))
        .select(col("t"), col("day"), col("n"),
          size(col("arr")).as("win_n"),
          (element_at(col("arr"), expr("CAST((size(arr) + 1) div 2 AS INT)")) +
            element_at(col("arr"), expr("CAST(size(arr) div 2 + 1 AS INT)")))
            .as("med2"))
        .orderBy("t", "day")
    },
    Some("""WITH daily AS (
              SELECT event_type AS t, CAST(ts AS DATE) AS day,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            w AS (SELECT t, day, n,
                    list_sort(list(n) OVER w7) AS arr
                  FROM daily
                  WINDOW w7 AS (PARTITION BY t ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
            SELECT t, day, n, CAST(len(arr) AS INT) AS win_n,
                   CAST(arr[(len(arr) + 1) // 2]
                      + arr[len(arr) // 2 + 1] AS BIGINT) AS med2
            FROM w ORDER BY t, day"""))

  /** R90 — CUSUM changepoint detection per event type: the sequential
    * control-chart statistic S_t = max(0, S_{t−1} + (x_t − μ − slack))
    * that accumulates evidence of a LEVEL SHIFT and alarms when it
    * crosses a threshold — what R44's per-point z-scores cannot see
    * (each day individually normal, the run jointly anomalous). The
    * recurrence LOOKS sequential, but max(0, ·) folds admit a closed
    * form: with deltas d_i = x_i − μ − slack and prefix sums
    * P_i = Σ_{j≤i} d_j, the fold equals S_i = P_i − min(0, min_{j≤i}
    * P_j) — so the whole statistic is TWO ordered window passes over
    * one keyed sort (running sum, running min), no recursion at all.
    * Earlier rounds ran this as Spark's recursive CTE: correct, but
    * ~30 sequential micro-join steps of scheduler latency (adjudicated
    * at 2.8–3.7 s; the closed form re-measures at ~0.5 s and has no
    * depth limit at 100 TB). The ORACLE keeps the recursive-fold
    * formulation — the two derivations agreeing hash-exactly is a
    * cross-formulation gate, not just a mirror. Every term stays
    * exact integer ppm; alarm threshold 2μ. */
  val qCusum = QueryDef(
    "q_cusum",
    (s, d) => {
      val w = Window.partitionBy("t").orderBy("day")
      graft.Tables.events(s, d)
        .groupBy(col("event_type").as("t"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
        .withColumn("m",
          expr("(sum(x) OVER (PARTITION BY t) * 1000000) div "
            + "count(1) OVER (PARTITION BY t)"))
        .withColumn("k", expr("m div 4"))
        .withColumn("p",
          sum(col("x") * lit(1000000L) - col("m") - col("k")).over(w))
        .withColumn("s",
          col("p") - least(lit(0L), min(col("p")).over(w)))
        .select(col("t").as("event_type"), col("day"), col("x").as("n"),
          col("s").as("s_q"), (col("s") > col("m") * 2).as("alarm"))
        .orderBy("event_type", "day")
    },
    Some("""WITH RECURSIVE base AS (SELECT event_type AS t, CAST(ts AS DATE) AS day,
                            CAST(count(*) AS BIGINT) AS x
                          FROM events GROUP BY 1, 2),
             v AS (SELECT t, day, x,
                     CAST(row_number() OVER (PARTITION BY t ORDER BY day)
                       AS BIGINT) AS idx,
                     CAST((SUM(x) OVER (PARTITION BY t) * 1000000)
                       // COUNT(*) OVER (PARTITION BY t) AS BIGINT) AS m,
                     CAST((SUM(x) OVER (PARTITION BY t) * 1000000)
                       // COUNT(*) OVER (PARTITION BY t) // 4 AS BIGINT)
                       AS k
                   FROM base),
             c(t, idx, day, x, m, s) AS (
                 SELECT t, idx, day, x, m,
                        GREATEST(0, x * 1000000 - m - k)
                 FROM v WHERE idx = 1
                 UNION ALL
                 SELECT v.t, v.idx, v.day, v.x, v.m,
                        GREATEST(0, c.s + (v.x * 1000000 - v.m - v.k))
                 FROM c JOIN v ON v.t = c.t AND v.idx = c.idx + 1
             )
             SELECT t AS event_type, day, x AS n,
                    CAST(s AS BIGINT) AS s_q, s > 2 * m AS alarm
             FROM c ORDER BY t, day"""))

  /** R155 — session entry/exit + bounce-rate report (the classic web-
    * analytics landing-page read): sessions are S2's gap definition
    * (same 30-min [[graft.streaming.EventOps.SessionGapMinutes]]
    * boundary, same lag/cumsum construction, so "session" means ONE
    * thing across the whole engine); per session the ENTRY event type
    * (first by the total (ts, event_id) order), the EXIT type (last),
    * the event count and the exact integer-µs duration; rolled up per
    * entry type: sessions, bounces (single-event sessions),
    * bounce-rate ppm, mean duration µs — "which entry points lose
    * users immediately".
    *
    * Scale: the session construction and BOTH first/last lookups ride
    * the single (user, time, id) hash exchange (two frames over one
    * window ordering + a min/max struct pair in the session
    * aggregation — never a per-session re-scan); the report aggregates
    * the O(sessions) frame down to O(event types). All integers, fully
    * oracle-mirrorable. The DuckDB mirror reads the endpoints off the
    * SAME window sort instead (the session-start flag marks the entry
    * row, its lead marks the exit row — exactly one of each per
    * session), because DuckDB's min/max over packed structs blows the
    * sf1 memory budget while the flag form verifies in under a
    * second. */
  val qBounceRate = QueryDef(
    "q_bounce_rate",
    (s, d) => {
      val gapUs = graft.streaming.EventOps.SessionGapMinutes * 60L * 1000000L
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      val flagged = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag("us", 1).over(w))
        .withColumn("new_session",
          when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_seq",
          sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      val sessions = flagged.groupBy("user_id", "session_seq").agg(
        count(lit(1)).as("n_events"),
        min(struct(col("us"), col("event_id"), col("event_type"))).as("first"),
        max(struct(col("us"), col("event_id"), col("event_type"))).as("last"))
        .select(col("first.event_type").as("entry_type"),
          col("last.event_type").as("exit_type"),
          col("n_events"),
          (col("last.us") - col("first.us")).as("dur_us"))
      sessions.groupBy("entry_type").agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, lit(1L)).otherwise(lit(0L))).as("n_bounce"),
        sum(when(col("entry_type") === col("exit_type"), lit(1L)).otherwise(lit(0L)))
          .as("n_same_exit"),
        sum("dur_us").as("sum_dur_us"))
        .withColumn("bounce_ppm", expr("(n_bounce * 1000000) div n_sessions"))
        .withColumn("mean_dur_us", expr("sum_dur_us div n_sessions"))
        .select(col("entry_type"), col("n_sessions"), col("n_bounce"),
          col("bounce_ppm"), col("n_same_exit"), col("mean_dur_us"))
        .orderBy("entry_type")
    },
    Some(s"""WITH x AS (
               SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                      lag(epoch_us(ts)) OVER (PARTITION BY user_id
                        ORDER BY epoch_us(ts), event_id) AS prev_us
               FROM events),
             y AS (SELECT *, CASE WHEN prev_us IS NULL
                       OR us - prev_us > ${graft.streaming.EventOps.SessionGapMinutes * 60L * 1000000L}
                     THEN 1 ELSE 0 END AS new_session
                   FROM x),
             z AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                     ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS session_seq,
                     lead(new_session, 1, 1) OVER (PARTITION BY user_id
                       ORDER BY us, event_id) AS next_new
                   FROM y),
             flat AS (
               SELECT user_id, session_seq,
                      CAST(count(*) AS BIGINT) AS n_events,
                      max(CASE WHEN new_session = 1 THEN event_type END)
                        AS entry_type,
                      max(CASE WHEN next_new = 1 THEN event_type END)
                        AS exit_type,
                      max(CASE WHEN next_new = 1 THEN us END)
                        - max(CASE WHEN new_session = 1 THEN us END) AS dur_us
               FROM z GROUP BY 1, 2)
             SELECT entry_type,
                    CAST(count(*) AS BIGINT) AS n_sessions,
                    CAST(count(*) FILTER (WHERE n_events = 1) AS BIGINT) AS n_bounce,
                    (CAST(count(*) FILTER (WHERE n_events = 1) AS BIGINT) * 1000000)
                      // CAST(count(*) AS BIGINT) AS bounce_ppm,
                    CAST(count(*) FILTER (WHERE entry_type = exit_type) AS BIGINT)
                      AS n_same_exit,
                    CAST(SUM(dur_us) AS BIGINT) // CAST(count(*) AS BIGINT)
                      AS mean_dur_us
             FROM flat GROUP BY 1 ORDER BY 1"""))

  /** R156 — exponentially time-decayed leaderboard (freshness
    * ranking): each user's activity score is Σ 2^(−age/half-life)
    * over their events — the trending/engagement read where a plain
    * count ranks a long-dead heavy user above a currently-active one;
    * 7-day half-life, ages against the corpus's max event time (a
    * 1-row broadcast). Exactness: ages quantize to whole DAYS and the
    * per-day decay constants floor(2^(−d/7)·1e9) are precomputed ONCE
    * here and injected as the SAME integer array literal into both
    * engines — no transcendental is ever evaluated independently by
    * two libms (JVM Math.exp vs DuckDB's libm can diverge by an ulp,
    * and at a floor() boundary one ulp flips the quantized weight —
    * the exact cross-engine flake the repo's integer-exact convention
    * exists to exclude). From day 210 on the quantized weight
    * is 0 (floor(2^(-210/7)*1e9) = 0), so the table is bounded at
    * 211 entries and older events contribute exactly nothing. The integer sum is
    * order-free → ranking deterministic at any parallelism (ties
    * break on user_id). One user-keyed aggregation + a sort-limit
    * top-k, never a global window. */
  val DecayDays: IndexedSeq[Long] = (0 to 210).map(d =>
    math.floor(math.pow(2.0, -d / 7.0) * 1e9).toLong)

  val qDecayedTopk = QueryDef(
    "q_decayed_topk",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val tMax = ev.agg(max("us").as("t_max"))
      val dayUs = 86400L * 1000000L
      ev.crossJoin(broadcast(tMax))
        .withColumn("age_d",
          least(expr(s"(t_max - us) div $dayUs"), lit(210L)).cast("int"))
        .withColumn("w_q9",
          element_at(lit(DecayDays.toArray), col("age_d") + 1))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("w_q9").as("score_q9"))
        .orderBy(desc("score_q9"), asc("user_id"))
        .limit(20)
    },
    Some(s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
             t AS (SELECT CAST(max(us) AS BIGINT) AS t_max FROM ev),
             w AS (SELECT user_id,
                     ([${DecayDays.mkString(",")}])
                       [LEAST((t_max - us) // ${86400L * 1000000L}, 210) + 1]
                       AS w_q9
                   FROM ev CROSS JOIN t)
             SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                    CAST(SUM(w_q9) AS BIGINT) AS score_q9
             FROM w GROUP BY 1
             ORDER BY score_q9 DESC, user_id ASC LIMIT 20"""))

  val all: Seq[QueryDef] = Seq(qBounceRate, qDecayedTopk, qFunnel, qFunnelWindowed, qCohortRetention,
    qEventTransitions, qRateAnomalies, qAttribution, qIntervalMerge,
    qIntervalOverlap, qEventRegex, qForwardFill, qLocalDayRollup,
    qRollingMedian, qSinceAnchor, qSeasonalBacktest, qFunnelLatency, qEwma,
    qRollingDistinct, qRollingDistinctSketch, qRunLength,
    qAttributionCompare, qIsolatedEvents, qTwap,
    qCumulativeDistinct, qEventPaths, qSeasonality,
    qDecompose, qCusum)
}
