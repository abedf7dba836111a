package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** R72/R73/R74 — feature-engineering transforms: leave-one-out target
  * encoding, per-group standard + robust feature scaling, and lagged
  * autocorrelation of event-rate series. The reference's enrichment
  * transform (Net7-ETL-Bus DataflowProcessor.cs — per-record derived
  * columns before load) generalized to the statistical encodings an
  * ML feature pipeline derives in-engine.
  *
  * Hash-exactness discipline throughout: doubles are quantized to
  * integer cents/ppm units BEFORE aggregation wherever a sum crosses
  * rows (exact DECIMAL/BIGINT accumulation is merge-order-free), and
  * any remaining double arithmetic is a fixed operation sequence over
  * exact integers — identical bit-for-bit in Spark and the oracle.
  */
object Features {

  /** R72 — leave-one-out target encoding of customer market segment
    * against the "order is urgent" outcome. LOO removes the row's own
    * label from its category mean — the standard leakage guard that a
    * plain group-mean encoding fails (each row would see its own
    * target). Encoded value stays integer: (Σy − y)·1e6 div (n−1);
    * singleton categories emit NULL (no peers to average). One
    * bounded groupBy + one broadcast join-back; the output sample is
    * a deterministic keyspace slice so the entry's row count stays
    * audit-sized at any SF. */
  val qTargetEncode = QueryDef(
    "q_target_encode",
    (s, d) => {
      val rows = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("segment"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
            .as("y"))
      val stats = rows.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum("y").as("sy"))
      rows.join(broadcast(stats), "segment")
        .filter(col("o_orderkey") % 29 === 0)
        .select(col("o_orderkey"), col("segment"), col("y"),
          when(col("n") > 1,
            expr("((sy - y) * 1000000) div (n - 1)")).as("loo_q"))
        .orderBy("o_orderkey")
    },
    Some("""WITH rows_ AS (SELECT o_orderkey, c.c_mktsegment AS segment,
                             CASE WHEN o_orderpriority = '1-URGENT'
                               THEN 1 ELSE 0 END AS y
                           FROM orders o
                           JOIN customer c ON o.o_custkey = c.c_custkey),
             st AS (SELECT segment, CAST(count(*) AS BIGINT) AS n,
                      CAST(SUM(y) AS BIGINT) AS sy
                    FROM rows_ GROUP BY 1)
             SELECT o_orderkey, r.segment, CAST(y AS BIGINT) AS y,
                    CASE WHEN n > 1 THEN
                      CAST(((sy - y) * 1000000) // (n - 1) AS BIGINT)
                    END AS loo_q
             FROM rows_ r JOIN st ON r.segment = st.segment
             WHERE o_orderkey % 29 = 0
             ORDER BY o_orderkey"""))

  /** R73 — per-group feature scaling: z-score from exact DECIMAL
    * moment sums (population σ, one fixed double sequence at the
    * end) and robust (x − median)/IQR from three exact rank-arithmetic
    * quantile passes — the outlier-resistant scaling a skewed feature
    * needs where z-scores let the tail set its own yardstick. Stats
    * ride broadcast join-backs; the emitted rows are a deterministic
    * keyspace slice. */
  val qFeatureScale = QueryDef(
    "q_feature_scale",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag").as("g"),
        floor(col("l_quantity") * 100 + 0.5).cast("long").as("xc"))
      val moments = li.groupBy("g").agg(count(lit(1)).as("n"),
        sum(col("xc").cast("decimal(38,0)")).as("sx"),
        sum((col("xc") * col("xc")).cast("decimal(38,0)")).as("sxx"))
      val dli = li.withColumn("x", col("xc").cast("double"))
      val med = Relational.exactQuantile(dli, "g", "x", 0.5, "med")
        .select("g", "med")
      val p25 = Relational.exactQuantile(dli, "g", "x", 0.25, "p25")
        .select("g", "p25")
      val p75 = Relational.exactQuantile(dli, "g", "x", 0.75, "p75")
        .select("g", "p75")
      li.join(broadcast(moments), "g").join(broadcast(med), "g")
        .join(broadcast(p25), "g").join(broadcast(p75), "g")
        .filter(col("l_orderkey") % 97 === 0)
        .withColumn("mean", col("sx").cast("double") / col("n"))
        .withColumn("std",
          sqrt((col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
            / (col("n").cast("double") * col("n").cast("double"))))
        .withColumn("iqr", col("p75") - col("p25"))
        .select(col("g"), col("l_orderkey"), col("l_linenumber"),
          col("xc"),
          floor((col("xc").cast("double") - col("mean")) / col("std")
            * 1e4).cast("long").as("z_q"),
          when(col("iqr") > 0,
            floor((col("xc").cast("double") - col("med")) / col("iqr")
              * 1e4).cast("long")).as("robust_q"))
        .orderBy("g", "l_orderkey", "l_linenumber")
    },
    Some("""WITH li AS (SELECT l_orderkey, l_linenumber,
                          l_returnflag AS g,
                          CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
                            AS xc
                        FROM lineitem),
             mo AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                      SUM(xc) AS sx, SUM(xc * xc) AS sxx
                    FROM li GROUP BY 1),
             rk AS (SELECT g, CAST(xc AS DOUBLE) AS x,
                      row_number() OVER (PARTITION BY g ORDER BY
                        CAST(xc AS DOUBLE)) AS r,
                      count(*) OVER (PARTITION BY g) AS n
                    FROM li),
             qq AS (SELECT g,
                      MAX(CASE WHEN r = floor(1.0 + (n-1) * 0.5) THEN x END)
                        AS m_lo,
                      MAX(CASE WHEN r = ceil(1.0 + (n-1) * 0.5) THEN x END)
                        AS m_hi,
                      MAX(CASE WHEN r = floor(1.0 + (n-1) * 0.25) THEN x END)
                        AS q1_lo,
                      MAX(CASE WHEN r = ceil(1.0 + (n-1) * 0.25) THEN x END)
                        AS q1_hi,
                      MAX(CASE WHEN r = floor(1.0 + (n-1) * 0.75) THEN x END)
                        AS q3_lo,
                      MAX(CASE WHEN r = ceil(1.0 + (n-1) * 0.75) THEN x END)
                        AS q3_hi,
                      MAX(n) AS n
                    FROM rk GROUP BY g),
             qv AS (SELECT g,
                      m_lo + (m_hi - m_lo) * ((1.0 + (n-1) * 0.5)
                        - floor(1.0 + (n-1) * 0.5)) AS med,
                      q1_lo + (q1_hi - q1_lo) * ((1.0 + (n-1) * 0.25)
                        - floor(1.0 + (n-1) * 0.25)) AS p25,
                      q3_lo + (q3_hi - q3_lo) * ((1.0 + (n-1) * 0.75)
                        - floor(1.0 + (n-1) * 0.75)) AS p75
                    FROM qq)
             SELECT li.g, l_orderkey, l_linenumber, xc,
                    CAST(floor((CAST(xc AS DOUBLE)
                      - CAST(sx AS DOUBLE) / n)
                      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                      * 1e4) AS BIGINT) AS z_q,
                    CASE WHEN p75 - p25 > 0 THEN
                      CAST(floor((CAST(xc AS DOUBLE) - med) / (p75 - p25)
                        * 1e4) AS BIGINT)
                    END AS robust_q
             FROM li JOIN mo ON li.g = mo.g JOIN qv ON li.g = qv.g
             WHERE l_orderkey % 97 = 0
             ORDER BY li.g, l_orderkey, l_linenumber"""))

  /** R74 — lagged autocorrelation of per-type daily event counts
    * (lag 1 and lag 7): does yesterday / the same weekday predict
    * today — the seasonality read behind anomaly thresholds and
    * forecast features. The series is the (type, day) aggregate, so
    * everything past the first count is O(types × calendar). Pearson r
    * from exact BIGINT co-moment sums over the lag-joined pairs
    * (closed form, one double conversion at the end) — not the float
    * corr aggregate, whose merge order is nondeterministic. */
  val qAutocorr = QueryDef(
    "q_autocorr",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      def ac(lagDays: Int, out: String) = {
        val a = daily.select(col("event_type"), col("day"), col("c").as("x"))
        val b = daily.select(col("event_type"),
          date_add(col("day"), lagDays).as("day"), col("c").as("y"))
        a.join(b, Seq("event_type", "day"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("event_type"), col("n").as(s"n_$out"),
            floor((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double")
              / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")
                * (col("n") * col("syy") - col("sy") * col("sy"))
                  .cast("double")) * 1e6)
              .cast("long").as(out))
      }
      ac(1, "ac1_q").join(ac(7, "ac7_q"), "event_type")
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                             CAST(count(*) AS BIGINT) AS c
                           FROM events GROUP BY 1, 2),
             l1 AS (SELECT a.event_type, CAST(count(*) AS BIGINT) AS n,
                      SUM(a.c) AS sx, SUM(b.c) AS sy,
                      SUM(a.c * b.c) AS sxy, SUM(a.c * a.c) AS sxx,
                      SUM(b.c * b.c) AS syy
                    FROM daily a JOIN daily b
                      ON a.event_type = b.event_type
                      AND a.day = b.day + 1
                    GROUP BY 1),
             l7 AS (SELECT a.event_type, CAST(count(*) AS BIGINT) AS n,
                      SUM(a.c) AS sx, SUM(b.c) AS sy,
                      SUM(a.c * b.c) AS sxy, SUM(a.c * a.c) AS sxx,
                      SUM(b.c * b.c) AS syy
                    FROM daily a JOIN daily b
                      ON a.event_type = b.event_type
                      AND a.day = b.day + 7
                    GROUP BY 1),
             r1 AS (SELECT event_type, n AS n_ac1_q,
                      CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                        / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE)) * 1e6)
                        AS BIGINT) AS ac1_q
                    FROM l1),
             r7 AS (SELECT event_type, n AS n_ac7_q,
                      CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                        / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE)) * 1e6)
                        AS BIGINT) AS ac7_q
                    FROM l7)
             SELECT r1.event_type, r1.n_ac1_q, r1.ac1_q,
                    r7.n_ac7_q, r7.ac7_q
             FROM r1 JOIN r7 ON r1.event_type = r7.event_type
             ORDER BY r1.event_type"""))

  /** R142 — cross-correlation between two metric series at several
    * leads: does VIEW volume today predict PURCHASE volume in k days?
    * R74 correlates a series with its own past; this correlates two
    * DIFFERENT series across leads — the cheap lead-indicator scan
    * run before anyone builds a forecasting model. Both series are
    * O(calendar) daily aggregates; each lead is an integer-day
    * equi-join between them (gap-proof, the R85 rule) and Pearson r
    * comes from the R74 exact-BIGINT co-moment recipe — one double
    * conversion, one division, floor-quantized. The lead-0 row is the
    * contemporaneous baseline the lagged rows are read against. */
  val qCrossCorrelation = QueryDef(
    "q_cross_correlation",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // one aggregation feeds all lead joins
      val x = daily.filter(col("event_type") === "view")
        .select(col("day"), col("c").as("x"))
      val y = daily.filter(col("event_type") === "purchase")
        .select(col("day").as("yday"), col("c").as("y"))
      def lead(k: Int) =
        x.join(y, date_add(col("day"), k) === col("yday"))
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(lit(k.toLong).as("lead_days"), col("n"),
            floor((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double")
              / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")
                * (col("n") * col("syy") - col("sy") * col("sy"))
                  .cast("double")) * 1e6)
              .cast("long").as("r_q"))
      lead(0).unionByName(lead(1)).unionByName(lead(7))
        .orderBy("lead_days")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                             CAST(count(*) AS BIGINT) AS c
                           FROM events GROUP BY 1, 2),
            x AS (SELECT day, c AS x FROM daily
                  WHERE event_type = 'view'),
            y AS (SELECT day AS yday, c AS y FROM daily
                  WHERE event_type = 'purchase'),
            l AS (SELECT k.lead_days, CAST(count(*) AS BIGINT) AS n,
                    SUM(x.x) AS sx, SUM(y.y) AS sy,
                    SUM(x.x * y.y) AS sxy, SUM(x.x * x.x) AS sxx,
                    SUM(y.y * y.y) AS syy
                  FROM (SELECT unnest([0, 1, 7]) AS lead_days) k
                  JOIN x ON true
                  JOIN y ON x.day + CAST(k.lead_days AS INT) = y.yday
                  GROUP BY 1)
            SELECT CAST(lead_days AS BIGINT) AS lead_days, n,
                   CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                       * CAST(n * syy - sy * sy AS DOUBLE)) * 1e6)
                     AS BIGINT) AS r_q
            FROM l ORDER BY lead_days"""))

  /** D83 — point-in-time-correct training-matrix assembly: one row per
    * label event (a purchase), every feature computed from the user's
    * history STRICTLY BEFORE that label — leakage-proof BY FRAME
    * CONSTRUCTION: all features share one window whose frame ends at
    * the preceding row (`rowsBetween(unboundedPreceding, -1)`), so no
    * feature can see its own label's timestamp, let alone later data.
    * This is the read every supervised pipeline needs and most get
    * wrong with plain per-feature joins (a feature aggregated "per
    * user" over the whole table trains on the future; E13b answers
    * point-in-time for DIMENSIONS, this does it for BEHAVIORAL
    * aggregates).
    *
    * Features: prior event count, prior view count, last observed
    * value (cents-quantized), µs since the user's first event — all
    * exact integers over one (user, time, event_id)-ordered window
    * pass; the tie order is total, so "strictly before" is
    * well-defined even for same-timestamp events. ONE user-keyed hash
    * exchange for any number of features; per-user history is the
    * bounded sessionize/pack frame class. */
  val qFeatureMatrix = QueryDef(
    "q_feature_asof_matrix",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("val_c"))
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ev
        .withColumn("n_prior", count(lit(1)).over(w))
        // SUM over an empty frame is NULL per SQL; a count of prior
        // views is semantically 0 — coalesce in BOTH engines
        .withColumn("n_prior_views",
          coalesce(sum(when(col("event_type") === "view", 1L)
            .otherwise(0L)).over(w), lit(0L)))
        .withColumn("last_val_c", last(col("val_c"), ignoreNulls = true)
          .over(w))
        .withColumn("first_ts_us", min(col("ts_us")).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("label_event_id"),
          col("n_prior"), col("n_prior_views"),
          col("last_val_c"),
          (col("ts_us") - col("first_ts_us")).as("tenure_us"))
        .orderBy("user_id", "label_event_id")
    },
    Some("""WITH ev AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS val_c
              FROM events),
            f AS (SELECT user_id, event_id, event_type, ts_us,
                    CAST(count(*) OVER w AS BIGINT) AS n_prior,
                    CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                      THEN 1 ELSE 0 END) OVER w, 0) AS BIGINT)
                      AS n_prior_views,
                    LAST_VALUE(val_c IGNORE NULLS) OVER w AS last_val_c,
                    MIN(ts_us) OVER w AS first_ts_us
                  FROM ev
                  WINDOW w AS (PARTITION BY user_id
                    ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
            SELECT user_id, event_id AS label_event_id, n_prior,
                   n_prior_views, last_val_c,
                   ts_us - first_ts_us AS tenure_us
            FROM f WHERE event_type = 'purchase'
            ORDER BY user_id, label_event_id"""))

  /** R134 — mutual information between a categorical feature and a
    * label (I(source; lang) over documents): the feature-selection
    * read that ranks "which metadata column predicts the label" —
    * R126's chi-square tests INDEPENDENCE (is there any association),
    * MI measures its STRENGTH in nats and is comparable across
    * features. One bounded (x, y) contingency aggregation; marginals
    * via windows on the O(cells) frame; each cell's
    * (n_xy/N)·ln(n_xy·N/(n_x·n_y)) contribution floor-quantized to a
    * long at 1e9 BEFORE the total (the D72/JSD order-free-sum
    * convention) — the statistic is an integer sum, hash-exact. */
  val qMutualInfo = QueryDef(
    "q_mutual_info",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cells = Tables.documents(s, d)
        .groupBy(col("source").as("x"), col("lang").as("y"))
        .agg(count(lit(1)).as("n_xy"))
      val wX = Window.partitionBy("x")
      val wY = Window.partitionBy("y")
      val wAll = Window.partitionBy(lit(1))
      cells
        .withColumn("n_x", sum("n_xy").over(wX))
        .withColumn("n_y", sum("n_xy").over(wY))
        .withColumn("n", sum("n_xy").over(wAll))
        .withColumn("contrib_q",
          floor(col("n_xy").cast("double") / col("n") *
            log(col("n_xy").cast("double") * col("n") /
              (col("n_x").cast("double") * col("n_y"))) * 1e9)
            .cast("long"))
        .withColumn("mi_q", sum("contrib_q").over(wAll))
        .select(col("x"), col("y"), col("n_xy"), col("contrib_q"),
          col("mi_q"))
        .orderBy("x", "y")
    },
    Some("""WITH cells AS (
              SELECT source AS x, lang AS y, CAST(count(*) AS BIGINT) AS n_xy
              FROM documents GROUP BY 1, 2),
            m AS (SELECT *,
                    CAST(SUM(n_xy) OVER (PARTITION BY x) AS BIGINT) AS n_x,
                    CAST(SUM(n_xy) OVER (PARTITION BY y) AS BIGINT) AS n_y,
                    CAST(SUM(n_xy) OVER () AS BIGINT) AS n
                  FROM cells),
            t AS (SELECT *,
                    CAST(floor(CAST(n_xy AS DOUBLE) / n *
                      ln(CAST(n_xy AS DOUBLE) * n /
                        (CAST(n_x AS DOUBLE) * n_y)) * 1e9) AS BIGINT)
                      AS contrib_q
                  FROM m)
            SELECT x, y, n_xy, contrib_q,
                   CAST(SUM(contrib_q) OVER () AS BIGINT) AS mi_q
            FROM t ORDER BY x, y"""))

  /** R152 — Weight-of-Evidence encoding + Information Value: the
    * credit-scoring categorical transform (Siddiqi, "Credit Risk
    * Scorecards") — per category WOE = ln(goodShare/badShare) with
    * Laplace smoothing (so empty cells stay finite), and the
    * feature's total IV = Σ (goodShare − badShare)·WOE, the standard
    * "is this feature worth keeping" strength read (R134's mutual
    * information in scorecard units). Complements R72: target
    * encoding emits a per-row feature, WOE/IV emits the per-category
    * codebook plus the feature-level selection statistic.
    *
    * Exactness: one fact aggregation to the O(#categories) frame;
    * shares as exact ppm integers; the ln argument is ONE double
    * ratio of exact BIGINT cross-products (all < 2^53, so the double
    * is exact) and each IV term is floor-quantized BEFORE the integer
    * total (the R68/PSI convention). */
  val qWoeIv = QueryDef(
    "q_woe_iv",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wAll = Window.partitionBy(lit(1))
      Tables.lineitem(s, d)
        .groupBy(month(col("l_shipdate")).as("category"))
        .agg(
          sum(when(col("l_returnflag") === "R", lit(1L)).otherwise(lit(0L))).as("n_bad"),
          sum(when(col("l_returnflag") =!= "R", lit(1L)).otherwise(lit(0L))).as("n_good"))
        // Laplace: +1 per cell, +#categories on each total
        .withColumn("k", count(lit(1)).over(wAll))
        .withColumn("gt", sum("n_good").over(wAll) + col("k"))
        .withColumn("bt", sum("n_bad").over(wAll) + col("k"))
        .withColumn("g1", col("n_good") + 1)
        .withColumn("b1", col("n_bad") + 1)
        .withColumn("gs_ppm", expr("(g1 * 1000000) div gt"))
        .withColumn("bs_ppm", expr("(b1 * 1000000) div bt"))
        .withColumn("woe_q6",
          floor(log(col("g1").cast("double") * col("bt") /
            (col("b1").cast("double") * col("gt"))) * 1e6).cast("long"))
        .withColumn("iv_term_q", expr("((gs_ppm - bs_ppm) * woe_q6) div 1000000"))
        .withColumn("iv_q6", sum("iv_term_q").over(wAll))
        .select(col("category"), col("n_good"), col("n_bad"),
          col("gs_ppm"), col("bs_ppm"), col("woe_q6"), col("iv_term_q"), col("iv_q6"))
        .orderBy("category")
    },
    Some("""WITH cells AS (
              SELECT CAST(month(l_shipdate) AS INTEGER) AS category,
                     CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS n_bad,
                     CAST(count(*) FILTER (WHERE l_returnflag <> 'R') AS BIGINT) AS n_good
              FROM lineitem GROUP BY 1),
            t AS (SELECT *,
                    CAST(count(*) OVER () AS BIGINT) AS k,
                    CAST(SUM(n_good) OVER () AS BIGINT) + CAST(count(*) OVER () AS BIGINT) AS gt,
                    CAST(SUM(n_bad) OVER () AS BIGINT) + CAST(count(*) OVER () AS BIGINT) AS bt,
                    n_good + 1 AS g1, n_bad + 1 AS b1
                  FROM cells),
            w AS (SELECT *,
                    (g1 * 1000000) // gt AS gs_ppm,
                    (b1 * 1000000) // bt AS bs_ppm,
                    CAST(floor(ln(CAST(g1 AS DOUBLE) * bt /
                      (CAST(b1 AS DOUBLE) * gt)) * 1e6) AS BIGINT) AS woe_q6
                  FROM t),
            v AS (SELECT *,
                    ((gs_ppm - bs_ppm) * woe_q6) // 1000000 AS iv_term_q
                  FROM w)
            SELECT category, n_good, n_bad,
                   CAST(gs_ppm AS BIGINT) AS gs_ppm, CAST(bs_ppm AS BIGINT) AS bs_ppm,
                   woe_q6, CAST(iv_term_q AS BIGINT) AS iv_term_q,
                   CAST(SUM(iv_term_q) OVER () AS BIGINT) AS iv_q6
            FROM v ORDER BY category"""))

  def all: Seq[QueryDef] = Seq(qTargetEncode, qFeatureScale, qAutocorr,
    qFeatureMatrix, qMutualInfo, qCrossCorrelation, qWoeIv)
}
