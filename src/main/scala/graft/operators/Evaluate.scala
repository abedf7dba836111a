package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R66/R67 + R68/R69 — model-evaluation and distribution-drift
  * readouts, the metrics layer a curation pipeline runs after every
  * scoring pass (reference analogue: the quality/monitoring checks a
  * production ETL service reports per batch — Net7-ETL-Bus
  * Net7EtlBus.Service/Workers/ServiceBusWorker.cs:47-160 logs per-batch
  * outcomes; here the outcomes are statistical, computed in-engine).
  *
  * All four operators share one scale discipline: reduce the raw table
  * to a BOUNDED aggregate first (per-(group, distinct-score) counts,
  * fixed bin grids, integerized value grids), then run the O(bins)
  * window/divergence arithmetic on that bounded frame. No global
  * window ever sees raw rows:
  *
  *   - `q_auc` windows over per-(source, distinct quantized score)
  *     rows — the D9 score lives on a 1e-6 grid, so the per-source
  *     frame is ≤ 1e6+1 rows no matter how many documents exist;
  *   - `q_calibration` is 10 fixed-width bins, integer-exact
  *     throughout (no float sums — the r3 hash-stability rule);
  *   - `q_psi` is 10 fixed-width bins over the observed [min,max];
  *   - `q_ks_drift` grids values to integers (≤ value-range rows).
  *
  * AUC uses the Mann-Whitney rank-sum identity with MIDRANKS for
  * ties, kept exact by working in doubled units: with per-score
  * cumulative-before counts c and tie-group sizes n, the positive
  * rank-sum doubled is S2 = Σ np·(2c + n + 1), and
  * AUC = (S2 − n_pos·(n_pos+1)) / (2·n_pos·n_neg) — all BIGINT until
  * the one final division, so Spark and the oracle agree bit-for-bit.
  */
object Evaluate {

  /** Documents scored by the D9 quality score, labeled by the D8
    * outcome (is the doc English) — the same score/outcome pairing
    * R65's decile lift reads, so the two entries cross-check. */
  private def scored(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d).select(col("source"), col("doc_id"),
      graft.functions.Text.qualityScore(col("text")).as("score"),
      (col("lang") === "en").as("pos"))

  /** Oracle CTE prelude producing (source, pos, score) — the shared
    * oCanon/oQualityExpr chain from the D9/R65 oracles. */
  private val oScored =
    s"""c AS (SELECT doc_id, source, lang, text,
                ${graft.dedup.PipelineQueries.oCanon} AS canon
              FROM documents),
        m AS (SELECT doc_id, source, lang, text, canon,
                len(string_split(canon, ' ')) AS n_words,
                greatest(length(text), 1) AS text_len
              FROM c),
        q AS (SELECT source, lang = 'en' AS pos,
                ${graft.dedup.PipelineQueries.oQualityExpr} AS score
              FROM m)"""

  /** R66 — ROC AUC per source via the tie-corrected Mann-Whitney
    * rank-sum. Degenerate sources (all-positive / all-negative) are
    * excluded: AUC is undefined there. */
  val qAuc = QueryDef(
    "q_auc",
    (s, d) => {
      val perScore = scored(s, d).groupBy("source", "score")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("np"))
      val wBefore = Window.partitionBy("source").orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      val agg = perScore
        .withColumn("c", coalesce(sum("n").over(wBefore), lit(0L)))
        .groupBy("source")
        .agg(sum(col("np") * (col("c") * 2 + col("n") + 1)).as("s2"),
          sum("np").as("n_pos"), sum(col("n") - col("np")).as("n_neg"))
      agg.filter(col("n_pos") > 0 && col("n_neg") > 0)
        .select(col("source"), col("n_pos"), col("n_neg"),
          floor((col("s2") - col("n_pos") * (col("n_pos") + 1)).cast("double")
            / (col("n_pos") * col("n_neg") * 2).cast("double") * 1e6)
            .cast("long").as("auc_q"))
        .orderBy("source")
    },
    Some(s"""WITH $oScored,
             ps AS (SELECT source, score, count(*) AS n,
                      SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS np
                    FROM q GROUP BY 1, 2),
             mid AS (SELECT *,
                       COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY score
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         AS c
                     FROM ps),
             a AS (SELECT source, SUM(np * (c * 2 + n + 1)) AS s2,
                     SUM(np) AS n_pos, SUM(n - np) AS n_neg
                   FROM mid GROUP BY 1)
             SELECT source, CAST(n_pos AS BIGINT) AS n_pos,
                    CAST(n_neg AS BIGINT) AS n_neg,
                    CAST(floor(CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
                      / CAST(2 * n_pos * n_neg AS DOUBLE) * 1e6) AS BIGINT)
                      AS auc_q
             FROM a WHERE n_pos > 0 AND n_neg > 0 ORDER BY source"""))

  /** R67 — calibration / reliability table: 10 equal-width score bins,
    * per-bin mean predicted score vs observed positive rate plus the
    * |gap|, and the expected calibration error (ECE = Σ n·gap / N)
    * repeated on every row. Integer-exact: scores are summed in 1e-6
    * units as BIGINT and all ratios use integer floor division, so no
    * float accumulation order can flip the hash. */
  val qCalibration = QueryDef(
    "q_calibration",
    (s, d) => {
      val binned = scored(s, d).select(
        least(floor(col("score") * 10).cast("int"), lit(9)).as("bin"),
        floor(col("score") * 1e6 + 0.5).cast("long").as("score_q"),
        when(col("pos"), 1L).otherwise(0L).as("p"))
      val per = binned.groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("p").as("n_pos"),
          sum("score_q").as("ssq"))
        .withColumn("mean_score_q", expr("ssq div n"))
        .withColumn("rate_q", expr("(n_pos * 1000000) div n"))
        .withColumn("gap_q", abs(col("mean_score_q") - col("rate_q")))
      per
        .withColumn("ece_q",
          expr("sum(n * gap_q) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED "
            + "PRECEDING AND UNBOUNDED FOLLOWING) div sum(n) OVER (ORDER BY "
            + "bin ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"))
        .select(col("bin"), col("n"), col("n_pos"), col("mean_score_q"),
          col("rate_q"), col("gap_q"), col("ece_q"))
        .orderBy("bin")
    },
    Some(s"""WITH $oScored,
             b AS (SELECT least(CAST(floor(score * 10) AS INT), 9) AS bin,
                     CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_q,
                     CASE WHEN pos THEN 1 ELSE 0 END AS p
                   FROM q),
             per AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                       CAST(SUM(p) AS BIGINT) AS n_pos,
                       CAST(SUM(score_q) AS BIGINT) AS ssq
                     FROM b GROUP BY 1),
             g AS (SELECT bin, n, n_pos,
                     CAST(ssq // n AS BIGINT) AS mean_score_q,
                     CAST((n_pos * 1000000) // n AS BIGINT) AS rate_q,
                     CAST(abs(ssq // n - (n_pos * 1000000) // n) AS BIGINT)
                       AS gap_q
                   FROM per)
             SELECT bin, n, n_pos, mean_score_q, rate_q, gap_q,
                    CAST(SUM(n * gap_q) OVER () // SUM(n) OVER () AS BIGINT)
                      AS ece_q
             FROM g ORDER BY bin"""))

  /** R68 — Population Stability Index between two time cohorts of the
    * events stream (first vs second half of the month): 10 equal-width
    * bins over the observed global value range, Laplace-smoothed
    * proportions (+0.5 per bin) so empty bins stay finite, per-bin
    * contribution (pa−pb)·ln(pa/pb) and the total repeated per row.
    * The bin frame is generated (0..9) so both cohorts' empty bins
    * participate — PSI's standard form. The only driver-free stats
    * pass is a 1-row min/max broadcast (the documented bounded class). */
  val qPsi = QueryDef(
    "q_psi",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select((dayofmonth(col("ts")) <= 15).as("isa"), col("value"))
      val stats = ev.agg(min("value").as("mn"), max("value").as("mx"))
      val binned = ev.crossJoin(broadcast(stats)).select(
        col("isa"),
        when(col("mx") > col("mn"),
          least(floor((col("value") - col("mn")) * 10.0
            / (col("mx") - col("mn"))).cast("int"), lit(9)))
          .otherwise(lit(0)).as("bin"))
      val per = binned.groupBy("bin").agg(
        sum(when(col("isa"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("isa"), 1L).otherwise(0L)).as("n_b"))
      val bins = s.range(0, 10).select(col("id").cast("int").as("bin"))
      val completed = bins.join(per, Seq("bin"), "left")
        .select(col("bin"), coalesce(col("n_a"), lit(0L)).as("n_a"),
          coalesce(col("n_b"), lit(0L)).as("n_b"))
      val wAll = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val smoothed = completed
        .withColumn("ta", sum("n_a").over(wAll))
        .withColumn("tb", sum("n_b").over(wAll))
        .withColumn("pa",
          (col("n_a") + 0.5) / (col("ta").cast("double") + 5.0))
        .withColumn("pb",
          (col("n_b") + 0.5) / (col("tb").cast("double") + 5.0))
        .withColumn("contrib_q",
          floor((col("pa") - col("pb")) * log(col("pa") / col("pb")) * 1e6)
            .cast("long"))
      // the total sums the QUANTIZED per-bin longs, not the raw
      // doubles — a 10-term double sum is accumulation-order-sensitive
      // and the two engines need not add in the same order
      smoothed
        .select(col("bin"), col("n_a"), col("n_b"), col("contrib_q"),
          sum("contrib_q").over(wAll).as("psi_q"))
        .orderBy("bin")
    },
    Some("""WITH ev AS (SELECT day(ts) <= 15 AS isa, value FROM events),
             st AS (SELECT min(value) AS mn, max(value) AS mx FROM ev),
             b AS (SELECT isa,
                     CASE WHEN st.mx > st.mn THEN
                       least(CAST(floor((value - st.mn) * 10.0
                         / (st.mx - st.mn)) AS INT), 9)
                     ELSE 0 END AS bin
                   FROM ev, st),
             per AS (SELECT bin,
                       CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_a,
                       CAST(SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT)
                         AS n_b
                     FROM b GROUP BY 1),
             grid AS (SELECT CAST(range AS INT) AS bin FROM range(0, 10)),
             cmpl AS (SELECT grid.bin, COALESCE(per.n_a, 0) AS n_a,
                        COALESCE(per.n_b, 0) AS n_b
                      FROM grid LEFT JOIN per ON grid.bin = per.bin),
             sm AS (SELECT bin, n_a, n_b,
                      (n_a + 0.5) / (CAST(SUM(n_a) OVER () AS DOUBLE) + 5.0)
                        AS pa,
                      (n_b + 0.5) / (CAST(SUM(n_b) OVER () AS DOUBLE) + 5.0)
                        AS pb
                    FROM cmpl),
             c AS (SELECT bin, n_a, n_b,
                     CAST(floor((pa - pb) * ln(pa / pb) * 1e6) AS BIGINT)
                       AS contrib_q
                   FROM sm)
             SELECT bin, n_a, n_b, contrib_q,
                    CAST(SUM(contrib_q) OVER () AS BIGINT) AS psi_q
             FROM c ORDER BY bin"""))

  /** R69 — two-sample Kolmogorov-Smirnov drift per event type: each
    * type's value distribution vs ALL OTHER types', on an integerized
    * value grid (KS over the binned CDFs — the streaming-monitor
    * form; the grid bounds the global cumulative window at
    * O(value-range) rows regardless of event count). Reports the KS
    * statistic and the first grid value attaining it. The
    * (type × grid) completion frame is a join of two bounded
    * aggregates, never of raw rows. */
  val qKsDrift = QueryDef(
    "q_ks_drift",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), floor(col("value")).cast("long").as("v"))
      val tv = ev.groupBy("event_type", "v").agg(count(lit(1)).as("n"))
      val types = tv.groupBy("event_type").agg(sum("n").as("na"))
      val grid = tv.select("v").distinct()
      // bounded × bounded completion frame: |types| × |grid|
      val frame = grid.crossJoin(broadcast(types))
        .join(tv, Seq("event_type", "v"), "left")
        .select(col("event_type"), col("v"), col("na"),
          coalesce(col("n"), lit(0L)).as("n"))
      val wType = Window.partitionBy("event_type").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = tv.groupBy("v").agg(sum("n").as("nv"))
        .withColumn("ct", sum("nv").over(
          Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      val nAll = ev.agg(count(lit(1)).as("nn"))
      val gaps = frame
        .withColumn("ca", sum("n").over(wType))
        .join(tot.select("v", "ct"), "v")
        .crossJoin(broadcast(nAll))
        .withColumn("gap",
          abs(col("ca").cast("double") / col("na")
            - (col("ct") - col("ca")).cast("double")
              / (col("nn") - col("na"))))
      val wMax = Window.partitionBy("event_type")
      gaps
        .withColumn("ks", max("gap").over(wMax))
        .filter(col("gap") === col("ks"))
        .groupBy("event_type")
        .agg(min("na").as("n_a"), min(col("nn") - col("na")).as("n_b"),
          floor(max("ks") * 1e6).cast("long").as("ks_q"),
          min("v").as("v_at"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (SELECT event_type,
                          CAST(floor(value) AS BIGINT) AS v
                        FROM events),
             tv AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS n
                    FROM ev GROUP BY 1, 2),
             ty AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS na
                    FROM tv GROUP BY 1),
             grid AS (SELECT DISTINCT v FROM tv),
             frame AS (SELECT ty.event_type, grid.v, ty.na,
                         COALESCE(tv.n, 0) AS n
                       FROM grid CROSS JOIN ty
                       LEFT JOIN tv ON tv.event_type = ty.event_type
                         AND tv.v = grid.v),
             tot AS (SELECT v, SUM(n) AS nv FROM tv GROUP BY 1),
             cumtot AS (SELECT v, CAST(SUM(nv) OVER (ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS BIGINT) AS ct
                        FROM tot),
             nall AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM ev),
             g AS (SELECT f.event_type, f.v, f.na, nall.nn, cumtot.ct,
                     CAST(SUM(f.n) OVER (PARTITION BY f.event_type
                       ORDER BY f.v ROWS BETWEEN UNBOUNDED PRECEDING AND
                       CURRENT ROW) AS BIGINT) AS ca
                   FROM frame f JOIN cumtot ON f.v = cumtot.v
                   CROSS JOIN nall),
             gg AS (SELECT *,
                      abs(CAST(ca AS DOUBLE) / na
                        - CAST(ct - ca AS DOUBLE) / (nn - na)) AS gap
                    FROM g),
             mx AS (SELECT *, MAX(gap) OVER (PARTITION BY event_type) AS ks
                    FROM gg)
             SELECT event_type, CAST(MIN(na) AS BIGINT) AS n_a,
                    CAST(MIN(nn - na) AS BIGINT) AS n_b,
                    CAST(floor(MAX(ks) * 1e6) AS BIGINT) AS ks_q,
                    CAST(MIN(v) AS BIGINT) AS v_at
             FROM mx WHERE gap = ks
             GROUP BY event_type ORDER BY event_type"""))

  /** R80 — two-proportion A/B test: the per-user outcome ("this
    * user's purchase share exceeds the corpus share" — decided by
    * exact integer cross-multiplication np·gt > gp·nt, no float
    * boundary) compared between a deterministic 50/50 user-parity
    * assignment, with the pooled two-proportion z statistic and the
    * 95% significance flag — the experiment readout every growth team
    * runs. A binary "ever purchased" outcome saturates on this data
    * (every user converts → pooled p = 1 → z is 0/0), which is why
    * the outcome is share-relative; degenerate denominators emit NULL
    * rather than dividing by zero. Reduces to per-user outcomes FIRST
    * (one user-keyed agg), then a 2-row cohort aggregate; all doubles
    * derive from exact BIGINTs in one fixed operation sequence. */
  val qAbTest = QueryDef(
    "q_ab_test",
    (s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"),
          count(lit(1)).as("nt"))
      val glob = perUser.agg(sum("np").as("gp"), sum("nt").as("gt"))
      val cohort = perUser.crossJoin(broadcast(glob))
        .select((col("user_id") % 2 === 0).as("grp"),
          when(col("np") * col("gt") > col("gp") * col("nt"), 1L)
            .otherwise(0L).as("conv"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("conv").as("x"))
      val a = cohort.filter(col("grp")).select(col("n").as("n_a"),
        col("x").as("x_a"))
      val b = cohort.filter(!col("grp")).select(col("n").as("n_b"),
        col("x").as("x_b"))
      a.crossJoin(b)
        .withColumn("pa", col("x_a").cast("double") / col("n_a"))
        .withColumn("pb", col("x_b").cast("double") / col("n_b"))
        .withColumn("pp",
          (col("x_a") + col("x_b")).cast("double")
            / (col("n_a") + col("n_b")))
        .withColumn("den",
          sqrt(col("pp") * (lit(1.0) - col("pp"))
            * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
        .withColumn("z",
          when(col("den") > 0, (col("pa") - col("pb")) / col("den")))
        .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
          floor(col("pa") * 1e6).cast("long").as("conv_a_q"),
          floor(col("pb") * 1e6).cast("long").as("conv_b_q"),
          when(col("pb") > 0,
            floor((col("pa") - col("pb")) / col("pb") * 1e6).cast("long"))
            .as("uplift_q"),
          floor(col("z") * 1e4).cast("long").as("z_q"),
          (abs(col("z")) > 1.959963984540054).as("sig95"))
    },
    Some("""WITH pu AS (SELECT user_id,
                          CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS np,
                          CAST(count(*) AS BIGINT) AS nt
                        FROM events GROUP BY user_id),
             g AS (SELECT CAST(SUM(np) AS BIGINT) AS gp,
                     CAST(SUM(nt) AS BIGINT) AS gt
                   FROM pu),
             c AS (SELECT user_id % 2 = 0 AS grp,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN np * gt > gp * nt
                       THEN 1 ELSE 0 END) AS BIGINT) AS x
                   FROM pu CROSS JOIN g GROUP BY 1),
             ab AS (SELECT a.n AS n_a, a.x AS x_a, b.n AS n_b, b.x AS x_b
                    FROM (SELECT * FROM c WHERE grp) a,
                         (SELECT * FROM c WHERE NOT grp) b),
             st AS (SELECT *,
                      CAST(x_a AS DOUBLE) / n_a AS pa,
                      CAST(x_b AS DOUBLE) / n_b AS pb,
                      CAST(x_a + x_b AS DOUBLE) / (n_a + n_b) AS pp
                    FROM ab),
             dz AS (SELECT *,
                      sqrt(pp * (1.0 - pp)
                        * (1.0 / n_a + 1.0 / n_b)) AS den
                    FROM st),
             z AS (SELECT *,
                     CASE WHEN den > 0 THEN (pa - pb) / den END AS z
                   FROM dz)
             SELECT n_a, x_a, n_b, x_b,
                    CAST(floor(pa * 1e6) AS BIGINT) AS conv_a_q,
                    CAST(floor(pb * 1e6) AS BIGINT) AS conv_b_q,
                    CASE WHEN pb > 0 THEN
                      CAST(floor((pa - pb) / pb * 1e6) AS BIGINT)
                    END AS uplift_q,
                    CAST(floor(z * 1e4) AS BIGINT) AS z_q,
                    abs(z) > 1.959963984540054 AS sig95
             FROM z"""))

  /** R126 — chi-square test of independence: is event type independent
    * of day-of-week? The contingency-table test behind "does behavior
    * differ by segment" questions that the R80 two-proportion z can
    * only ask pairwise. One (type, dow) count aggregation (O(types×7)
    * cells), marginals via windows ON THE CELL TABLE, expected counts
    * E = row_total·col_total/N as one IEEE division per cell, each
    * cell's (O−E)²/E contribution floor-quantized to a long BEFORE the
    * total — the χ² statistic is a sum of QUANTIZED integers (the PSI
    * convention), never a float accumulation, so it is bit-identical
    * across engines and partitionings. df = (r−1)(c−1) rides the same
    * frame so the caller can look up the critical value; the spec
    * checks the statistic against a hand-computed reference. */
  val qChiSquare = QueryDef(
    "q_chi_square",
    (s, d) => {
      val cells = Tables.events(s, d)
        .groupBy(col("event_type").as("t"),
          (dayofweek(col("ts")) - 1).as("dow"))
        .agg(count(lit(1)).as("o"))
      val wT = Window.partitionBy("t")
      val wD = Window.partitionBy("dow")
      val wAll = Window.partitionBy(lit(1))
      cells
        .withColumn("rt", sum("o").over(wT))
        .withColumn("ct", sum("o").over(wD))
        .withColumn("n", sum("o").over(wAll))
        .withColumn("nr", size(collect_set("t").over(wAll)))
        .withColumn("nc", size(collect_set("dow").over(wAll)))
        .withColumn("e",
          (col("rt") * col("ct")).cast("double") / col("n"))
        .withColumn("term_q",
          floor((col("o") - col("e")) * (col("o") - col("e")) / col("e")
            * 1e6).cast("long"))
        .withColumn("chi2_q", sum("term_q").over(wAll))
        .withColumn("df",
          ((col("nr") - 1) * (col("nc") - 1)).cast("long"))
        .select(col("t"), col("dow"), col("o"),
          floor(col("e") * 1e4).cast("long").as("e_q"),
          col("term_q"), col("chi2_q"), col("df"))
        .orderBy("t", "dow")
    },
    Some("""WITH cells AS (
              SELECT event_type AS t, dayofweek(ts) AS dow,
                     CAST(count(*) AS BIGINT) AS o
              FROM events GROUP BY 1, 2),
            m AS (SELECT *,
                    CAST(SUM(o) OVER (PARTITION BY t) AS BIGINT) AS rt,
                    CAST(SUM(o) OVER (PARTITION BY dow) AS BIGINT) AS ct,
                    CAST(SUM(o) OVER () AS BIGINT) AS n,
                    CAST(count(DISTINCT t) OVER () AS INT) AS nr,
                    CAST(count(DISTINCT dow) OVER () AS INT) AS nc
                  FROM cells),
            e AS (SELECT *,
                    CAST(rt * ct AS DOUBLE) / n AS e,
                    CAST(floor((o - CAST(rt * ct AS DOUBLE) / n)
                      * (o - CAST(rt * ct AS DOUBLE) / n)
                      / (CAST(rt * ct AS DOUBLE) / n) * 1e6) AS BIGINT)
                      AS term_q
                  FROM m)
            SELECT t, dow, o,
                   CAST(floor(e * 1e4) AS BIGINT) AS e_q, term_q,
                   CAST(SUM(term_q) OVER () AS BIGINT) AS chi2_q,
                   CAST((nr - 1) * (nc - 1) AS BIGINT) AS df
            FROM e
            ORDER BY t, dow"""))

  def all: Seq[QueryDef] = Seq(qAuc, qCalibration, qPsi, qKsDrift, qAbTest,
    qChiSquare)
}
