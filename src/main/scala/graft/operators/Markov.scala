package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R145 — Markov-chain attribution with removal effects (the
  * data-driven alternative to R45/R139's positional models: a
  * channel's credit is how much the conversion probability DROPS when
  * the channel is deleted from the journey graph, so credit follows
  * structural contribution, not arbitrary first/last policy).
  *
  * Model: each user's event stream up to (and including) the FIRST
  * purchase is one journey; states are the touch types plus START /
  * CONV (purchase, absorbing) / NULL (journey end without purchase,
  * absorbing). Removing channel c deletes state c: transitions INTO c
  * forward their mass to NULL (the denominator keeps the full
  * out-count — the standard removal-effect construction), transitions
  * OUT of c vanish with the state.
  *
  * Exact arithmetic end to end: absorption probabilities are value-
  * iterated at a fixed 1e12 integer scale — each round computes
  * `Σ n(s,t)·v_q(t) div total(s)` in pure BIGINT ops (no float
  * anywhere, so Spark and DuckDB agree bit for bit, and because each
  * removal chain sums a SUBSET of the base chain's numerator terms
  * over the same denominator, v_removed ≤ v_base holds exactly —
  * effects are provably non-negative, not just approximately).
  * Products stay in range while n·1e12 < 2^63, i.e. per-cell counts
  * below ~9.2e6; a 100 TB deployment drops the scale to 1e6 or lifts
  * the multiply to DECIMAL(38,0) — noted here because the entry's
  * integer discipline is the part that must survive the rescale.
  *
  * Scale shape: ONE user-keyed window pass over the events, then
  * everything runs on the O(types²) edge frame; the scenario cross
  * join is (channels+1) × edge-cells ≤ ~200 rows (bounded by the type
  * vocabulary, never by data volume — the sanctioned bounded-frame
  * crossJoin class), and the fixed-round iteration touches only that
  * frame. The oracle unrolls the identical rounds as CTEs (the
  * PageRank/k-core/SSSP convention).
  */
object Markov {

  private[operators] val Scale = 1000000000000L // 1e12
  private val Rounds = 8

  /** Journey rows (user_id, rn, state, dst) cut at the FIRST purchase
    * (the purchase row itself kept as the CONV terminal). One window
    * exchange on user_id; the lead computed before the cut is valid
    * for every kept non-CONV row because a kept row's successor is
    * never cut (only post-purchase rows are). Shared by R145's
    * transition graph and R146's coalition sets. */
  def journeys(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val seq = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(byUser))
      .withColumn("state",
        when(col("event_type") === "purchase", lit("CONV"))
          .otherwise(col("event_type")))
      .withColumn("dst",
        coalesce(lead(col("state"), 1).over(byUser), lit("NULL")))
    val fp = seq.filter(col("state") === "CONV")
      .groupBy("user_id").agg(min("rn").as("fp_rn"))
    seq.join(fp, Seq("user_id"), "left")
      .filter(col("fp_rn").isNull || col("rn") <= col("fp_rn"))
      .select("user_id", "rn", "state", "dst")
  }

  /** Journey transition counts: (src, dst, n) over states
    * {START, touch types..., CONV, NULL}. */
  def transitionCounts(s: SparkSession, dir: String): DataFrame = {
    val jny = journeys(s, dir)
    val steps = jny.filter(col("state") =!= "CONV")
      .select(col("state").as("src"), col("dst"))
    val starts = jny.filter(col("rn") === 1)
      .select(lit("START").as("src"), col("state").as("dst"))
    starts.unionByName(steps).groupBy("src", "dst").agg(count(lit(1)).as("n"))
  }

  /** Fixed-round integer value iteration over every removal scenario
    * at once. Returns (rem, state, vq): vq/1e12 ≈ P(reach CONV from
    * state | channel `rem` deleted), rem = "none" for the base chain.
    * Input `edges` is the bounded (src, dst, n) frame. */
  def absorption(edges: DataFrame, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // The edge matrix is VOCABULARY-bounded — O(types²) cells no
    // matter how many events fed it — so this is the sanctioned
    // bounded driver materialization class (SURVEY §5, same as the
    // IVF codebook / BPE merge table): one collect of ≤ ~40 cells,
    // then the O(scenarios · cells · rounds) integer recurrence runs
    // as scalar Long arithmetic. A distributed formulation of the
    // same loop was measured first and rejected: 8 rounds of
    // join+groupBy over a ~200-row frame cost 3–4.5 s of pure
    // scheduler round-trips at sf0.1 (16+ tiny shuffle stages),
    // vs <1 s total this way — the data-sized work is all in
    // [[transitionCounts]], where it belongs. Scala `/` on
    // non-negative Longs is the same truncating division as the
    // oracle's `//`, so the recurrence is bit-identical to the
    // unrolled SQL.
    val cells = edges.select(col("src"), col("dst"), col("n").cast("long"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = cells.groupBy(_._1).map { case (s, cs) => s -> cs.map(_._3).sum }
    val channels = cells.map(_._1).distinct.filterNot(_ == "START").sorted
    val out = (channels :+ "none").flatMap { rem =>
      val es = cells.filter(c => c._1 != rem && c._2 != rem)
      val states = es.map(_._1).distinct
      var v = Map("CONV" -> Scale)
      for (_ <- 1 to rounds)
        v = states.map { st =>
          val num = es.iterator.filter(_._1 == st)
            .map(c => c._3 * v.getOrElse(c._2, 0L)).sum
          st -> num / total(st)
        }.toMap + ("CONV" -> Scale)
      v.toSeq.map { case (st, vq) => (rem, st, vq) }
    }
    out.toSeq.toDF("rem", "state", "vq")
  }

  /** The R145 report: per channel the base conversion probability,
    * the with-channel-removed probability, the removal effect and its
    * ppm share of the summed effects (all exact integers at 1e12 /
    * ppm scale). */
  def removalEffects(s: SparkSession, dir: String): DataFrame = {
    val v = absorption(transitionCounts(s, dir), Rounds)
    val atStart = v.filter(col("state") === "START")
    val out = atStart.filter(col("rem") =!= "none")
      .select(col("rem").as("channel"), col("vq").as("removed_q"))
      // 1-row broadcast of the base chain's START value
      .crossJoin(atStart.filter(col("rem") === "none")
        .select(col("vq").as("base_q")))
      .withColumn("effect_q", col("base_q") - col("removed_q"))
    out.crossJoin(out.agg(sum("effect_q").as("tot_eff")))
      .withColumn("share_ppm",
        expr("case when tot_eff > 0 then (effect_q * 1000000) div tot_eff end"))
      .select("channel", "base_q", "removed_q", "effect_q", "share_ppm")
      .orderBy("channel")
  }

  private def oRound(prev: String): String =
    s"""SELECT es.rem, es.src AS state,
          CAST(SUM(es.n * COALESCE(v.vq, 0)) // es.total AS BIGINT) AS vq
        FROM es LEFT JOIN $prev v ON v.rem = es.rem AND v.state = es.dst
        GROUP BY es.rem, es.src, es.total
        UNION ALL
        SELECT rem, 'CONV' AS state, CAST(1000000000000 AS BIGINT) AS vq
        FROM scen"""

  val qMarkovAttribution = QueryDef(
    "q_markov_attribution",
    (s, d) => removalEffects(s, d),
    Some {
      val its = (1 to Rounds)
        .map(i => s"v$i AS (${oRound(s"v${i - 1}")})")
        .mkString(",\n            ")
      s"""WITH seq AS (
            SELECT user_id,
                   row_number() OVER w AS rn,
                   CASE WHEN event_type = 'purchase' THEN 'CONV'
                        ELSE event_type END AS state,
                   COALESCE(lead(CASE WHEN event_type = 'purchase'
                                      THEN 'CONV' ELSE event_type END)
                            OVER w, 'NULL') AS dst
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          fp AS (SELECT user_id, min(rn) AS fp_rn FROM seq
                 WHERE state = 'CONV' GROUP BY user_id),
          jny AS (SELECT seq.* FROM seq LEFT JOIN fp USING (user_id)
                  WHERE fp.fp_rn IS NULL OR seq.rn <= fp.fp_rn),
          edges AS (
            SELECT src, dst, count(*) AS n FROM (
              SELECT state AS src, dst FROM jny WHERE state <> 'CONV'
              UNION ALL
              SELECT 'START' AS src, state AS dst FROM jny WHERE rn = 1)
            GROUP BY src, dst),
          tot AS (SELECT src, sum(n) AS total FROM edges GROUP BY src),
          chan AS (SELECT DISTINCT src AS rem FROM edges
                   WHERE src <> 'START'),
          scen AS (SELECT rem FROM chan UNION ALL SELECT 'none'),
          es AS (SELECT sc.rem, e.src, e.dst, e.n, t.total
                 FROM scen sc CROSS JOIN edges e
                 JOIN tot t ON t.src = e.src
                 WHERE e.src <> sc.rem AND e.dst <> sc.rem),
          v0 AS (SELECT rem, 'CONV' AS state,
                        CAST(1000000000000 AS BIGINT) AS vq FROM scen),
          $its,
          at_start AS (SELECT rem, vq FROM v$Rounds WHERE state = 'START'),
          outp AS (
            SELECT r.rem AS channel, b.vq AS base_q, r.vq AS removed_q,
                   b.vq - r.vq AS effect_q
            FROM at_start r CROSS JOIN
                 (SELECT vq FROM at_start WHERE rem = 'none') b
            WHERE r.rem <> 'none')
          SELECT channel, base_q, removed_q, effect_q,
                 CAST(CASE WHEN t.tot_eff > 0
                      THEN (effect_q * 1000000) // t.tot_eff END AS BIGINT)
                   AS share_ppm
          FROM outp CROSS JOIN
               (SELECT sum(effect_q) AS tot_eff FROM outp) t
          ORDER BY channel"""
    })

  /** R146 — exact Shapley-value attribution: the game-theoretic
    * counterpart to R145. Each user's journey contributes its SET of
    * pre-purchase touch types (a bitmask over the alphabetically
    * indexed channel vocabulary); the coalition value is the counting
    * game v(S) = Σ_{T ⊆ S} conv(T) (conversions whose full touch set
    * the coalition covers — monotone by construction, so every
    * marginal is ≥ 0), and each channel's credit is its Shapley value
    * — the ONLY allocation satisfying efficiency/symmetry/dummy, vs
    * R145's structural-removal credit. Scaled by n! the value is an
    * EXACT integer: φ_c·n! = Σ_{S ∌ c} |S|!·(n−1−|S|)!·(v(S∪c)−v(S)),
    * and efficiency becomes the machine-checkable identity
    * Σ_c φ_c·n! = n!·(v(full) − conv(∅)) (no-touch conversions cancel
    * from every marginal).
    *
    * Scale shape: one user-keyed aggregation to (mask, conv) — at most
    * 2^types rows no matter the event volume — then the 2^n subset
    * enumeration runs driver-side (n = touch vocabulary, here 4; the
    * bounded-collect class R145 documents). The oracle mirrors the
    * subset domain with a recursive bitmask-closure CTE and a
    * factorial lookup CTE. */
  def shapley(exact: Seq[(Int, Long)], n: Int): Seq[(Int, Long)] = {
    def fact(x: Int): Long = (1 to x).foldLeft(1L)(_ * _)
    def v(sMask: Int): Long = exact.iterator
      .filter { case (t, _) => (t & sMask) == t }.map(_._2).sum
    (0 until n).map { c =>
      val bit = 1 << c
      val phi = (0 until (1 << n)).iterator
        .filter(sMask => (sMask & bit) == 0)
        .map { sMask =>
          val p = Integer.bitCount(sMask)
          fact(p) * fact(n - 1 - p) * (v(sMask | bit) - v(sMask))
        }.sum
      c -> phi
    }
  }

  def shapleyAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val jny = journeys(s, dir)
    // alphabetical bit index over the O(types) channel vocabulary —
    // bounded driver list, mirrored by the oracle's row_number(ORDER BY)
    val channels = jny.filter(col("state") =!= "CONV")
      .select("state").distinct().collect().map(_.getString(0)).sorted
    val idxCol = channels.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (c, i)) => when(col("state") === c, lit(i)).otherwise(acc)
    }
    val exact = jny
      .withColumn("idx", idxCol)
      .groupBy("user_id")
      .agg(
        coalesce(bit_or(when(col("idx") >= 0, expr("shiftleft(1, idx)"))),
          lit(0)).as("mask"),
        max(when(col("state") === "CONV", 1).otherwise(0)).as("converted"))
      .groupBy("mask").agg(sum("converted").as("conv"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val phis = shapley(exact, channels.length)
    val tot = phis.map(_._2).sum
    phis.map { case (c, p) =>
      (channels(c), p,
        if (tot > 0) Some(p * 1000000L / tot) else None)
    }.toDF("channel", "phi_q", "share_ppm").orderBy("channel")
  }

  val qShapleyAttribution = QueryDef(
    "q_shapley_attribution",
    (s, d) => shapleyAttribution(s, d),
    Some {
      // popcount as 6 fixed shift-mask terms: engine-portable (no
      // bit_count dependency), valid for any n ≤ 6 channels
      def pc(x: String): String =
        (0 until 6).map(i => s"(($x >> $i) & 1)").mkString(" + ")
      s"""WITH RECURSIVE seq AS (
            SELECT user_id, row_number() OVER w AS rn,
                   CASE WHEN event_type = 'purchase' THEN 'CONV'
                        ELSE event_type END AS state
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          fp AS (SELECT user_id, min(rn) AS fp_rn FROM seq
                 WHERE state = 'CONV' GROUP BY user_id),
          jny AS (SELECT seq.* FROM seq LEFT JOIN fp USING (user_id)
                  WHERE fp.fp_rn IS NULL OR seq.rn <= fp.fp_rn),
          chan AS (SELECT state AS channel,
                          CAST(row_number() OVER (ORDER BY state) - 1 AS INT)
                            AS idx
                   FROM (SELECT DISTINCT state FROM jny
                         WHERE state <> 'CONV')),
          um AS (SELECT j.user_id,
                        COALESCE(bit_or(CASE WHEN c.idx IS NOT NULL
                                        THEN 1 << c.idx END), 0) AS mask,
                        max(CASE WHEN j.state = 'CONV' THEN 1 ELSE 0 END)
                          AS converted
                 FROM jny j LEFT JOIN chan c ON c.channel = j.state
                 GROUP BY j.user_id),
          exact AS (SELECT mask, CAST(sum(converted) AS BIGINT) AS conv
                    FROM um GROUP BY mask),
          nch AS (SELECT CAST(count(*) AS INT) AS n FROM chan),
          doms(s) AS (SELECT 0
                      UNION
                      SELECT d.s | (1 << c.idx) FROM doms d, chan c),
          vs AS (SELECT d.s,
                        CAST(COALESCE((SELECT SUM(e.conv) FROM exact e
                                       WHERE (e.mask & d.s) = e.mask), 0)
                             AS BIGINT) AS v
                 FROM doms d),
          fct(x, f) AS (VALUES (0, 1), (1, 1), (2, 2), (3, 6), (4, 24),
                               (5, 120), (6, 720)),
          phi AS (
            SELECT c.channel,
                   CAST(SUM(fa.f * fb.f * (v1.v - v0.v)) AS BIGINT) AS phi_q
            FROM chan c
            JOIN doms d ON (d.s & (1 << c.idx)) = 0
            JOIN vs v0 ON v0.s = d.s
            JOIN vs v1 ON v1.s = (d.s | (1 << c.idx))
            CROSS JOIN nch
            JOIN fct fa ON fa.x = ${pc("d.s")}
            JOIN fct fb ON fb.x = nch.n - 1 - (${pc("d.s")})
            GROUP BY c.channel)
          SELECT channel, phi_q,
                 CAST(CASE WHEN t.tot > 0
                      THEN (phi_q * 1000000) // t.tot END AS BIGINT)
                   AS share_ppm
          FROM phi CROSS JOIN (SELECT SUM(phi_q) AS tot FROM phi) t
          ORDER BY channel"""
    })

  val all: Seq[QueryDef] = Seq(qMarkovAttribution, qShapleyAttribution)
}
