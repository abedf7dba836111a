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

  /** Journey transition counts: (src, dst, n) over states
    * {START, touch types..., CONV, NULL}. One window exchange on
    * user_id; the lead computed before the first-purchase cut is
    * valid for every kept non-CONV row because a kept row's successor
    * is never cut (only post-purchase rows are). */
  def transitionCounts(s: SparkSession, dir: String): DataFrame = {
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
    val jny = seq.join(fp, Seq("user_id"), "left")
      .filter(col("fp_rn").isNull || col("rn") <= col("fp_rn"))
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

  val all: Seq[QueryDef] = Seq(qMarkovAttribution)
}
