package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** R145 — Markov removal-effect attribution invariants the unrolled
  * SQL oracle can't state: exact hand-graph absorption values, the
  * provable base ≥ removed dominance, and journey-construction laws. */
class MarkovSpec extends SparkSpec {

  import spark.implicits._

  test("R145: hand graph — absorption and removal effects are exact") {
    // START splits 50/50: A converts always, B never.
    val edges = Seq(
      ("START", "A", 1L), ("START", "B", 1L),
      ("A", "CONV", 1L), ("B", "NULL", 1L)).toDF("src", "dst", "n")
    val v = Markov.absorption(edges, rounds = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(v(("none", "START")) === Markov.Scale / 2, "base P(conv) = 1/2 exactly")
    assert(v(("A", "START")) === 0L, "deleting the converting channel kills it all")
    assert(v(("B", "START")) === Markov.Scale / 2,
      "deleting the dead-end channel changes nothing (its mass already failed)")
  }

  test("R145: a 2-step chain needs the iteration depth — rounds are real") {
    // START → A → B → CONV, single path
    val edges = Seq(("START", "A", 1L), ("A", "B", 1L), ("B", "CONV", 1L))
      .toDF("src", "dst", "n")
    val shallow = Markov.absorption(edges, rounds = 2)
      .filter(col("rem") === "none" && col("state") === "START")
      .head().getLong(2)
    val deep = Markov.absorption(edges, rounds = 3)
      .filter(col("rem") === "none" && col("state") === "START")
      .head().getLong(2)
    assert(shallow === 0L, "2 rounds cannot see a 3-edge path")
    assert(deep === Markov.Scale, "3 rounds resolve the full chain exactly")
  }

  test("R145: on the events table — dominance, non-negative effects, share tiling") {
    val out = Markov.removalEffects(spark, sf).cache()
    val rows = out.collect()
    assert(rows.length === 4, "four non-purchase touch types = four channels")
    val base = rows.head.getAs[Long]("base_q")
    assert(rows.forall(_.getAs[Long]("base_q") === base))
    assert(base > 0 && base <= Markov.Scale)
    rows.foreach { r =>
      val rem = r.getAs[Long]("removed_q")
      val eff = r.getAs[Long]("effect_q")
      assert(rem >= 0 && rem <= base,
        s"${r.getAs[String]("channel")}: removal must not raise conversion")
      assert(eff === base - rem)
    }
    val shares = rows.map(_.getAs[Long]("share_ppm"))
    assert(shares.sum <= 1000000L && shares.sum > 1000000L - rows.length,
      s"ppm shares tile 1e6 within flooring loss: ${shares.sum}")
    out.unpersist()
  }

  test("R146: hand game — Shapley values are exact") {
    // channels A(bit 0), B(bit 1); conversions: {A} → 1, {A,B} → 1
    // φ_A·2! = 0!1!·(v{A}−v∅) + 1!0!·(v{A,B}−v{B}) = (1−0) + (2−0) = 3
    // φ_B·2! = (v{B}−v∅) + (v{A,B}−v{A}) = 0 + (2−1) = 1
    val phis = Markov.shapley(Seq((1, 1L), (3, 1L)), n = 2).toMap
    assert(phis === Map(0 -> 3L, 1 -> 1L))
  }

  test("R146: no-touch conversions cancel — a dummy channel gets zero") {
    // conv(∅) = 5 must credit nobody; channel 1 never co-occurs with
    // conversion beyond what channel 0 explains
    val phis = Markov.shapley(Seq((0, 5L), (1, 2L)), n = 2).toMap
    assert(phis(0) === 2L * 2L, "all marginal credit lands on channel 0")
    assert(phis(1) === 0L, "the dummy channel earns exactly nothing")
  }

  test("R146: efficiency on the events table — Σφ·n! = n!·(v(full) − conv(∅))") {
    val out = Markov.shapleyAttribution(spark, sf).cache()
    val rows = out.collect()
    assert(rows.length === 4)
    rows.foreach(r => assert(r.getAs[Long]("phi_q") >= 0L,
      "the counting game is monotone — no negative credit"))
    val jny = Markov.journeys(spark, sf).cache()
    val convUsers = jny.filter(col("state") === "CONV")
      .select("user_id").distinct().count()
    // conversions with NO pre-purchase touch: journey length 1
    val noTouch = jny.groupBy("user_id")
      .agg(count(lit(1)).as("len"),
        max(when(col("state") === "CONV", 1).otherwise(0)).as("cv"))
      .filter(col("cv") === 1 && col("len") === 1).count()
    val fact4 = 24L
    assert(rows.map(_.getAs[Long]("phi_q")).sum ===
      fact4 * (convUsers - noTouch),
      "Shapley efficiency must hold exactly at the n! scale")
    val shares = rows.map(_.getAs[Long]("share_ppm"))
    assert(shares.sum <= 1000000L && shares.sum > 1000000L - rows.length)
    jny.unpersist(); out.unpersist()
  }

  test("R145: journey construction — transitions stop at the first purchase") {
    val edges = Markov.transitionCounts(spark, sf).cache()
    // CONV is absorbing: nothing leaves it
    assert(edges.filter(col("src") === "CONV").count() === 0)
    // NULL is terminal: nothing leaves it either
    assert(edges.filter(col("src") === "NULL").count() === 0)
    // START out-mass equals the number of users (one journey each)
    val startMass = edges.filter(col("src") === "START")
      .agg(sum("n")).head().getLong(0)
    val nUsers = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(startMass === nUsers)
    // every journey is absorbed exactly once: CONV+NULL in-mass = #users
    val absorbed = edges.filter(col("dst").isin("CONV", "NULL"))
      .agg(sum("n")).head().getLong(0)
    assert(absorbed === nUsers)
    edges.unpersist()
  }
}
