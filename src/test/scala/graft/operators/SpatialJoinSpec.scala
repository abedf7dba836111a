package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** R102 — grid-blocked within-radius nearest join: boundary exactness,
  * naive parity on the real tables, and the plan shape (cell
  * equi-join + aggregation argmin, no cartesian). */
class SpatialJoinSpec extends SparkSpec {

  import spark.implicits._

  private def pts(rows: Seq[(Long, Long, Long)], k: String, a: String,
      b: String) = rows.toDF(k, a, b)

  test("R102: radius boundary is inclusive at dist2 == r² and exact across cells") {
    val r = 10L
    // probe at (100, 100); candidates: exactly at distance r on-axis
    // (in the next cell), just outside, diagonal inside, same point
    val probes = pts(Seq((1L, 100L, 100L)), "key", "la", "lo")
    val cands = pts(Seq(
      (10L, 110L, 100L),  // dist2 = 100 = r² → included (next cell over)
      (11L, 111L, 100L),  // dist2 = 121 > r² → excluded
      (12L, 107L, 107L),  // dist2 = 98 → nearest
      (13L, 100L, 100L)), // dist2 = 0 — but see below: excluded probe-wise? no, included
      "ckey", "cla", "clo")
    val got = SpatialJoin.nearestWithin(probes, cands, r).collect()
    assert(got.length === 1)
    assert(got.head.getLong(1) === 13L && got.head.getLong(2) === 0L)
    // remove the co-located candidate: diagonal 98 must beat on-axis 100
    val got2 = SpatialJoin
      .nearestWithin(probes, cands.filter(col("ckey") =!= 13L), r).collect()
    assert(got2.head.getLong(1) === 12L && got2.head.getLong(2) === 98L)
    // only the boundary candidate left: dist2 == r² is IN
    val got3 = SpatialJoin
      .nearestWithin(probes, cands.filter(col("ckey") === 10L), r).collect()
    assert(got3.head.getLong(1) === 10L && got3.head.getLong(2) === 100L)
    // only the outside candidate: no match → nulls survive the left join
    val got4 = SpatialJoin
      .nearestWithin(probes, cands.filter(col("ckey") === 11L), r).collect()
    assert(got4.length === 1 && got4.head.isNullAt(1) && got4.head.isNullAt(2))
  }

  test("R102: grid join equals the naive theta join on the real tables") {
    val d = sf
    val res = SpatialJoin.nearestWithinRadius(spark, d)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    val cs = graft.Tables.customer(spark, d).select("c_custkey").collect()
      .map(_.getLong(0))
    val sups = graft.Tables.supplier(spark, d).select("s_suppkey").collect()
      .map(_.getLong(0))
    assert(res.size === cs.length, "one row per customer, matched or not")
    val naive = cs.map { ck =>
      val (la, lo) = (ck * 7919L % 18000L, ck * 104729L % 36000L)
      val within = sups.flatMap { sk =>
        val (sla, slo) = (sk * 6133L % 18000L, sk * 31393L % 36000L)
        val d2 = (la - sla) * (la - sla) + (lo - slo) * (lo - slo)
        if (d2 <= SpatialJoin.R * SpatialJoin.R) Some((d2, sk)) else None
      }
      ck -> (if (within.isEmpty) None
             else Some { val m = within.min; (m._2, m._1) })
    }.toMap
    assert(res === naive)
    assert(naive.values.exists(_.nonEmpty), "fixture must produce matches")
    assert(naive.values.exists(_.isEmpty), "and unmatched probes")
  }

  test("R102: plan is a cell equi-join with an aggregation argmin — no cartesian, no window") {
    val df = SpatialJoin.nearestWithinRadius(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "both sides scale — the distance predicate must ride a cell equi-join")
    assert(!p.contains("WindowExec"),
      "the argmin must be the partial-aggregable struct-min")
  }
}
