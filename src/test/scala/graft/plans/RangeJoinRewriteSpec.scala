package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** R148 — the opt-in range-join rewrite: plan shape flips from
  * nested-loop to equi-join, results stay bit-identical, and the rule
  * keeps its hands off everything it shouldn't touch. */
class RangeJoinRewriteSpec extends SparkSpec {

  private def freshSession(width: Option[Long]) = {
    val s = spark.newSession()
    width.foreach(w =>
      s.conf.set("spark.graft.rangeJoin.bucketWidth", w.toString))
    s
  }

  private def frames(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    val points = (0L until 2000L).map(i => (i, i * 13L % 997L))
      .toDF("pid", "p")
    val ivs = (0L until 60L).map(i => (i, i * 16L, i * 16L + 40L))
      .toDF("iid", "lo", "hi")
    (points, ivs)
  }

  test("R148: the natural range join plans as an equi-join under the rule") {
    val s = freshSession(Some(32L))
    val (points, ivs) = frames(s)
    val j = points.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"rule must remove the nested-loop join:\n$plan")
    assert(plan.contains("gbucket"), "the bucket equi key must be present")
  }

  test("R148: rewritten results are bit-identical to the naive plan") {
    val on = freshSession(Some(32L)); val off = freshSession(None)
    def run(s: org.apache.spark.sql.SparkSession) = {
      val (points, ivs) = frames(s)
      points.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val naive = run(off)
    assert(run(on) === naive)
    assert(naive.nonEmpty, "the fixture must produce matches")
    // the naive plan really is the nested loop — the rule IS the diff
    val (p2, i2) = frames(off)
    assert(p2.join(i2, col("p") >= col("lo") && col("p") < col("hi"))
      .queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }

  test("R148: strict/non-strict bound combinations all stay exact") {
    val on = freshSession(Some(7L)); val off = freshSession(None)
    def run(s: org.apache.spark.sql.SparkSession,
        strictLo: Boolean, strictHi: Boolean) = {
      val (points, ivs) = frames(s)
      val lo = if (strictLo) col("p") > col("lo") else col("p") >= col("lo")
      val hi = if (strictHi) col("p") < col("hi") else col("p") <= col("hi")
      points.join(ivs, lo && hi).select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    for (sl <- Seq(true, false); sh <- Seq(true, false))
      assert(run(on, sl, sh) === run(off, sl, sh), s"strictLo=$sl strictHi=$sh")
  }

  test("R148: equi-keyed joins and conf-off sessions are left untouched") {
    val s = freshSession(Some(32L))
    import s.implicits._
    val a = Seq((1L, 5L), (2L, 9L)).toDF("k", "p")
    val b = Seq((1L, 0L, 10L)).toDF("k", "lo", "hi")
    val withEqui = a.join(b, a("k") === b("k") &&
      col("p") >= col("lo") && col("p") < col("hi"))
    assert(!withEqui.queryExecution.executedPlan.toString.contains("gbucket"),
      "an existing equi key means Spark already hash-joins — hands off")
    val off = freshSession(None)
    val (points, ivs) = frames(off)
    assert(!points.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      .queryExecution.executedPlan.toString.contains("gbucket"))
  }

  test("R148: inverted intervals (lo > hi, dirty data) contribute ZERO " +
      "buckets — no descending-sequence fan-out, no Sequence length blowup") {
    val on = freshSession(Some(8L)); val off = freshSession(None)
    def run(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      val points = Seq((1L, 5L), (2L, 50L)).toDF("pid", "p")
      // iid 11 is inverted; iid 12 is PATHOLOGICALLY inverted — an
      // unguarded sequence(hi div 8, lo div 8) of ~2.5e17 elements
      // would abort the query where the naive plan returns no rows
      val ivs = Seq((10L, 0L, 10L), (11L, 10L, 0L),
        (12L, 2000000000000000000L, 0L)).toDF("iid", "lo", "hi")
      points.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(run(on) === run(off))
    assert(run(off) === Set((1L, 10L)))
  }

  test("R148: null bounds and null points match nothing, as in the naive plan") {
    val on = freshSession(Some(8L)); val off = freshSession(None)
    def run(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      val points = Seq((1L, Some(5L)), (2L, None), (3L, Some(50L)))
        .toDF("pid", "p")
      val ivs = Seq((10L, Some(0L), Some(10L)), (11L, None, Some(10L)),
        (12L, Some(0L), None)).toDF("iid", "lo", "hi")
      points.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(run(on) === run(off))
    assert(run(off) === Set((1L, 10L)))
  }
}
