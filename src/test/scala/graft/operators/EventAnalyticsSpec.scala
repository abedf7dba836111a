package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** R38/R39 — funnel and cohort semantics the SQL oracle can't state
  * as invariants: stage monotonicity, strict ordering, and the
  * cohort-size identity. */
class EventAnalyticsSpec extends SparkSpec {

  test("funnel stages shrink monotonically and start non-empty") {
    val rows = EventAnalytics.funnel(spark, sf)
      .orderBy("stage_ord").collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq ===
      Seq("view", "click", "purchase"))
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts.head > 0)
    assert(counts.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("funnel stage-2 users all have a click strictly after their first view") {
    val ev = Tables.events(spark, sf)
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("v_ts"))
    // recompute stage 2 independently: users with any click after v_ts
    val expected = ev.filter(col("event_type") === "click")
      .join(firstView, "user_id")
      .filter(col("ts") > col("v_ts"))
      .select("user_id").distinct().count()
    val got = EventAnalytics.funnel(spark, sf)
      .filter(col("stage") === "click").head().getAs[Long]("n_users")
    assert(got === expected)
  }

  test("transition matrix is row-stochastic and conserves step count") {
    val m = EventAnalytics.eventTransitions(spark, sf).cache()
    // every user with k events contributes k-1 transitions
    val expectedSteps = Tables.events(spark, sf)
      .groupBy("user_id").count()
      .agg(sum(col("count") - 1)).head().getLong(0)
    assert(m.agg(sum("n")).head().getLong(0) === expectedSteps)
    // each row's floor-quantized probs sum to 1e6 minus at most one
    // floor-loss unit per cell
    val rows = m.groupBy("src_type")
      .agg(sum("prob_q").as("p"), count(lit(1)).as("cells")).collect()
    rows.foreach { r =>
      val (p, cells) = (r.getAs[Long]("p"), r.getAs[Long]("cells"))
      assert(p <= 1000000L && p > 1000000L - cells,
        s"row ${r.getString(0)}: quantized mass $p over $cells cells")
    }
    m.unpersist()
  }

  test("cohort offset-0 cell equals the cohort's size") {
    val ret = EventAnalytics.cohortRetention(spark, sf)
    val offset0 = ret.filter(col("month_offset") === 0)
      .select(col("cohort_month"), col("n_active"))
    val cohortSizes = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(min(trunc(col("o_orderdate"), "MM")).as("cohort"))
      .groupBy(date_format(col("cohort"), "yyyy-MM").as("cohort_month"))
      .agg(count(lit(1)).as("n_customers"))
    val joined = offset0.join(cohortSizes, "cohort_month")
    assert(joined.count() > 0)
    assert(joined.filter(col("n_active") =!= col("n_customers")).count() === 0)
    // no negative offsets: nothing is active before its cohort month
    assert(ret.filter(col("month_offset") < 0).count() === 0)
  }

  test("R50: merged intervals are disjoint per user and conserve events") {
    val merged = EventAnalytics.mergedIntervals(spark, sf).cache()
    // intervals well-formed
    assert(merged.filter(col("end_us") <= col("start_us")).count() === 0)
    // islands pairwise disjoint: next island starts strictly after prev end
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("island")
    val overlaps = merged
      .withColumn("prev_end", lag(col("end_us"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("start_us") <= col("prev_end"))
    assert(overlaps.count() === 0, "adjacent islands must not overlap")
    // every event lands in exactly one island
    val nEvents = Tables.events(spark, sf).count()
    val total = merged.agg(sum("n_events")).head().getLong(0)
    assert(total === nEvents)
    merged.unpersist()
  }

  test("R55: rolling 7-day distinct equals a naive per-day recount") {
    val out = EventAnalytics.rollingDistinct(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // dau can never exceed the trailing-window distinct count, and the
    // earliest reported day has nothing trailing it: wau == dau there
    rows.foreach { r =>
      assert(r.getAs[Long]("wau_7d") >= r.getAs[Long]("dau"))
    }
    val first = rows.minBy(_.getAs[java.sql.Date]("window_day").getTime)
    assert(first.getAs[Long]("wau_7d") === first.getAs[Long]("dau"))
    // naive reference: (user, day) pairs range-joined to the day spine
    val pairs = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val days = pairs.select(col("day").as("window_day")).distinct()
    val naive = days.join(pairs,
        col("day") >= date_sub(col("window_day"), 6) &&
          col("day") <= col("window_day"))
      .groupBy("window_day")
      .agg(countDistinct(when(col("day") === col("window_day"),
          col("user_id"))).as("dau"),
        countDistinct(col("user_id")).as("wau_7d"))
      .select("window_day", "dau", "wau_7d")
    assert(out.exceptAll(naive).isEmpty && naive.exceptAll(out).isEmpty,
      "fan-out rolling distinct must equal the naive range-join recount")
    out.unpersist()
  }

  test("R64: the conversion window only ever shrinks the funnel") {
    val unbounded = EventAnalytics.funnel(spark, sf).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    val windowed = EventAnalytics.funnel(spark, sf, Some(24)).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(windowed("view") === unbounded("view"),
      "stage 1 has no previous stage — identical")
    Seq("click", "purchase").foreach { s =>
      assert(windowed(s) <= unbounded(s), s"window must not grow stage $s")
    }
    // a tight window must actually bite on month-spread events
    val tight = EventAnalytics.funnel(spark, sf, Some(1)).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(tight("click") < unbounded("click"),
      "a 1-hour window over month-spread events must exclude someone")
  }

  test("R61: cumulative-distinct curve is monotone and converges to the true distinct count") {
    val rows = EventAnalytics.cumulativeDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    val totals = rows.map(_.getAs[Long]("total_users"))
    assert(totals.sliding(2).forall(s => s.length < 2 || s(0) < s(1)),
      "every reported hour adds at least one new user, so totals strictly rise")
    assert(rows.map(_.getAs[Long]("new_users")).sum === totals.last)
    val trueDistinct = Tables.events(spark, sf)
      .select(countDistinct("user_id")).head().getLong(0)
    assert(totals.last === trueDistinct)
  }

  test("R60: TWAP equals an exact sequential reference and sits in the value range") {
    val out = EventAnalytics.twapByUser(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("twap_q"))).toMap
    assert(out.nonEmpty)
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value")).collect()
      .groupBy(_.getAs[Long]("user_id"))
    raw.foreach { case (u, rows) =>
      val seq = rows.sortBy(r =>
        (r.getAs[Long]("us"), r.getAs[Long]("event_id")))
      val ivs = seq.sliding(2).collect { case Array(a, b) =>
        val dur = BigInt(b.getAs[Long]("us") - a.getAs[Long]("us"))
        val vq = BigInt(math.floor(a.getAs[Double]("value") * 1e6).toLong)
        (vq * dur, dur)
      }.toSeq
      val dsum = ivs.map(_._2).sum
      if (ivs.isEmpty || dsum == 0) assert(!out.contains(u))
      else {
        val wsum = ivs.map(_._1).sum
        val expected =
          math.floor(wsum.toDouble / dsum.toDouble).toLong
        assert(out(u) === ((ivs.length.toLong, expected)), s"user $u")
        // TWAP is a convex combination of quantized sample values
        val vqs = seq.init.map(r =>
          math.floor(r.getAs[Double]("value") * 1e6).toLong)
        assert(out(u)._2 >= vqs.min - 1 && out(u)._2 <= vqs.max)
      }
    }
  }

  test("R51: EWMA matches a sequential fold and sits inside the value range") {
    val out = EventAnalytics.ewmaByUser(spark, sf).cache()
    // reference: straight Scala fold per user
    val ref = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"), col("value")).collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rows) =>
        val vals = rows.sortBy(r =>
          (r.getAs[Long]("tus"), r.getAs[Long]("event_id")))
          .map(_.getAs[Double]("value"))
        val e = vals.tail.foldLeft(vals.head)((acc, x) => 0.25 * x + 0.75 * acc)
        u -> math.floor(e * 1e6 + 0.5) / 1e6
      }
    out.collect().foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(r.getAs[Double]("ewma_q") === ref(u),
        s"user $u: engine EWMA != sequential fold")
    }
    out.unpersist()
  }

  test("R104: sequence-regex counts equal a driver-side Java regex replay") {
    val out = EventAnalytics.eventRegex(spark, sf).cache()
    // rebuild each user's sequence independently and re-count with
    // java.util.regex directly — same patterns, same lazy quantifiers
    val seqs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"),
        substring(col("event_type"), 1, 1).as("ch"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000, r.getString(3)))
      .groupBy(_._1)
      .map { case (u, xs) =>
        u -> xs.sortBy(x => (x._3, x._2)).map(_._4).mkString }
    def cnt(s: String, p: String) =
      p.r.findAllMatchIn(s).length
    val rows = out.collect()
    assert(rows.length === seqs.size)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val s = seqs(u)
      assert(r.getAs[Int]("seq_len") === s.length)
      assert(r.getAs[Int]("n_clean_funnels") === cnt(s, "v[^e]*?c[^e]*?p"),
        s"user $u clean-funnel count, seq=$s")
      assert(r.getAs[Int]("n_aborted_views") === cnt(s, "v[^ce]*?e"),
        s"user $u aborted-view count, seq=$s")
    }
    // the patterns must actually discriminate on this fixture
    assert(rows.exists(_.getAs[Int]("n_clean_funnels") > 0))
    assert(rows.exists(_.getAs[Int]("n_aborted_views") > 0))
    out.unpersist()
  }

  test("R141: isolation equals a driver-side neighbor-gap replay") {
    import org.apache.spark.sql.functions._
    val gap = 15L * 60L * 1000000L
    val hist = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._4, e._2))).toMap
    val ref = scala.collection.mutable.Map[String, (Long, Long)]()
      .withDefaultValue((0L, 0L))
    hist.values.foreach { seq =>
      seq.zipWithIndex.foreach { case (e, i) =>
        val prevFar = i == 0 || e._4 - seq(i - 1)._4 > gap
        val nextFar = i == seq.length - 1 || seq(i + 1)._4 - e._4 > gap
        val (n, ni) = ref(e._3)
        ref(e._3) = (n + 1, ni + (if (prevFar && nextFar) 1 else 0))
      }
    }
    val got = EventAnalytics.qIsolatedEvents.fn(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_isolated"))).toMap
    assert(got === ref.toMap)
    assert(got.values.exists(_._2 > 0), "fixture must contain loners")
    assert(got.values.exists(v => v._2 < v._1),
      "fixture must contain clustered events too")
  }

  test("R139: both attribution models credit every purchase; agreement bounded") {
    import org.apache.spark.sql.functions._
    val rows = EventAnalytics.qAttributionCompare.fn(spark, sf).collect()
      .map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_last"), r.getAs[Long]("n_first"),
          r.getAs[Long]("n_agree"))).toMap
    assert(rows.nonEmpty)
    // both models partition the same credited-purchase set
    val totLast = rows.values.map(_._1).sum
    val totFirst = rows.values.map(_._2).sum
    assert(totLast === totFirst,
      "first- and last-touch credit the same purchases, differently")
    rows.foreach { case (t, (l, f, a)) =>
      assert(a <= math.min(l, f), s"$t agreement can't exceed either model")
    }
    // driver replay per user
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._3, e._4))).toMap
    var refLast = Map[String, Long]().withDefaultValue(0L)
    var refFirst = Map[String, Long]().withDefaultValue(0L)
    evs.values.foreach { seq =>
      var first: Option[String] = None
      var lastT: Option[String] = None
      seq.foreach { e =>
        if (e._2 == "view" || e._2 == "click") {
          if (first.isEmpty) first = Some(e._2)
          lastT = Some(e._2)
        } else if (e._2 == "purchase" && lastT.nonEmpty) {
          refLast += lastT.get -> (refLast(lastT.get) + 1)
          refFirst += first.get -> (refFirst(first.get) + 1)
        }
      }
    }
    assert(rows.view.mapValues(_._1).toMap === refLast.toMap)
    assert(rows.view.mapValues(_._2).toMap === refFirst.toMap)
  }

  test("R133: RLE is lossless — runs tile each history and adjacent runs differ") {
    import org.apache.spark.sql.functions._
    val runs = EventAnalytics.qRunLength.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("run_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("run_len")))
    val perUserRuns = runs.groupBy(_._1).view
      .mapValues(_.sortBy(_._2)).toMap
    val counts = graft.Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    perUserRuns.foreach { case (u, rs) =>
      assert(rs.map(_._4).sum === counts(u), s"runs must tile user $u")
      assert(rs.map(_._2).toSeq === (1L to rs.length).toSeq,
        "run ids dense from 1")
      rs.sliding(2).filter(_.length == 2).foreach { p =>
        assert(p(0)._3 != p(1)._3,
          s"adjacent runs for user $u must differ in type (else not maximal)")
      }
    }
    // decode round-trip for one user with a genuinely multi-run history
    val u = perUserRuns.collectFirst {
      case (u, rs) if rs.length > 3 => u }.get
    val decoded = perUserRuns(u).flatMap(r => Seq.fill(r._4.toInt)(r._3))
    val src = graft.Tables.events(spark, sf)
      .filter(col("user_id") === u)
      .select(col("event_type"), unix_micros(col("ts")).as("t"),
        col("event_id"))
      .orderBy("t", "event_id").collect().map(_.getString(0)).toSeq
    assert(decoded.toSeq === src)
  }

  test("R132: window-merged daily sketches track the exact rolling distinct") {
    val rows = EventAnalytics.qRollingDistinctSketch.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("rel_err") < 0.05,
        s"day ${r.getAs[java.sql.Date]("window_day")} rel_err " +
          s"${r.getAs[Double]("rel_err")}")
      // an HLL union can only see users the exact window saw
      assert(r.getAs[Long]("wau_approx") > 0)
    }
    // every exact window day gets a sketch answer (same day coverage)
    val exactDays = EventAnalytics.qRollingDistinct.fn(spark, sf)
      .collect().map(_.getAs[java.sql.Date]("window_day")).toSet
    assert(rows.map(_.getAs[java.sql.Date]("window_day")).toSet === exactDays)
  }

  test("R156: decayed leaderboard replays exactly and outranks stale heavy users") {
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val tMax = raw.map(_._2).max
    // the decay table itself obeys the half-life law it tabulates
    val dd = EventAnalytics.DecayDays
    assert(dd(0) === 1000000000L && dd(7) === 500000000L &&
      dd(14) === 250000000L && dd.last === 0L)
    assert(dd.sliding(2).forall(p => p(0) >= p(1)), "monotone decay")
    val dayUs = 86400L * 1000000L
    val scores = raw.groupBy(_._1).map { case (u, evs) =>
      (u, evs.length.toLong,
        evs.map(e => dd(math.min((tMax - e._2) / dayUs, 210L).toInt)).sum)
    }
    val expect = scores.toSeq.sortBy(s => (-s._3, s._1)).take(20)
    val got = EventAnalytics.qDecayedTopk.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expect)
    // decay really reorders: the top-20 by decayed score differs from
    // the top-20 by raw count (else the operator is a plain count)
    val byCount = scores.toSeq.sortBy(s => (-s._2, s._1)).take(20).map(_._1)
    assert(got.map(_._1).toSeq != byCount)
    // bound: a score never exceeds n_events (each factor ≤ 1)
    got.foreach { g => assert(g._3 <= g._2 * 1000000000L) }
  }
}
