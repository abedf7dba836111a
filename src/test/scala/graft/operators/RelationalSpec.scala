package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Specs for the relational core R1-R19: plan-shape assertions (the
  * properties that matter at 100 TB) plus the R19 error-bound contract.
  * Value-level correctness is gated by the DuckDB oracle (Verify). */
class RelationalSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("R1: filter and projection reach the parquet scan") {
    val p = plan("q_scan_pushdown")
    assert(p.contains("PushedFilters: ["), "filters must be pushed to the scan")
    assert(p.contains("l_shipdate") && p.contains("l_returnflag"))
    // pruned read schema: none of the untouched wide columns
    assert(!p.contains("l_comment"), "projection pruning must drop unused columns")
  }

  test("R8: window rank pre-filters with WindowGroupLimit before any exchange") {
    val p = plan("q_window_rank")
    assert(p.contains("WindowGroupLimit"))
  }

  test("R3/R4: no forced broadcast of sf-proportional tables") {
    // code-level contract: only nation/region carry broadcast hints
    val q5 = graft.SparkEntry.queries("q5_local_supplier")(spark, sf)
    val hints = q5.queryExecution.logical.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h.name
    }
    // hints are resolved by now; check analyzed plan's ResolvedHint targets
    val resolved = q5.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(resolved.nonEmpty, "dimension broadcasts present")
    resolved.foreach { h =>
      val cols = h.child.output.map(_.name).mkString(",")
      assert(cols.contains("n_") || cols.contains("r_"),
        s"only nation/region may be broadcast, saw: $cols")
    }
  }

  test("R12: top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
  }

  test("R22: all four sequence window functions share ONE window pass") {
    val df = graft.SparkEntry.queries("q_window_funcs")(spark, sf)
    // sparkPlan, not executedPlan: AQE's wrapper node hides the inner
    // plan from collect until execution
    val windows = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.length === 1,
      s"lag/lead/first/ntile share a (partition, order) spec — expected one " +
        s"WindowExec, got ${windows.length}")
  }

  test("R54: winsorize clamps ~1% tails per group, thresholds ordered") {
    val rows = graft.SparkEntry.queries("q_winsorize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Double]("p_lo_q") < r.getAs[Double]("p_hi_q"))
      // strict-inequality clamp counts sit within one row of the 1% tails
      Seq("n_lo_clamped", "n_hi_clamped").foreach { c =>
        val clamped = r.getAs[Long](c)
        assert(clamped <= math.ceil(n * 0.01).toLong + 1, s"$c=$clamped of n=$n")
        assert(clamped >= math.floor(n * 0.01).toLong - 1, s"$c=$clamped of n=$n")
      }
      assert(r.getAs[Double]("sum_winsorized") > 0.0)
    }
  }

  test("R56: histogram covers every row once, spine dense, edges tile [min,max]") {
    val out = Relational.qHistogram.fn(spark, sf).collect()
    assert(out.map(_.getAs[Int]("bin")).toSeq === (0 until Relational.NBins))
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total === Tables.orders(spark, sf).count(),
      "every row lands in exactly one bin")
    // edges tile: bin i's hi edge is bin i+1's lo edge; widths equal
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("edge_hi") === b.getAs[Double]("edge_lo"))
      case _ =>
    }
    val st = Tables.orders(spark, sf)
      .agg(min("o_totalprice"), max("o_totalprice")).head()
    assert(math.abs(out.head.getAs[Double]("edge_lo") - st.getDouble(0)) < 1e-4)
    assert(math.abs(out.last.getAs[Double]("edge_hi") - st.getDouble(1)) < 1e-4)
  }

  test("R25: approx percentiles stay within 1% of the exact rank-arithmetic values") {
    val rows = graft.SparkEntry.queries("q_approx_percentile_eval")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("med_rel_err", "p90_rel_err", "p99_rel_err").foreach { c =>
        // observed ≤ 0.1% at every test sf; sketch is deterministic
        assert(r.getAs[Double](c) <= 0.01, s"$c=${r.getAs[Double](c)}")
      }
    }
  }

  test("R19: HLL approximate count-distinct is within its error bound") {
    // the entry is self-verifying: it emits exact, approx, and their
    // relative error; the independent exact recomputation here guards
    // the entry's own exact_parts column too
    val res = graft.SparkEntry.queries("q_approx_distinct")(spark, sf).collect()
    val exact = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res.nonEmpty)
    res.foreach { r =>
      val flag = r.getString(0)
      assert(r.getAs[Long]("exact_parts") === exact(flag),
        s"flag=$flag entry exact_parts disagrees with countDistinct")
      // rsd = 0.02; error is deterministic for fixed data (~1% observed)
      assert(r.getAs[Double]("abs_rel_err") <= 0.05,
        s"flag=$flag abs_rel_err=${r.getAs[Double]("abs_rel_err")}")
    }
  }

  test("no coverage query plans a cartesian product") {
    // BroadcastNestedLoopJoin is allowed only for the brute-force ANN
    // entries (intentional broadcast-query-set scan) and the
    // self-verifying entries whose 1-row corpus-stats cross join is an
    // intentional broadcast of a single aggregated row
    val bnljAllowed = Set("ann_bruteforce_topk", "ann_hard_negatives",
      "ann_lsh", "ann_ivf", "ann_ivf_imi", "ann_pq_adc", "ann_ivf_pq",
      // Hamming pre-rank inherits the recall-evidence 1-row cross join
      // of the other self-verifying ANN entries
      "ann_binary_hamming",
      // Q22's above-average-balance threshold is the sanctioned 1-row
      // aggregate broadcast crossJoin
      "q22_dormant_customers",
      // Q11's share-of-total threshold is the same class: the 1-row
      // (total, n_parts) aggregate broadcasts into the HAVING compare
      "q11_important_parts",
      "dedup_minhash_lsh", "dedup_simhash",
      "dedup_ngram_jaccard", "dedup_pipeline", "dedup_skew_stress",
      "text_bm25", "dedup_semantic", "text_lm_score",
      // KN scoring inherits D28's 1-row broadcast class (the bigram-
      // type total t_types crossJoins the scored stream)
      "text_lm_kn",
      // re-runs the D28 LM-scoring shape, so it inherits text_lm_score's
      // 1-row vocab-size broadcast
      "text_ppl_buckets",
      // 1-row stats broadcasts (sketch-union exact total, RI orphan
      // count, planted-recall evidence rows, DSIR's corpus-constant row)
      "q_sketch_rollup", "q_sketch_rollup_eval", "etl_quality_checks",
      "dedup_incremental", "text_dsir_select",
      // R129's merged-ALL row crossJoins its 1-row exact-percentile
      // instrumentation — the q_sketch_rollup convention
      "q_quantile_rollup", "q_quantile_rollup_eval",
      // bounded-broadcast eval-set scan, same class as ann_bruteforce
      "emb_decontaminate",
      // bounded-broadcast anchor-set corpus scan (D71's documented
      // shape), same class as ann_bruteforce/ann_hard_negatives
      "emb_triplets",
      // calendar-grid cross join: spine O(days) x groups O(5), bounded
      // by time not data — the gap-fill grid is broadcast-tiny
      "q_gapfill",
      // 1-row min/max stats broadcast onto the fact and the O(NBins)
      // spine — both bounded by construction
      "q_histogram",
      // 1-row total-count broadcast for the rank→bin arithmetic
      "q_histogram_depth",
      // 1-row n_total broadcast for the rank→decile arithmetic
      "q_decile_lift",
      // 1-row min/max stats broadcast for the PSI bin grid
      "q_psi",
      // bounded completion frame: O(value-grid) × O(event-types)
      // crossed aggregates plus a 1-row total broadcast
      "q_ks_drift",
      // 1-row corpus-total / corpus-size broadcasts for the
      // divergence and idf terms
      "text_entropy_jsd", "text_tfidf_keywords",
      // 1-row stats broadcasts: max order date + customer count (rfm),
      // order count (basket), self-join estimate total (explosion)
      "q_rfm", "q_market_basket", "q_join_explosion",
      // 1-row global purchase-share broadcast for the outcome rule
      "q_ab_test",
      // O(types)² pair frame from two bounded distinct-type aggregates
      "q_kmv_jaccard",
      // 1-row global-span stats broadcast for the derived zone box
      "q_zonemap_skipping",
      // 1-row corpus-size (N) stats broadcast for the idf term
      "text_index_retrieve",
      // 1-row broadcasts of the base chain's START value and the
      // summed removal effects onto the O(channels) report frame
      "q_markov_attribution",
      // bounded 4-phrase broadcast containment scan — the deliberate
      // cross-formulation check against the positional-index path
      "text_phrase_search",
      // 1-row per-table count aggregates crossed into the 3-row
      // erasure-plan report
      "etl_forget_cascade",
      // 1-row merge-count stats broadcast onto the O(batch) report
      // (the dedup_incremental convention)
      "dedup_clusters_incremental",
      // inherits D6's bounded-broadcast query scan (its ranked lists
      // ARE the ann_bruteforce output)
      "q_ranking_eval",
      // the dense retrieval leg IS the D6 bounded-broadcast scan; the
      // lexical leg and the fusion join are equi-joins
      "text_hybrid_rrf",
      // 1-row token-total and bigram-total broadcasts for the PMI terms
      "text_collocations",
      // bounded center-dim broadcast scan (E27's documented shape —
      // the per-point argmin needs every center, so the scan is the
      // operator; centers are O(hundreds) at any corpus size)
      "etl_geo_nearest",
      // 1-row n_total broadcast for the rank→pooled-rank mapping
      "q_quantile_normalize",
      // 1-row n_total broadcast for the rank→slot schedule arithmetic
      "q_curriculum_interleave",
      // 1-row max-event-time broadcast for the decay ages
      "q_decayed_topk",
      // inherits the D6/ann family's bounded-broadcast eval scan: the
      // exact baseline + per-nprobe probe passes all run in-entry
      "ann_nprobe_curve")
    graft.SparkEntry.queries.keys.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      if (!bnljAllowed(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unexpected nested-loop join")
    }
  }

  test("R40: per-group HLL sketches and their union estimate within 5% of exact") {
    val rows = Relational.qSketchRollupEval.fn(spark, sf).collect()
    assert(rows.length >= 2, "at least one group row plus the ALL union row")
    rows.foreach { r =>
      assert(r.getAs[Double]("rel_err") < 0.05,
        s"sketch estimate off by ${r.getAs[Double]("rel_err")} for ${r.getAs[String]("grp")}")
    }
    val all = rows.find(_.getAs[String]("grp") == "ALL").get
    val groupMax = rows.filter(_.getAs[String]("grp") != "ALL")
      .map(_.getAs[Long]("approx_distinct")).max
    // the union covers every group's key set: its estimate cannot sit
    // below the largest single group's (up to sketch noise already
    // bounded by the 5% gate above)
    assert(all.getAs[Long]("approx_distinct") >= (groupMax * 0.95).toLong)
  }

  test("R129: KLL quantile store — true rank error bounded, merged row tracks exact") {
    import org.apache.spark.sql.functions._
    val rows = Relational.qQuantileRollupEval.fn(spark, sf).collect()
    assert(rows.length >= 2, "group rows plus the merged ALL row")
    // the honest KLL guarantee is on RANK against the TRUE distribution:
    // recompute each sketch answer's empirical rank driver-side
    val cents = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("grp"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    def trueRank(grp: String, v: Long): Double = {
      val vs = if (grp == "ALL") cents.map(_._2)
        else cents.filter(_._1 == grp).map(_._2)
      vs.count(_ <= v).toDouble / vs.length
    }
    rows.foreach { r =>
      val grp = r.getAs[String]("grp")
      val r50 = trueRank(grp, r.getAs[Long]("ap_p50"))
      val r95 = trueRank(grp, r.getAs[Long]("ap_p95"))
      // ~1.7% normalized rank error at default k, 3 sigma headroom
      assert(math.abs(r50 - 0.5) < 0.03, s"p50 true rank $r50 for $grp")
      assert(math.abs(r95 - 0.95) < 0.03, s"p95 true rank $r95 for $grp")
      // on this unimodal data, value error is also tight
      assert(r.getAs[Double]("relerr_p50") < 0.05)
      assert(r.getAs[Double]("relerr_p95") < 0.05)
    }
    val all = rows.find(_.getAs[String]("grp") == "ALL").get
    val n = rows.filter(_.getAs[String]("grp") != "ALL")
      .map(_.getAs[Long]("n")).sum
    assert(all.getAs[Long]("n") === n, "merged row covers every group")
  }

  test("R63: MAD flags exactly the planted extremes a stddev z-score would dilute") {
    val rows = Relational.qMadOutliers.fn(spark, sf).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Double]("mad_q") > 0)
      // lineitem prices are broad but unimodal: the 3-MAD band must
      // keep the bulk (outlier fraction well under half)
      assert(r.getAs[Long]("n_outliers") < r.getAs[Long]("n") / 4)
    }
    // robustness: the flag threshold derives from median/MAD, so a few
    // huge planted values can't inflate their own yardstick — all 5
    // plants flag, and the clean rows' flags are unchanged
    import spark.implicits._
    def madFlags(df: org.apache.spark.sql.DataFrame): Map[Long, Boolean] = {
      val med = df.orderBy("x").collect().map(_.getDouble(1))
      val m = med(med.length / 2)
      val devs = med.map(v => math.abs(v - m)).sorted
      val mad = devs(devs.length / 2)
      df.collect().map(r => r.getLong(0) ->
        (math.abs(r.getDouble(1) - m) > 3.0 * 1.4826 * mad)).toMap
    }
    val clean = (1 to 101).map(i => (i.toLong, 100.0 + (i % 11))).toDF("id", "x")
    val dirty = clean.unionByName(
      (1 to 5).map(i => (1000L + i, 1e7 + i)).toDF("id", "x"))
    val flags = madFlags(dirty)
    (1001L to 1005L).foreach(id => assert(flags(id), s"plant $id must flag"))
    (1L to 101L).foreach(id => assert(!flags(id), s"clean $id must not flag"))
  }

  test("R62: nearest as-of dominates the backward-only as-of and uses both directions") {
    val nearest = Relational.qAsofNearest.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("purchase_event_id") ->
        (Option(r.getAs[String]("dir")),
          Option(r.getAs[Any]("dist_us")).map(_.asInstanceOf[Long]))).toMap
    assert(nearest.nonEmpty)
    val dirs = nearest.values.flatMap(_._1).toSet
    assert(dirs === Set("back", "fwd"),
      s"both directions must occur on real data, got $dirs")
    // the nearest match is never farther than the backward-only match
    val backOnly = Relational.qAsofJoin.fn(spark, sf)
      .join(Tables.events(spark, sf)
        .select(col("event_id").as("view_event_id"),
          unix_micros(col("ts")).as("v_us")), Seq("view_event_id"))
      .join(Tables.events(spark, sf)
        .select(col("event_id").as("purchase_event_id"),
          unix_micros(col("ts")).as("p_us")), Seq("purchase_event_id"))
      .select(col("purchase_event_id"), (col("p_us") - col("v_us")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    backOnly.foreach { case (pid, dBack) =>
      val (_, dNear) = nearest(pid)
      assert(dNear.exists(_ <= dBack),
        s"purchase $pid: nearest ${dNear} must be <= backward $dBack")
    }
  }

  test("R59: OLS trend slope equals a driver-side reference regression per group") {
    val out = Relational.qTrendSlope.fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("slope_q"),
          r.getAs[Long]("intercept_q"))).toMap
    assert(out.nonEmpty)
    val raw = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("x"),
        round(col("o_totalprice") * 100).cast("long").as("y"))
      .collect()
      .groupBy(_.getString(0))
    raw.foreach { case (prio, rows) =>
      val n = rows.length.toDouble
      val xs = rows.map(_.getAs[Int]("x").toDouble)
      val ys = rows.map(_.getAs[Long]("y").toDouble)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val (gotN, gotSlope, gotIcept) = out(prio)
      assert(gotN === rows.length)
      // quantized engine values within one quantum of the double ref
      // (the engine sums exactly; the reference sums doubles)
      assert(math.abs(gotSlope - math.floor(slope * 1e6)) <= 1,
        s"$prio slope_q $gotSlope vs ref ${math.floor(slope * 1e6)}")
      val icept = (sy - slope * sx) / n
      assert(math.abs(gotIcept - math.floor(icept * 1e2)) <= 1,
        s"$prio intercept_q $gotIcept vs ref ${math.floor(icept * 1e2)}")
    }
  }

  test("R58: sketch overlap estimates within bounds; union consistent with inclusion-exclusion") {
    val rows = Relational.qSketchOverlap.fn(spark, sf).collect()
      .map(r => r.getAs[String]("metric") ->
        (r.getAs[Long]("exact"), r.getAs[Double]("approx"),
          r.getAs[Double]("rel_err"))).toMap
    assert(rows.keySet === Set("segment_a", "segment_b", "union", "intersection"))
    // direct sketch estimates carry standard HLL error
    Seq("segment_a", "segment_b", "union").foreach { m =>
      assert(rows(m)._3 < 0.05, s"$m rel_err ${rows(m)._3}") }
    // the derived intersection inherits the union's absolute error —
    // looser bound, still must be informative on this data
    assert(rows("intersection")._3 < 0.15,
      s"intersection rel_err ${rows("intersection")._3}")
    // exact-side sanity: inclusion-exclusion holds exactly
    assert(rows("segment_a")._1 + rows("segment_b")._1 -
      rows("intersection")._1 === rows("union")._1)
  }

  test("R140: Theil-Sen equals a driver-side pairwise-median replay and resists a planted outlier") {
    import org.apache.spark.sql.functions._
    val monthly = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("g"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("x"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def doubledMedianSlope(pts: Seq[(Long, Long)]): Long = {
      val slopes = (for {
        a <- pts; b <- pts if a._1 < b._1
        // JVM long division truncates toward zero — exactly what both
        // Spark's `div` and DuckDB's `//` do (verified on negatives)
      } yield (b._2 - a._2) * 1000000L / (b._1 - a._1)).sorted
      val n = slopes.length
      slopes((n + 1) / 2 - 1) + slopes(n / 2)
    }
    val ref = monthly.groupBy(_._1).map { case (g, pts) =>
      g -> doubledMedianSlope(pts.map(p => (p._2, p._3)).toSeq) }
    val got = Relational.qTheilSen.fn(spark, sf).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Long]("slope2_q")).toMap
    assert(got === ref)
    // robustness: corrupt ONE month's total 100x for one group and
    // recompute the reference — the median slope barely moves, while
    // an OLS fit through the same points swings wildly
    val g0 = monthly.head._1
    val pts = monthly.filter(_._1 == g0).map(p => (p._2, p._3)).toSeq
    val corrupted = pts.updated(pts.length / 2,
      (pts(pts.length / 2)._1, pts(pts.length / 2)._2 * 100))
    val cleanM = doubledMedianSlope(pts)
    val corrM = doubledMedianSlope(corrupted)
    def ols(ps: Seq[(Long, Long)]): Double = {
      val n = ps.length.toDouble
      val sx = ps.map(_._1).sum.toDouble; val sy = ps.map(_._2).sum.toDouble
      val sxy = ps.map(p => p._1.toDouble * p._2).sum
      val sxx = ps.map(p => p._1.toDouble * p._1).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    val olsShift = math.abs(ols(corrupted) - ols(pts))
    // slope2_q is doubled AND ppm-quantized — convert to cents/month
    val tsShift = math.abs(corrM - cleanM) / 2.0 / 1e6
    assert(tsShift < olsShift / 10,
      s"Theil-Sen shift $tsShift should be tiny vs OLS shift $olsShift")
  }

  test("R138: merged top-k sketches find the true heavy hitters with tight counts") {
    import org.apache.spark.sql.functions._
    val rows = Relational.qTopkSketchRollup.fn(spark, sf).collect()
    assert(rows.length >= 10)
    rows.foreach { r =>
      assert(r.getAs[Double]("rel_err") < 0.05,
        s"${r.getAs[String]("w")} rel_err ${r.getAs[Double]("rel_err")}")
    }
    // the true top-5 words must all appear in the estimated top-20
    val exactTop5 = graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.Text.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("w")).limit(5)
      .collect().map(_.getString(0)).toSet
    val estimated = rows.map(_.getAs[String]("w")).toSet
    assert(exactTop5.subsetOf(estimated),
      s"missing true heavy hitters: ${exactTop5 -- estimated}")
  }

  test("R130: theta set algebra — direct intersection/difference within bounds") {
    val rows = Relational.qThetaAlgebra.fn(spark, sf).collect()
      .map(r => r.getAs[String]("metric") ->
        (r.getAs[Long]("exact"), r.getAs[Double]("approx"),
          r.getAs[Double]("rel_err"))).toMap
    assert(rows.keySet === Set("segment_a", "segment_b", "union",
      "intersection", "a_minus_b"))
    // every metric — INCLUDING the intersection and difference, which
    // theta computes directly rather than deriving — stays tight; this
    // is the structural edge over R58's inclusion-exclusion (its
    // intersection bound is 15%)
    rows.foreach { case (m, (exact, approx, err)) =>
      if (exact > 0) assert(err < 0.05, s"$m rel_err $err")
      else assert(approx === 0.0, s"empty $m must estimate 0") }
    // exact-side partition law: a = (a minus b) + intersection
    assert(rows("a_minus_b")._1 + rows("intersection")._1 ===
      rows("segment_a")._1)
  }

  test("R47: the LATERAL top-N decorrelates to a window rank, not a nested loop") {
    val plan = Relational.qLateralTopn.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"LATERAL must not plan a per-outer-row loop:\n$plan")
    assert(plan.contains("Window"),
      s"decorrelation should produce the window top-k shape:\n$plan")
  }

  test("driver contract: entry() returns rows under a plain session") {
    // the driver smoke-checks entry() with ITS OWN session — the query
    // must not depend on graft session extensions or legacy confs
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every coverage entry executes at sf0.001") {
    // LSH candidate entries may legitimately be empty at tiny sf
    val mayBeEmpty = Set("q_anti_join", "dedup_minhash_lsh", "dedup_simhash",
      "dedup_ngram_jaccard", "dedup_embedding_cosine")
    graft.SparkEntry.allDefs.foreach { q =>
      val n = q.fn(spark, sf).count()
      assert(n >= 0, s"${q.name} failed")
      if (!mayBeEmpty(q.name))
        assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("R38: the recursion budget never leaks into the parent session") {
    // r12 set spark.sql.cteRecursionRowLimit session-globally, silently
    // disabling the runaway-recursion guard for every later recursive
    // CTE of the run; the entry now budgets a CHILD session (R148
    // pattern). The parent's conf — default or explicit — must be
    // untouched after the entry executes.
    val key = "spark.sql.cteRecursionRowLimit"
    val before = spark.conf.getOption(key)
    assert(Relational.qRecursiveCte.fn(spark, sf).count() > 0)
    assert(spark.conf.getOption(key) === before,
      "q_recursive_cte must scope its recursion budget to a child session")
  }

  test("R150: the weighted median replays exactly and dominates by mass") {
    val rows = Relational.qWeightedMedian.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val data = graft.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2).toLong))
      .groupBy(_._1)
    rows.foreach { r =>
      val f = r.getString(0)
      val sorted = data(f).sortBy(_._2)
      val tot = sorted.map(_._3).sum
      assert(r.getAs[Long]("total_weight") === tot)
      // lower weighted quantile via sequential scan (RANGE-frame ties
      // share cumulative mass, so a plain running sum agrees at the
      // crossing price)
      def pick(num: Long, den: Long): Double = {
        var cw = 0L
        sorted.find { case (_, _, q) => cw += q; cw * den >= tot * num }
          .get._2
      }
      assert(r.getAs[Double]("wmed_price") === pick(1, 2), s"flag $f median")
      assert(r.getAs[Double]("wp90_price") === pick(9, 10), s"flag $f p90")
      // half the MASS sits at or below the weighted median
      val below = sorted.filter(_._2 <= r.getAs[Double]("wmed_price"))
        .map(_._3).sum
      assert(below * 2 >= tot)
    }
  }

  test("R27b: the bucket-parallel sliding window equals the plain RANGE " +
      "window bit for bit, and its window partitions carry the bucket key") {
    val plain = Relational.qSlidingWindow.fn(spark, sf).collect().map(_.toSeq)
    val blocked = Relational.qSlidingWindowBlocked.fn(spark, sf)
    assert(blocked.collect().map(_.toSeq).toSeq === plain.toSeq,
      "blocked decomposition must reproduce the exact window result")
    // the skew defense IS the partitioning: every window in the blocked
    // plan partitions by (user, bucket), never by user alone — a hot
    // user's history spreads across its time buckets instead of one task
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val windows = blocked.queryExecution.optimizedPlan.collect {
      case w: LWindow => w.partitionSpec.map(_.sql.toLowerCase).mkString(",")
    }
    assert(windows.nonEmpty)
    windows.foreach(p => assert(p.contains("bucket"),
      s"window partition spec missing the bucket key: $p"))
  }

  test("R27b: NULL values — the blocked window keeps SUM/COUNT(*) null " +
      "semantics (null-valued rows count in hour_n; hour_sum is null only " +
      "when the WHOLE frame is null, even when one half-frame is all-null)") {
    // generated corpora carry no null values, so this law needs its own
    // fixture: user 1 hits the all-null OWN-BUCKET PREFIX + non-null
    // prev-bucket suffix case (a one-sided coalesce returns null there);
    // user 2 is all-null (sum must stay null); user 3 mixes both orders
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r27b_nulls").toString
    val S = 1000000L // seconds -> micros
    val rows = Seq[(Long, Long, Long, java.lang.Double)](
      (1L, 1800L * S, 1L, 1.5), (2L, 2100L * S, 1L, 2.5),
      (3L, 4200L * S, 1L, null),
      (4L, 1800L * S, 2L, null), (5L, 4200L * S, 2L, null),
      (6L, 1800L * S, 3L, 3.0), (7L, 4200L * S, 3L, null),
      (8L, 4500L * S, 3L, 1.0))
    import spark.implicits._
    rows.toDF("event_id", "ts_us", "user_id", "value")
      .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
        col("user_id"), lit("x").as("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val plain = Relational.qSlidingWindow.fn(spark, dir)
      .collect().map(_.toSeq).toSeq
    val blocked = Relational.qSlidingWindowBlocked.fn(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(blocked === plain,
      "blocked decomposition must reproduce the window result under nulls")
    // pin the law independently so parity-with-the-same-bug cannot pass:
    // event 3's frame [600s,4200s] holds 1.5+2.5+null -> sum 4.0, n 3
    // (its own bucket is ALL-null; the old one-sided coalesce gave null)
    val e3 = blocked.find(_.head == 3L).get
    assert(e3(4) === 4.0 && e3(5) === 3L, s"event 3 got $e3")
    // user 2: every value null -> sum null, but COUNT(*) still counts
    val e5 = blocked.find(_.head == 5L).get
    assert(e5(4) == null && e5(5) === 2L, s"event 5 got $e5")
  }
}
