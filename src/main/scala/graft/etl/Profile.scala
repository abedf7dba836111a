package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E26 — generic one-pass table profiling: per column, the stats a
  * data engineer reads before trusting a feed — row/null counts,
  * distinct cardinality, lexicographic min/max, and the modal value
  * with its share. The reference validates per-record shape at ingest
  * (Net7-ETL-Bus CSV contract); profiling is the table-level
  * generalization every warehouse "describe" implements.
  *
  * Shape: UNPIVOT the projected columns to (col_name, val) rows —
  * ONE generic aggregation pipeline then serves any table and any
  * column list (no per-column query fan-out), and the whole profile
  * is two keyed aggregations; the mode is a struct-min inside the
  * second. Cardinalities here are EXACT (the oracle demands it); at
  * 100 TB the countDistinct swaps for the R19 HLL sketch and the
  * mode for the D21 heavy-hitters sketch, both already in SURVEY. */
object Profile {

  /** (col_name, val-as-string) long form of `df`'s `cols`. */
  def unpivoted(df: DataFrame, cols: Seq[String]): DataFrame = {
    val args = lit(cols.size) +:
      cols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    df.select(stack(args: _*).as(Seq("col_name", "val")))
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // EVERYTHING derives from one (col, val) count table — a separate
    // countDistinct pass would re-shuffle the full long form a second
    // time (it builds its own internal distinct), and the mode a
    // third; measured 13.4 → ~5 s at sf0.1. The mode rides the SAME
    // per-column aggregation as the stats: min over the lexicographic
    // (−cnt, val) struct IS "highest count, ties to the smallest
    // value" — so the count table has exactly one consumer (no
    // checkpoint pin, no per-column window sort, no stats⋈mode join;
    // 2 exchanges total, measured 3.0 → ~1.9 s at sf0.1).
    val g = unpivoted(df, cols)
      .groupBy("col_name", "val").agg(count(lit(1)).as("cnt"))
    g.groupBy("col_name").agg(
        sum("cnt").as("n"),
        sum(when(col("val").isNull, col("cnt")).otherwise(0L)).as("nulls"),
        count(when(col("val").isNotNull, lit(1))).as("n_distinct"),
        min("val").as("min_val"), max("val").as("max_val"),
        min(when(col("val").isNotNull,
          struct((-col("cnt")).as("nc"), col("val").as("v")))).as("m"))
      .select(col("col_name"), col("n"),
        expr("(nulls * 1000000) div n").as("null_ppm"),
        col("n_distinct"), col("min_val"), col("max_val"),
        col("m.v").as("top_val"), (-col("m.nc")).as("top_n"),
        expr("((-m.nc) * 1000000) div n").as("top_ppm"))
      .orderBy("col_name")
  }

  private val LineitemCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
    "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")

  val etlProfileTable = QueryDef(
    "etl_profile_table",
    (s, d) => profile(Tables.lineitem(s, d), LineitemCols),
    Some {
      val union = LineitemCols.map(c =>
        s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS val FROM lineitem")
        .mkString("\n               UNION ALL ")
      s"""WITH long AS (
               $union),
             stats AS (SELECT col_name, CAST(count(*) AS BIGINT) AS n,
                         CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END)
                           AS BIGINT) AS nulls,
                         CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
                         MIN(val) AS min_val, MAX(val) AS max_val
                       FROM long GROUP BY 1),
             mode AS (SELECT col_name, val AS top_val,
                        CAST(cnt AS BIGINT) AS top_n
                      FROM (SELECT col_name, val, count(*) AS cnt,
                              row_number() OVER (PARTITION BY col_name
                                ORDER BY count(*) DESC, val) AS rnk
                            FROM long WHERE val IS NOT NULL
                            GROUP BY col_name, val)
                      WHERE rnk = 1)
             SELECT stats.col_name, n,
                    CAST((nulls * 1000000) // n AS BIGINT) AS null_ppm,
                    n_distinct, min_val, max_val, top_val, top_n,
                    CAST((top_n * 1000000) // n AS BIGINT) AS top_ppm
             FROM stats LEFT JOIN mode ON stats.col_name = mode.col_name
             ORDER BY stats.col_name"""
    })

  /** E26b — the 100 TB profile the E26 Scaladoc promises: distinct
    * cardinality via HLL (approx_count_distinct) and the mode via the
    * approx_top_k heavy-hitter sketch, all fused into ONE aggregation
    * over the long form — no count table, no second shuffle, no mode
    * window. Exact row/null/min/max stats ride the same pass for
    * free. SELF-VERIFYING (rows-only, the R19 convention): the entry
    * joins the exact E26 profile and emits the distinct-count relative
    * error and a mode-agreement flag in its own output, spec-bounded;
    * a production run executes only the sketch side. */
  def profileSketch(df: DataFrame, cols: Seq[String]): DataFrame = {
    // ONE WIDE GLOBAL AGGREGATION (cols × 5 expressions) over the
    // TYPED columns instead of unpivot-to-string + groupBy(col_name).
    // The r8 bench bisection showed the long form's cost is the
    // per-VALUE string casts (9.6M double/timestamp toString calls at
    // sf0.1 — 4.4 s of the entry's 5.6 s), not the sketches; typed
    // aggregation pays zero casts on the data path and renders only
    // the #cols aggregated results to string at the end. min/max are
    // therefore TYPE-ordered — the profiler-correct reading (the
    // string form ranks "10.0" < "9.0"); on string columns the two
    // orders coincide and the E26-parity spec pins that. At 100 TB
    // this is also the shape that never shuffles more than
    // cols × sketch-size bytes and never explodes rows.
    // sketch updates are CPU-bound per row (the README text-stage
    // rule): when a SMALL input's byte-driven scan parallelism
    // undershoots the cores (one parquet file → one partition → one
    // core doing 16 HLL updates per row), spread it first; at scale
    // the input has far more partitions than cores and this branch
    // never fires — no 100 TB table ever repartitions here
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // The valve reads df.rdd.getNumPartitions, and under AQE converting
    // a MULTI-STAGE frame to an RDD materializes its upstream shuffle
    // stages — the public API would silently execute the input once
    // just to read a partition count. Gate on the optimized plan being
    // shuffle-free (scan/filter/project only): there .rdd plans without
    // running any job, and that is exactly the raw-file-scan case the
    // valve exists for. Multi-stage inputs skip the valve — their
    // shuffle already set parallelism. The gate is a WHITELIST of the
    // stated shape (every node a leaf, Filter, Project, or union of
    // such), not a blacklist of shuffle-inducing nodes: a blacklist
    // silently admits nodes it forgot (Deduplicate — dropDuplicates
    // survives optimization as Deduplicate, not Aggregate — group-map
    // nodes, future operators), and an admitted shuffle means .rdd
    // materializes upstream stages under AQE, the exact behavior this
    // valve exists to prevent. An unknown node skips the valve —
    // always safe, never a hidden job.
    import org.apache.spark.sql.catalyst.plans.{logical => lp}
    val shuffleFree = !df.queryExecution.optimizedPlan.exists {
      case _: lp.LeafNode | _: lp.Filter | _: lp.Project | _: lp.Union =>
        false
      case _ => true
    }
    val src =
      if (shuffleFree && df.rdd.getNumPartitions < cores)
        // HASH-keyed on the profiled columns, not round-robin: every
        // keyless repartition(n) first pays a local sort of its input
        // (spark.sql.execution.sortBeforeRepartition, guide §2.5) so
        // retried tasks reproduce their row routing — hashing the
        // profiled columns spreads just as evenly (high-cardinality
        // key set) with no sort and stays deterministic under retry
        df.repartition(cores, cols.map(col): _*)
      else df
    val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls__$c"),
        approx_count_distinct(col(c), 0.02).as(s"ad__$c"),
        min(col(c)).cast("string").as(s"min__$c"),
        max(col(c)).cast("string").as(s"max__$c"),
        expr(s"CAST(try_element_at(approx_top_k($c, 1, 256), 1).item AS STRING)")
          .as(s"top__$c"))
    }
    val wide = src.agg(aggs.head, aggs.tail: _*)
    val stackArgs = lit(cols.size) +: cols.flatMap(c => Seq(
      lit(c), col(s"nulls__$c"), col(s"ad__$c"),
      col(s"min__$c"), col(s"max__$c"), col(s"top__$c")))
    wide.select(col("n"), stack(stackArgs: _*)
        .as(Seq("col_name", "nulls", "approx_distinct", "min_val",
          "max_val", "approx_top_val")))
      .select(col("col_name"), col("n"), col("nulls"),
        col("approx_distinct"), col("min_val"), col("max_val"),
        col("approx_top_val"))
  }

  /** Production entry: the one-pass sketch profile alone. The exact
    * countDistinct instrumentation is [[etlProfileSketchEval]] (r14
    * un-fork of the r13 svBaselines conf gate: bench, verify and the
    * specs all execute the same declared bodies). */
  val etlProfileSketch = QueryDef(
    "etl_profile_sketch",
    (s, d) => profileSketch(Tables.lineitem(s, d), LineitemCols)
      .orderBy("col_name"),
    None)

  /** Eval companion: exact distinct per column (one aggregation — the
    * full E26 count-table profile in here would triple the entry's
    * cost; the sketch MODE is exactness-verified in ProfileSpec)
    * joined into the sketch profile with the relative error the spec
    * bounds. */
  val etlProfileSketchEval = QueryDef(
    "etl_profile_sketch_eval",
    (s, d) => {
      val exact = unpivoted(Tables.lineitem(s, d), LineitemCols)
        .groupBy("col_name")
        .agg(countDistinct(col("val")).as("exact_distinct"))
      profileSketch(Tables.lineitem(s, d), LineitemCols)
        .join(exact, Seq("col_name"))
        .withColumn("distinct_rel_err",
          round(abs(col("approx_distinct") - col("exact_distinct"))
            / col("exact_distinct"), 4))
        .orderBy("col_name")
    },
    None)

  /** E31 — functional-dependency discovery: for each ordered column
    * pair (A, B), does A → B hold (every A value maps to exactly one
    * B)? The schema-knowledge miner behind key detection, denormalized
    * join validation, and "can we safely collapse this dim" — the
    * reference encodes its dependencies by hand in EF models; this
    * reads them off the data. Per pair: ONE distinct over the (A, B)
    * projection (the pair table is bounded by distinct combinations,
    * not rows) then an O(distinct-A) aggregation; pair count is
    * schema-quadratic, data-linear — the standard single-column-FD
    * discovery cost. Violations are counted, not just flagged, so
    * "almost-FDs" (data-quality bugs) surface with their magnitude. */
  def functionalDeps(df: DataFrame, cols: Seq[String]): DataFrame = {
    // ONE scan + one generic pipeline for ALL ordered pairs (the E26
    // unpivot trick applied to pairs): stack the pair values long-form
    // map-side, then distinct → per-(pair, lhs) count → per-pair
    // aggregate. The per-pair-frame original ran #pairs separate
    // 3-stage pipelines — #pairs scans of the table and 2·#pairs
    // exchanges (12 scans / 24 exchanges for 4 columns; measured
    // 1.8 → ~0.6 s at sf0.1); this is 1 scan / 2 exchanges, and at
    // 100 TB the table is read once instead of #pairs times.
    val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
    // the pair tag that rides every long-form row through the distinct
    // is a 4-byte int, not two column-name strings — the names attach
    // to the #pairs aggregated rows at the very end
    val args = lit(pairs.size) +: pairs.zipWithIndex.flatMap {
      case ((a, b), i) =>
        Seq(lit(i), col(a).cast("string"), col(b).cast("string")) }
    val lhsName = pairs.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, ((a, _), i)) => when(col("pair") === i, lit(a)).otherwise(acc) }
    val rhsName = pairs.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, ((_, b), i)) => when(col("pair") === i, lit(b)).otherwise(acc) }
    df.select(stack(args: _*).as(Seq("pair", "lhs_val", "rhs_val")))
      .distinct()
      .groupBy("pair", "lhs_val")
      .agg(count(lit(1)).as("n_rhs"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n_lhs"),
        sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"))
      .select(lhsName.as("lhs"), rhsName.as("rhs"),
        col("n_lhs"), col("n_violating"),
        (col("n_violating") === 0).as("holds"))
      .orderBy("lhs", "rhs")
  }

  private val FdCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  val etlFdDiscovery = QueryDef(
    "etl_fd_discovery",
    (s, d) => functionalDeps(Tables.orders(s, d), FdCols),
    Some {
      val pairs = for {
        a <- FdCols; b <- FdCols if a != b
      } yield s"""SELECT '$a' AS lhs, '$b' AS rhs,
                    CAST(count(*) AS BIGINT) AS n_lhs,
                    CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_violating,
                    SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS holds
                  FROM (SELECT lhs_val, count(*) AS n_rhs
                        FROM (SELECT DISTINCT CAST($a AS VARCHAR) AS lhs_val,
                                CAST($b AS VARCHAR) AS rhs_val FROM orders)
                        GROUP BY 1)"""
      pairs.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY lhs, rhs")
    })

  def all: Seq[QueryDef] = Seq(etlProfileTable, etlProfileSketch,
    etlProfileSketchEval, etlFdDiscovery)
}
