package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D37 — iterative graph centrality (PageRank) for source-quality
  * weighting.
  *
  * Curation pipelines weight documents by the rank of their source in
  * a link/interaction graph (the CommonCrawl host-rank idea: quality
  * priors come from graph centrality, not the document text). This
  * module implements the power-method PageRank loop as pure
  * DataFrame ops — the same iterative join-agg + lineage-cut family as
  * [[graft.dedup.Clusters]] — and the coverage entry runs it over the
  * supplier↔customer interaction graph derived from lineitem⋈orders
  * (the densest graph the test tables induce).
  *
  * Scale shape: per iteration the rank vector (#nodes rows) joins the
  * edge list partitioned on `src` and the contributions shuffle once
  * on `dst` — the irreducible PageRank exchange. The edge⋈outdeg
  * adjacency is persisted once and reused by every iteration;
  * each iteration's output is localCheckpoint'ed so the loop's lineage
  * stays O(1) deep (cluster deployments swap in a reliable
  * checkpoint dir exactly as Clusters does). The only driver
  * materialization is N = #nodes, a single scalar any PageRank needs
  * for its teleport term.
  *
  * Cross-engine determinism: per-edge contributions are
  * floor-quantized to 1e-12 and summed as exact integers — floor has
  * no rounding-tie rule to diverge on (the repo-wide convention from
  * the window-distribution entries), integer sums are
  * order-independent, and every fractional literal is explicitly
  * CAST AS DOUBLE in the oracle so DuckDB cannot fall into decimal
  * arithmetic. The rank recurrence then runs on bit-identical doubles
  * in both engines.
  */
object Graph {

  /** Power-method PageRank over a directed edge list (`src`, `dst`).
    * Every node must have out-degree ≥ 1 (feed an undirected graph as
    * both edge directions); contributions are floor-quantized to
    * 1e-12 per edge so results are exactly reproducible across
    * engines and partitionings. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val adj = edges.join(deg, "src").persist()
    val n = deg.count() // the teleport scalar — O(1) driver result
    val teleport = lit(1.0) * (lit(1.0) - lit(damping)) / lit(n.toDouble)
    var pr = deg.select(col("src").as("node"),
      (lit(1.0) / lit(n.toDouble)).as("pr"))
    for (_ <- 1 to iters) {
      pr = adj.join(pr, adj("src") === pr("node"))
        .select(col("dst"),
          floor(col("pr") / col("outdeg") * lit(1e12)).as("contrib"))
        .groupBy("dst")
        .agg(sum(col("contrib")).as("csum"))
        .select(col("dst").as("node"),
          (teleport + lit(damping) * (col("csum").cast("double") / lit(1e12)))
            .as("pr"))
        .localCheckpoint()
    }
    pr
  }

  /** The supplier↔customer interaction graph: one undirected edge per
    * distinct (supplier, customer) trading pair, fed as both
    * directions. Prefixes keep the two key spaces disjoint. */
  def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
        concat(lit("c"), col("o_custkey").cast("string")).as("dst"))
      .distinct()
    // the reversed set lives in a disjoint prefix space, so plain
    // union (no dedup pass) is exact
    pairs.unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
  }

  private val Iters = 3
  private val Damping = 0.85

  /** One unrolled oracle iteration: prev CTE name → this iteration's
    * SELECT. The arithmetic mirrors [[pageRank]] term for term. */
  private def oIter(prev: String): String =
    s"""SELECT t.node,
          CAST(1 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
            + CAST(0.85 AS DOUBLE) * (CAST(t.csum AS DOUBLE) / 1e12) AS pr
        FROM (SELECT e.dst AS node,
                     SUM(CAST(floor(p.pr / d.outdeg * 1e12) AS BIGINT)) AS csum
              FROM edges e
              JOIN $prev p ON e.src = p.node
              JOIN deg d ON d.src = e.src
              GROUP BY e.dst) t, nn"""

  val qPagerank = QueryDef(
    "q_pagerank",
    (s, d) => pageRank(tradeEdges(s, d), Iters, Damping)
      .select(col("node"), floor(col("pr") * lit(1e9)).as("pr_q"))
      .orderBy("node"),
    Some(s"""WITH pairs AS (
              SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                              'c' || CAST(o_custkey AS VARCHAR) AS dst
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
            edges AS (
              SELECT src, dst FROM pairs
              UNION ALL
              SELECT dst AS src, src AS dst FROM pairs),
            deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
            nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
            pr0 AS (SELECT src AS node, CAST(1 AS DOUBLE) / nn.n AS pr
                    FROM deg, nn),
            pr1 AS (${oIter("pr0")}),
            pr2 AS (${oIter("pr1")}),
            pr3 AS (${oIter("pr2")})
            SELECT node, CAST(floor(pr * 1e9) AS BIGINT) AS pr_q
            FROM pr3 ORDER BY node"""))

  val all: Seq[QueryDef] = Seq(qPagerank)
}
