package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D37 — PageRank invariants the unrolled SQL oracle can't state:
  * probability-mass conservation, positivity, and degree dominance. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  // a tiny undirected star + chain: hub h connects to a,b,c; c—d
  private def edges = Seq(
    ("h", "a"), ("h", "b"), ("h", "c"), ("c", "d"))
    .flatMap { case (u, v) => Seq((u, v), (v, u)) }
    .toDF("src", "dst")

  test("rank mass stays ~1 and every node is positive") {
    val pr = Graph.pageRank(edges, 5, 0.85).collect()
    assert(pr.length === 5)
    val mass = pr.map(_.getAs[Double]("pr")).sum
    // floor-quantization leaks ≤ 1e-12 per edge per iteration
    assert(mass <= 1.0 + 1e-9 && mass >= 1.0 - 1e-6, s"mass=$mass")
    assert(pr.forall(_.getAs[Double]("pr") > 0))
  }

  test("the hub outranks leaves; symmetric leaves tie exactly") {
    val pr = Graph.pageRank(edges, 5, 0.85).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Double]("pr")).toMap
    assert(pr("h") > pr("a"))
    assert(pr("h") > pr("d"))
    // a and b are structurally identical → identical rank (exact: the
    // quantized arithmetic is deterministic, not just close)
    assert(pr("a") === pr("b"))
    // c carries its own edge to d on top of the hub link
    assert(pr("c") > pr("a"))
  }

  test("trade-graph entry: bidirectional degrees and disjoint key spaces") {
    val e = Graph.tradeEdges(spark, sf).cache()
    // every edge appears in both directions
    val asym = e.as("x").join(e.as("y"),
        col("x.src") === col("y.dst") && col("x.dst") === col("y.src"),
        "left_anti")
    assert(asym.count() === 0)
    // the parity encoding partitions the node space: every edge links
    // the supplier (even) and customer (odd) sides
    assert(e.filter(col("src") % 2 === col("dst") % 2).count() === 0)
    e.unpersist()
  }

  test("R103: BFS layers are exact on a hand graph with cycle and unreachable node") {
    import spark.implicits._
    // 1→2→3→4 chain, 3→1 back-edge (cycle), 9↔10 disconnected island
    val directed = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 1L), (9L, 10L))
    val edges = directed.toDF("src", "dst")
      .unionByName(directed.map(_.swap).toDF("src", "dst"))
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfsLayers(edges, seeds, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L),
      "cycle must not inflate distances; the island must stay unreached")
  }

  test("R103: every layer-k node has a neighbor at layer k-1 (frontier law)") {
    val seeds = graft.Tables.supplier(spark, sf)
      .filter(col("s_suppkey") <= 10)
      .select((col("s_suppkey") * 2).as("node"))
    val e = Graph.tradeEdges(spark, sf).cache()
    val res = Graph.bfsLayers(e, seeds, maxHops = 4).cache()
    assert(res.filter(col("dist") === 0).count() > 0)
    // each non-seed reached node must be adjacent to a node one hop closer
    val reachedNonSeed = res.filter(col("dist") > 0).count()
    val withParent = res.filter(col("dist") > 0).as("r")
      .join(e.select(col("dst").as("node"), col("src")), Seq("node"))
      .join(res.select(col("node").as("pn"), col("dist").as("pd")),
        col("src") === col("pn"))
      .filter(col("pd") === col("dist") - 1)
      .select("node").distinct().count()
    assert(withParent === reachedNonSeed,
      "every reached node needs a predecessor exactly one layer up")
    res.unpersist(); e.unpersist()
  }

  test("R110: k-core cascades on a path and spares a cycle — the iterative semantics") {
    import spark.implicits._
    // undirected: path 1-2-3-4-5 plus cycle 10-11-12-10
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L))
    val edges = und.toDF("src", "dst")
      .unionByName(und.map(_.swap).toDF("src", "dst"))
    val core = Graph.kcore(edges, k = 2, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // path: endpoints have degree 1 -> peel; new endpoints peel next
    // round; total dissolution REQUIRES multiple rounds (the cascade)
    assert(core.keySet === Set(10L, 11L, 12L),
      s"only the cycle is 2-core, got ${core.keySet}")
    assert(core.values.forall(_ === 2L), "cycle nodes keep both neighbors")
    // one round alone would NOT dissolve the path: prove the cascade
    val oneRound = Graph.kcore(edges, k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(oneRound.intersect(Set(2L, 3L, 4L)).nonEmpty,
      "a single peel must leave inner path nodes — iteration is real")
  }

  test("R110: the entry's fixed rounds reach the true fixpoint on the trade graph") {
    val e = Graph.tradeEdges(spark, sf).cache()
    val atRounds = Graph.kcore(e, k = 10, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val onceMore = Graph.kcore(e, k = 10, rounds = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(atRounds === onceMore,
      "round 7 must change nothing — the unrolled oracle IS the k-core")
    assert(atRounds.nonEmpty && atRounds.values.forall(_ >= 10L))
    e.unpersist()
  }

  test("R131: LPA resolves two bridged cliques into two communities") {
    import spark.implicits._
    // two K4s {0..3} and {10..13} joined by the single bridge 3-10:
    // pure min-propagation would leak label 0 across the bridge; the
    // plurality vote must hold the right clique together
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((3L, 10L), (10L, 3L))).toDF("src", "dst")
    val lab = Graph.labelProp(edges, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab.keySet === Set(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L))
    val left = Set(0L, 1L, 2L, 3L).map(lab)
    val right = Set(10L, 11L, 12L, 13L).map(lab)
    assert(left.size === 1, s"left clique must agree on one label: $lab")
    assert(right.size === 1, s"right clique must agree on one label: $lab")
    assert(left !== right,
      s"the bridge must NOT merge the cliques (the count mechanism): $lab")
  }

  test("R144: weighted SSSP prefers the cheap 2-hop path over the direct weak tie") {
    import spark.implicits._
    // 1→2 costs 10 directly, but 1→3→2 costs 2; node 4 hangs off 2;
    // island 9 is unreachable
    val directed = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 1L),
      (2L, 4L, 5L), (9L, 9L, 1L))
    val edges = directed.toDF("src", "dst", "w")
      .unionByName(directed.map { case (a, b, w) => (b, a, w) }
        .toDF("src", "dst", "w"))
    val got = Graph.sssp(edges, Seq(1L).toDF("node"), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 2L, 3L -> 1L, 4L -> 7L),
      s"weighted relaxation must beat the hop-shortest route: $got")
  }

  test("R144: the entry's fixed rounds reach the fixpoint; relaxation law holds") {
    val e = Graph.tradeEdgesWeighted(spark, sf).cache()
    val seeds = graft.Tables.supplier(spark, sf)
      .filter(col("s_suppkey") <= 10)
      .select((col("s_suppkey") * 2).as("node"))
    val at4 = Graph.sssp(e, seeds, rounds = 4).cache()
    val at5 = Graph.sssp(e, seeds, rounds = 5)
    assert(at4.unionByName(at5).distinct().count() === at4.count(),
      "round 5 must change nothing — the unrolled oracle IS the SSSP table")
    // seeds sit at 0; every non-seed dist is witnessed by some neighbor:
    // dist(v) == min over incoming edges (dist(u) + w) — Bellman's law
    assert(at4.filter(col("dist") === 0).count() === 10)
    val viaParent = at4.filter(col("dist") > 0).as("r")
      .join(e.select(col("dst").as("node"), col("src"), col("w")), Seq("node"))
      .join(at4.select(col("node").as("pn"), col("dist").as("pd")),
        col("src") === col("pn"))
      .filter(col("pd") + col("w") === col("dist"))
      .select("node").distinct().count()
    assert(viaParent === at4.filter(col("dist") > 0).count(),
      "every reached node needs a tight predecessor edge")
    at4.unpersist(); e.unpersist()
  }

  test("R131: on the trade graph LPA is deterministic and nontrivial") {
    val e = Graph.tradeEdgesStored(spark, sf)
    val a = Graph.qLabelProp.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.qLabelProp.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "synchronous LPA with a total tie order is deterministic")
    val nNodes = a.size
    val nLabels = a.values.toSet.size
    assert(nLabels > 1 && nLabels < nNodes,
      s"$nLabels labels over $nNodes nodes — communities must be nontrivial")
    assert(e.count() > 0)
  }
}
