package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D15: duplicate-cluster resolution — candidate/verified pairs from
  * D2–D5 are EDGES of a duplicate graph, and what a dedup pipeline
  * ships is one keeper per CONNECTED COMPONENT (pairs alone
  * double-drop a doc that matches two others). Min-label propagation:
  * every doc repeatedly adopts the smallest doc_id among itself and
  * its neighbors until a fixpoint. Rounds ≈ component diameter, and
  * near-dup components are shallow (stars/cliques around a template),
  * so the loop converges in a handful of rounds; each round is two
  * keyed shuffles over (id)-partitioned rows, and localCheckpoint cuts
  * lineage every round so the plan stays constant-size at any round
  * count. For adversarial long-chain graphs swap in alternating
  * large-star/small-star (Kiveris et al., CC in MapReduce and Beyond —
  * O(log²) rounds), which keeps this exact join shape.
  */
object Clusters {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Per-round lineage cut. localCheckpoint (the default) pins blocks
    * on executors — fast locally, but ONE executor loss mid-iteration
    * kills the job; a 100 TB cluster run must pass `checkpointDir` to
    * get reliable checkpoints on the cluster filesystem instead. */
  private def cutter(df: DataFrame, checkpointDir: Option[String]): DataFrame => DataFrame =
    checkpointDir match {
      case Some(dir) =>
        df.sparkSession.sparkContext.setCheckpointDir(dir)
        d => d.checkpoint()
      case None =>
        d => d.localCheckpoint()
    }

  /** Free the pinned blocks behind a checkpointed DataFrame that a
    * later round has superseded. Without this every CC round leaks
    * executor storage until JVM GC happens to trigger the context
    * cleaner — noise locally, real memory pressure on a long-running
    * cluster session. */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** (doc_a, doc_b) pairs → (doc_id, cluster_id) for every doc that
    * appears in some pair; cluster_id = min doc_id of its component.
    * If propagation does not reach a fixpoint within `maxRounds` (a
    * component with diameter > maxRounds — adversarial for dedup
    * graphs), falls back to [[connectedComponentsStar]], whose round
    * count is O(log² n) regardless of diameter, rather than silently
    * returning partially-propagated labels. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    val cut = cutter(pairs, checkpointDir)
    // edges are pinned HASH-PARTITIONED ON src (localCheckpoint
    // preserves partitioning): every round's edges⋈labels join then
    // reuses the stored layout instead of re-exchanging the edge list
    // per round — labels come out of each round partitioned on doc_id,
    // so the only per-round exchange left is the irreducible nbr-min
    // regroup on dst (guide §2.4: two operations keyed the same way
    // share one exchange). The per-partition dropDuplicates replaces
    // distinct() so dedup rides the SAME src exchange.
    val edges = cut(pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(col("src"))
      .dropDuplicates("src", "dst"))
    // init = identity labels PLUS the first propagation round fused
    // into one aggregation: min(self, neighbors) per node — one round
    // of join+agg+join+cut (and its convergence-check job) never runs
    var labels = cut(edges.groupBy("src").agg(min("dst").as("_nb"))
      .select(col("src").as("doc_id"),
        least(col("src"), col("_nb")).as("cluster_id")))
    var round = 1
    var converged = false
    while (!converged && round < maxRounds) {
      val nbrMin = edges
        .join(labels, edges("src") === labels("doc_id"))
        .select(edges("dst").as("doc_id"), col("cluster_id"))
        .groupBy("doc_id")
        .agg(min("cluster_id").as("nbr_min"))
      // old label rides along so convergence needs no second join
      val next = cut(labels.withColumnRenamed("cluster_id", "cid")
        .join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("cid"),
          least(col("cid"), coalesce(col("nbr_min"), col("cid"))).as("cluster_id")))
      converged = next.filter(col("cluster_id") =!= col("cid")).isEmpty
      freeCheckpoint(labels) // superseded by the (eager) next
      labels = next.select("doc_id", "cluster_id")
      round += 1
    }
    freeCheckpoint(edges) // the returned labels are self-contained
    if (!converged) {
      log.warn(s"min-label propagation unconverged after $maxRounds rounds " +
        "(component diameter exceeds the cap); falling back to large-star/small-star")
      connectedComponentsStar(pairs, checkpointDir = checkpointDir)
    } else labels
  }

  /** Connected components by alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    * O(log² n) rounds REGARDLESS of component diameter, the
    * adversarial-graph-safe path — use it when duplicate chains can be
    * long (e.g. transitive near-dup chains across document versions);
    * [[connectedComponents]]'s min propagation does fewer shuffles per
    * round and wins on the shallow star/clique components real dedup
    * produces.
    *
    * Each round: large-star hangs every neighbor larger than u onto
    * u's minimum; small-star re-hangs u and its smaller neighbors the
    * same way. At the fixpoint every component is a star rooted at its
    * minimum, read off as (doc_id, cluster_id). */
  def connectedComponentsStar(pairs: DataFrame, maxRounds: Int = 50,
      checkpointDir: Option[String] = None): DataFrame = {
    val cut = cutter(pairs, checkpointDir)
    def symmetric(e: DataFrame): DataFrame =
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()

    def starRound(edges: DataFrame, large: Boolean): DataFrame = {
      val m = edges.groupBy("src")
        .agg(least(min(col("dst")), col("src")).as("m"))
      val joined = edges.join(m, "src")
      val rehung =
        if (large)
          joined.filter(col("dst") > col("src"))
            .select(col("dst").as("src"), col("m").as("dst"))
        else
          joined.filter(col("dst") < col("src"))
            .select(col("dst").as("src"), col("m").as("dst"))
            .union(m.select(col("src"), col("m").as("dst")))
      cut(symmetric(rehung))
    }

    def fingerprint(e: DataFrame): (Long, Long) = {
      // bit_xor: order-independent, overflow-free under ANSI (edges are
      // distinct, so xor cancellation cannot collide a real change)
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("src"), col("dst")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var edges = cut(symmetric(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))))
    var fp = fingerprint(edges)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val mid = starRound(edges, large = true)
      val next = starRound(mid, large = false)
      freeCheckpoint(mid) // superseded by the (eager) small-star result
      freeCheckpoint(edges)
      edges = next
      val nfp = fingerprint(edges)
      converged = nfp == fp
      fp = nfp
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"large-star/small-star did not converge in $maxRounds rounds — " +
          "O(log² n) rounds should always fit; the edge set is pathological")
    // fixpoint: stars around each component minimum — non-roots point
    // at their (unique) smaller neighbor, roots label themselves
    val nonRoot = edges.filter(col("src") > col("dst"))
      .select(col("src").as("doc_id"), col("dst").as("cid"))
      .groupBy("doc_id").agg(min("cid").as("cluster_id"))
    val roots = edges.select(col("src").as("doc_id")).distinct()
      .join(nonRoot.select("doc_id"), Seq("doc_id"), "left_anti")
      .withColumn("cluster_id", col("doc_id"))
    nonRoot.union(roots)
  }

  /** Keep one doc per duplicate cluster — the component's min doc_id —
    * plus every doc that appears in no pair. The shipping shape of the
    * whole dedup block: candidates (D2/D3) → verify (D4/D5) → resolve
    * (this) → filter. */
  def dedupByCluster(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
      .withColumnRenamed("doc_id", "cc_doc_id")
    docs.join(cc, docs("doc_id") === cc("cc_doc_id"), "left")
      .filter(col("cc_doc_id").isNull || col("doc_id") === col("cluster_id"))
      .drop("cc_doc_id", "cluster_id")
  }
}
