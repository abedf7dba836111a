package graft.dedup

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D92 — INCREMENTAL duplicate-cluster maintenance: fold an ingest
  * batch into STORED cluster labels without re-clustering the corpus.
  *
  * D15 computes components from scratch; at 100 TB nobody re-runs
  * corpus-wide CC per ingest batch. The incremental algorithm works on
  * the QUOTIENT graph: every stored base cluster collapses to its
  * label node (labels are min-member ids, so the label IS the
  * cluster's canonical doc), new docs probe the stored band index
  * (D34's bounded per-batch cost), and CC runs over the label graph —
  * nodes = batch docs + touched labels only, cost ∝ batch + touched
  * clusters, NEVER corpus size. A batch doc colliding with TWO
  * different base clusters MERGES them (the hard case — bridge docs
  * are planted to force it).
  *
  * Correctness is a THEOREM made machine-checkable: quotient-graph CC
  * over the same edge evidence yields exactly the full-recompute
  * labels (collapsing a connected set preserves connectivity; min over
  * {label nodes, batch ids} = min over all member ids because labels
  * are min-members). The full-recompute parity leg lives in
  * [[graft.dedup.IncrementalClustersSpec]] via [[fullParity]] — NOT in
  * the entry: in production the witness would dominate the incremental
  * path it certifies (it re-clusters the corpus evidence the
  * incremental path exists to avoid), so the entry emits only the
  * production output — per batch doc `label_inc` + `kind`, plus
  * `n_merges` (base clusters fused by bridges/directives), the
  * operational signal a deployment actually monitors. Rows-only SV
  * (the LSH band stage has no SQL oracle) per the dedup-family
  * convention; the spec replays 100% label parity per run. */
object IncrementalClusters {

  private[graft] def baseCorpus(docs: DataFrame): DataFrame = {
    val copies = (1 to 2).map(k =>
      docs.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + k * 1000000L).as("doc_id"), col("text")))
    copies.foldLeft(docs.select("doc_id", "text"))(_ unionByName _)
  }

  /** The ingest batch: BRIDGES (concat of two different base docs'
    * texts — band-collide with both source clusters, forcing merges),
    * JOINERS (exact copies of base singletons — cluster growth), and
    * FRESH noise (no hits). */
  private[graft] def deltaBatch(docs: DataFrame): DataFrame = {
    val a = docs.select(col("doc_id").as("ida"), col("text").as("ta"))
    val b = docs.select(col("doc_id").as("idb"), col("text").as("tb"))
    val bridges = a.join(b, col("idb") === col("ida") + 40)
      .filter(col("ida") % 80 === 0)
      .select((col("ida") + 3000000L).as("doc_id"),
        concat(col("ta"), lit(" "), col("tb")).as("text"))
    val joiners = docs.filter(col("doc_id") % 40 === 20)
      .select((col("doc_id") + 3500000L).as("doc_id"), col("text"))
    val fresh = docs.filter(col("doc_id") % 40 === 21)
      .select((col("doc_id") + 3800000L).as("doc_id"),
        concat_ws(" ", md5(col("doc_id").cast("string")),
          md5((col("doc_id") + 1).cast("string")),
          md5((col("doc_id") + 2).cast("string"))).as("text"))
    bridges.unionByName(joiners).unionByName(fresh)
  }

  private val built =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def fixtureBase(dir: String): String =
    "/tmp/graft_warehouse/incclusters_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + ProcessHandle.current().pid()

  /** Stored state a deployment maintains: the band index, the base
    * edge evidence, and the base labels — built once per (process,
    * dataset). Also dumps the base-corpus and delta-batch SIGNATURE
    * matrices: the one non-SQL-expressible stage, from which the
    * oracle independently re-derives base edges, base labels (a
    * recursive-CTE CC — the full chain, not the stored labels), both
    * probe legs, the quotient graph, and the merge stats. */
  private def fixtures(s: SparkSession, dir: String): (String, String, String) = {
    val base = fixtureBase(dir)
    if (built.add(base)) {
      val docs = Tables.documents(s, dir)
      val corpus = baseCorpus(docs)
      Dedup.writeBandIndex(corpus, s"$base/index")
      val edges = Dedup.minhashLshCandidates(corpus)
      edges.write.mode("overwrite").parquet(s"$base/edges")
      Clusters.connectedComponents(s.read.parquet(s"$base/edges"))
        .write.mode("overwrite").parquet(s"$base/labels")
      Dedup.minhashSignatures(corpus)
        .write.mode("overwrite").parquet(s"$base/sigs_base")
      Dedup.minhashSignatures(deltaBatch(docs))
        .write.mode("overwrite").parquet(s"$base/sigs_delta")
    }
    (s"$base/index", s"$base/edges", s"$base/labels")
  }

  /** The per-batch EVIDENCE both the incremental path and the parity
    * witness consume: the batch itself (checkpointed — probed twice
    * and labeled), its band-index hits against the base, its
    * intra-batch candidate pairs, and the merge directives. */
  private final case class Evidence(delta: DataFrame, vsBase: DataFrame,
      inDelta: DataFrame, directives: DataFrame, baseLabels: DataFrame,
      edgePath: String)

  private def evidence(s: SparkSession, dir: String): Evidence = {
    val (idxPath, edgePath, labPath) = fixtures(s, dir)
    val docs = Tables.documents(s, dir)
    val delta = deltaBatch(docs).localCheckpoint() // probed twice + labeled
    // ONE signature pass over the batch serves both probe legs (r13):
    // the index probe and the intra-batch self-join consume the same
    // (doc_id, band_key) table — computing it per leg paid the
    // 64-min-aggregate signature aggregation twice per run
    val deltaBands = Dedup.bandedKeys(delta).cache()
    val vsBase = Dedup.probeBandIndexWithBands(s, idxPath, deltaBands)
    val inDelta = Dedup.minhashLshCandidatesFromBands(deltaBands)
      .select(col("doc_a"), col("doc_b"))
    // MERGE DIRECTIVES: the entity-resolution "confirmed duplicate"
    // assertions every incremental dedup system also ingests (user
    // confirmations, upstream id-mapping feeds) — base-doc pairs the
    // band evidence alone never links; these force genuine cluster
    // merges deterministically
    val directives = docs.filter(col("doc_id") % 160 === 0)
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 40).as("doc_b"))
      .join(docs.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
    Evidence(delta, vsBase, inDelta, directives,
      s.read.parquet(labPath), edgePath)
  }

  /** CC over the quotient graph: batch docs + touched base LABELS. */
  private def quotientCC(ev: Evidence): DataFrame = {
    // quotient mapping: every base member collapses to its stored
    // label node; an UNCLUSTERED base doc is its own label (a base
    // singleton joined by a batch doc must relabel too — dropping it
    // was the first draft's joiner-parity bug)
    val la = ev.baseLabels.select(col("doc_id").as("la_d"), col("cluster_id").as("la_c"))
    val lb = ev.baseLabels.select(col("doc_id").as("lb_d"), col("cluster_id").as("lb_c"))
    val quotient = ev.vsBase
      .join(lb, col("dup_of") === col("lb_d"), "left")
      .select(col("new_doc").as("doc_a"),
        coalesce(col("lb_c"), col("dup_of")).as("doc_b"))
      .unionByName(ev.inDelta)
      .unionByName(ev.directives
        .join(la, col("doc_a") === col("la_d"), "left")
        .join(lb, col("doc_b") === col("lb_d"), "left")
        .select(coalesce(col("la_c"), col("doc_a")).as("doc_a"),
          coalesce(col("lb_c"), col("doc_b")).as("doc_b")))
      .localCheckpoint() // two consumers: labels + merge stats
    Clusters.connectedComponents(quotient)
  }

  private def labelBatch(ev: Evidence, cc: DataFrame, as: String): DataFrame =
    ev.delta.select(col("doc_id"))
      .join(cc.select(col("doc_id"), col("cluster_id").as(as)),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col(as), col("doc_id")).as(as))

  /** The PRODUCTION entry: incremental labels + merge count only —
    * cost ∝ batch + touched clusters. */
  def incremental(s: SparkSession, dir: String): DataFrame = {
    val ev = evidence(s, dir)
    val labelCC = quotientCC(ev)
    val incLabels = labelBatch(ev, labelCC, "label_inc")
    // merges: label-graph components holding >= 2 distinct base labels
    val mergeStats = labelCC
      .join(ev.baseLabels.select(col("cluster_id").as("bl")).distinct(),
        labelCC("doc_id") === col("bl"))
      .groupBy(labelCC("cluster_id")).agg(count(lit(1)).as("n_labels"))
      .agg(sum(when(col("n_labels") >= 2, 1L).otherwise(0L)).as("n_merges"))
    incLabels
      .withColumn("kind",
        when(col("doc_id") >= 3800000L, "fresh")
          .when(col("doc_id") >= 3500000L, "joiner")
          .otherwise("bridge"))
      .crossJoin(broadcast(mergeStats))
      .select("doc_id", "kind", "label_inc", "n_merges")
      .orderBy("doc_id")
  }

  /** SPEC-ONLY parity witness: the full recompute over the SAME edge
    * evidence, joined against the incremental labels — the quotient
    * theorem replayed per run by IncrementalClustersSpec. Quadratic in
    * corpus evidence by design (it is exactly the cost the incremental
    * path avoids), so it lives here and not in the entry. */
  def fullParity(s: SparkSession, dir: String): DataFrame = {
    val ev = evidence(s, dir)
    val incLabels = labelBatch(ev, quotientCC(ev), "label_inc")
    val fullEdges = s.read.parquet(ev.edgePath)
      .select("doc_a", "doc_b")
      .unionByName(ev.vsBase.select(col("new_doc").as("doc_a"),
        col("dup_of").as("doc_b")))
      .unionByName(ev.inDelta)
      .unionByName(ev.directives)
    val fullLabels = labelBatch(ev, Clusters.connectedComponents(fullEdges),
      "label_full")
    incLabels.join(fullLabels, "doc_id")
      .withColumn("label_match", col("label_inc") === col("label_full"))
      .orderBy("doc_id")
  }

  /** FULL ORACLE (r11, was rows-only SV): from the two signature
    * fixtures DuckDB re-derives base edges + base labels (recursive-
    * CTE CC #1), both probe legs (index-valved base↔delta band join;
    * delta self-pairs), the merge directives, the QUOTIENT graph, its
    * components (recursive-CTE CC #2), the per-doc incremental labels
    * and the merge count — the complete D92 algorithm replayed
    * independently, quotient theorem included. */
  def qIncrementalClusters =
    QueryDef.dirOracle("dedup_clusters_incremental", (s, d) => incremental(s, d),
      dir => {
        val base = fixtureBase(dir)
        import PipelineQueries.{bandCteSql, selfPairsSql, ccSql}
        s"""WITH RECURSIVE ${bandCteSql("cb", s"$base/sigs_base")},
            ${bandCteSql("db", s"$base/sigs_delta")},
            ${selfPairsSql("base_pairs", "cb")},
            base_edges AS (SELECT doc_a AS src, doc_b AS dst FROM base_pairs
                           UNION SELECT doc_b, doc_a FROM base_pairs),
            ${ccSql("base_edges", "base_reach", "basecc")},
            vsbase AS (SELECT DISTINCT db.doc_id AS new_doc,
                         o.doc_id AS dup_of
                       FROM cb_ok o JOIN db ON o.j = db.j
                         AND o.s1 = db.s1 AND o.s2 = db.s2
                         AND o.s3 = db.s3 AND o.s4 = db.s4),
            ${selfPairsSql("indelta", "db")},
            dirs AS (SELECT d.doc_id AS doc_a, d.doc_id + 40 AS doc_b
                     FROM documents d JOIN documents e
                       ON e.doc_id = d.doc_id + 40
                     WHERE d.doc_id % 160 = 0),
            q_raw AS (
              SELECT v.new_doc AS doc_a,
                     COALESCE(bl.cluster_id, v.dup_of) AS doc_b
              FROM vsbase v LEFT JOIN basecc bl ON bl.doc_id = v.dup_of
              UNION ALL SELECT doc_a, doc_b FROM indelta
              UNION ALL
              SELECT COALESCE(la.cluster_id, dirs.doc_a),
                     COALESCE(lb.cluster_id, dirs.doc_b)
              FROM dirs LEFT JOIN basecc la ON la.doc_id = dirs.doc_a
                        LEFT JOIN basecc lb ON lb.doc_id = dirs.doc_b),
            q_edges AS (SELECT doc_a AS src, doc_b AS dst FROM q_raw
                        UNION SELECT doc_b, doc_a FROM q_raw),
            ${ccSql("q_edges", "q_reach", "qcc")},
            delta_ids AS (
              SELECT d.doc_id + 3000000 AS doc_id FROM documents d
                JOIN documents e ON e.doc_id = d.doc_id + 40
              WHERE d.doc_id % 80 = 0
              UNION ALL SELECT doc_id + 3500000 FROM documents
                WHERE doc_id % 40 = 20
              UNION ALL SELECT doc_id + 3800000 FROM documents
                WHERE doc_id % 40 = 21),
            bl_set AS (SELECT DISTINCT cluster_id AS bl FROM basecc),
            mergec AS (SELECT q.cluster_id, count(*) AS n_labels
                       FROM qcc q JOIN bl_set ON q.doc_id = bl
                       GROUP BY q.cluster_id),
            merges AS (SELECT CAST(SUM(CASE WHEN n_labels >= 2
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_merges
                       FROM mergec)
            SELECT di.doc_id,
                   CASE WHEN di.doc_id >= 3800000 THEN 'fresh'
                        WHEN di.doc_id >= 3500000 THEN 'joiner'
                        ELSE 'bridge' END AS kind,
                   COALESCE(q.cluster_id, di.doc_id) AS label_inc,
                   m.n_merges
            FROM delta_ids di LEFT JOIN qcc q ON q.doc_id = di.doc_id
            CROSS JOIN merges m ORDER BY di.doc_id"""
      })

  def all: Seq[QueryDef] = Seq(qIncrementalClusters)
}
