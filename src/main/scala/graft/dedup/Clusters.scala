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

  /** (doc_a, doc_b) pairs → (doc_id, cluster_id) for every doc that
    * appears in some pair; cluster_id = min doc_id of its component. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 25): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val nbrMin = edges
        .join(labels, edges("src") === labels("doc_id"))
        .select(edges("dst").as("doc_id"), col("cluster_id"))
        .groupBy("doc_id")
        .agg(min("cluster_id").as("nbr_min"))
      // old label rides along so convergence needs no second join
      val next = labels.withColumnRenamed("cluster_id", "cid")
        .join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("cid"),
          least(col("cid"), coalesce(col("nbr_min"), col("cid"))).as("cluster_id"))
        .localCheckpoint()
      converged = next.filter(col("cluster_id") =!= col("cid")).isEmpty
      labels = next.select("doc_id", "cluster_id")
      round += 1
    }
    labels
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
