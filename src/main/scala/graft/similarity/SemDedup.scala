package graft.similarity

import graft.dedup.Clusters
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D26: semantic deduplication (SemDeDup — Abbas et al., "SemDeDup:
  * Data-efficient learning at web-scale through semantic
  * deduplication", arXiv 2303.09540): cluster the embedding space with
  * the IVF coarse codebook, compare vectors ONLY within their cell,
  * link pairs whose cosine clears the threshold, resolve duplicate
  * groups with connected components and keep the min-id vector per
  * group. This is the embedding-space complement of the string-space
  * D2/D3 near-dup passes — it drops paraphrases and re-encodings that
  * share no n-grams.
  *
  * Scale shape: the quadratic step is confined WITHIN cells — the
  * paper's design point: cells number ~√N at scale, so per-cell
  * populations stay bounded — and each cell is additionally capped at
  * `maxCell` by the same deterministic hash-ordered sample valve as
  * [[Ann.MaxBlock]]. Only candidate PAIRS (ids + score, not
  * embeddings) flow into CC, whose per-round shuffles are keyed and
  * whose driver materializations are O(1) (convergence flags). The
  * codebook is tiny by construction and memoizable per corpus.
  */
object SemDedup {

  /** Per-cell population valve (same role as [[Ann.MaxBlock]]). */
  val MaxCell = 10000

  /** Within-cell duplicate pairs: (doc_a, doc_b, cos_sim ≥ threshold),
    * doc_a < doc_b. */
  def duplicatePairs(celled: DataFrame, threshold: Double,
      maxCell: Int = MaxCell): DataFrame = {
    val byCell = Window.partitionBy(col("cell"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
    val capped = celled
      .withColumn("rn", row_number().over(byCell))
      .filter(col("rn") <= maxCell)
      .drop("rn")
    capped.as("a")
      .join(capped.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"),
        round(Ann.cosine(col("a.emb"), col("b.emb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Full pass: (vec_id, cell, cluster_id, is_keeper) for every corpus
    * vector — cluster_id is null for vectors in no duplicate group
    * (they are their own keeper). The CC result is cached: it is
    * BOUNDED by the number of vectors appearing in ≥1 duplicate pair
    * (≈ duplicates, not corpus), and it feeds both the output join and
    * any caller-side evidence stats. */
  def dedup(emb: DataFrame, threshold: Double, cells: Int = 0,
      maxCell: Int = MaxCell, cacheKey: String = ""): DataFrame = {
    // cells = 0 → the √N auto shape (see Ivf.autoCells): per-cell
    // populations stay ~√N, so the within-cell quadratic is bounded by
    // the corpus SQRT, not the corpus — the r8 scale sweep measured
    // fixed-16-cells at 14× cost for 5× rows before this
    val nCells = Ivf.resolveCells(emb, cells, cacheKey)
    val codebook =
      if (cacheKey.nonEmpty) Ivf.codebookFor(emb, nCells, cacheKey)
      else Ivf.trainCodebook(emb, nCells)
    val celled = Ivf.assignCells(emb, codebook)
      .select(col("vec_id"), col("cell"),
        col("embedding").cast("array<double>").as("emb"))
    val cc = Clusters.connectedComponents(
      duplicatePairs(celled, threshold, maxCell).select("doc_a", "doc_b"))
      .withColumnRenamed("doc_id", "vec_id")
      .cache()
    celled.select("vec_id", "cell")
      .join(cc, Seq("vec_id"), "left")
      .withColumn("is_keeper",
        col("cluster_id").isNull || col("cluster_id") === col("vec_id"))
  }
}
