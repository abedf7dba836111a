package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D7-alt: IVF (inverted-file) approximate nearest neighbor — the
  * other standard scale path besides LSH. A small coarse codebook
  * partitions the corpus into cells; a query probes only the nprobe
  * nearest cells and re-ranks candidates with the exact native cosine.
  *
  * Scale shape: the codebook is tiny BY CONSTRUCTION (√N-ish cells for
  * billions of vectors), so it broadcasts as a literal; assignment is
  * one map-side pass over the corpus; at deployment the corpus is
  * written partitioned/bucketed by cell so a probe reads nprobe/cells
  * of the data. Training is deterministic: hash-sampled seeds plus one
  * Lloyd refinement step, all as DataFrame aggregations — no MLlib, no
  * driver-side iteration over data.
  */
object Ivf {

  /** Deterministic coarse codebook: seeds = the `cells` corpus vectors
    * with smallest xxhash64(vec_id), refined by one Lloyd step
    * (assign → per-cell element-wise mean). Returns the centroids as
    * driver values — the codebook is the one structure small enough to
    * collect (cells × dim doubles). */
  def trainCodebook(corpus: DataFrame, cells: Int): Seq[Seq[Double]] = {
    val seeds = corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"),
        xxhash64(col("vec_id")).as("h"))
      .orderBy("h")
      .limit(cells)
      .select("emb")
      .collect()
      .map(_.getSeq[Double](0).toSeq)
      .toSeq
    // one Lloyd step: assign every vector to its max-cosine seed, then
    // element-wise mean per cell via the native graft_vec_mean
    // aggregate (one aggregation; the posexplode workaround needs three
    // operators and a dim-fold row blow-up)
    val assigned = assignCells(corpus, seeds)
    val means = assigned
      .groupBy("cell")
      .agg(call_function("graft_vec_mean",
        col("embedding").cast("array<double>")).as("centroid"))
      .collect()
      .map(r => r.getAs[Int]("cell") -> r.getSeq[Double](1).toSeq)
      .toMap
    // a cell that captured no vectors keeps its seed
    seeds.indices.map(i => means.getOrElse(i, seeds(i)))
  }

  /** Cosine scores of a vector against every centroid, as an array
    * column — ONE fused native loop ([[graft.plans.CellScores]]) with
    * the codebook shipped once as a literal. (The earlier STATIC-array-
    * of-graft_cosine-calls form inlined `cells` expression trees and
    * degraded sharply past ~16 cells — generated-code size; a lambda
    * over a literal array is also out: attribute references captured
    * inside higher-order-function lambdas survive self-join attribute
    * deduplication incorrectly.) Per-cell arithmetic is bit-identical
    * to graft_cosine, so memoized codebooks and oracle values carry
    * over. */
  private[similarity] def cellScores(emb: Column, codebook: Seq[Seq[Double]]): Column =
    call_function("graft_cell_scores", emb.cast("array<double>"),
      typedlit(codebook.map(_.toSeq)))

  /** Map-side cell assignment: argmax cosine over the codebook. */
  def assignCells(df: DataFrame, codebook: Seq[Seq[Double]]): DataFrame = {
    val scores = cellScores(col("embedding"), codebook)
    df.withColumn("cell",
      (array_position(scores, array_max(scores)) - 1).cast("int"))
  }

  /** The nprobe highest-scoring cells for each query vector. The
    * lambdas are CLOSED (only their own arguments) — no free column
    * references, so no per-element re-evaluation hazard. */
  private[similarity] def probeCells(emb: Column, codebook: Seq[Seq[Double]],
      nprobe: Int): Column = {
    val scored = transform(cellScores(emb, codebook),
      (s, i) => struct((-s).as("neg"), i.as("cell")))
    transform(slice(array_sort(scored), lit(1), lit(nprobe)),
      x => x.getField("cell"))
  }

  /** Fixture views for cross-engine oracles (r11 verdict item 2): the
    * two float-argmax stages a SQL engine cannot re-express — corpus
    * cell assignment and the query probe set — as plain (id, cell)
    * tables. A fixture oracle dumps these once per process and DuckDB
    * independently re-derives everything downstream: the candidate
    * equi-join, the 6dp-rounded cosine rerank over the RAW embeddings,
    * the top-k window, and the recall evidence (the ann_lsh recipe). */
  def assignmentFixture(corpus: DataFrame,
      codebook: Seq[Seq[Double]]): DataFrame =
    assignCells(corpus, codebook).select("vec_id", "cell")

  def probeFixture(queries: DataFrame, codebook: Seq[Seq[Double]],
      nprobe: Int = 4): DataFrame =
    queries.select(col("vec_id").as("q_id"),
      explode(probeCells(col("embedding"), codebook, nprobe)).as("cell"))

  /** (q_id, q_emb, cell, probe_rank): EVERY codebook cell per query in
    * probe order. [[probeCells]]`(np)` is exactly the `probe_rank ≤ np`
    * prefix of this list, so one scored candidate frame can serve a
    * whole nprobe sweep as ONE plan instead of a per-width job fan-out
    * (the r13 nprobe-curve fusion). */
  def probeRanks(queries: DataFrame, codebook: Seq[Seq[Double]]): DataFrame =
    queries.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"),
        posexplode(probeCells(col("embedding"), codebook, codebook.size))
          .as(Seq("pos", "cell")))
      .select(col("q_id"), col("q_emb"), col("cell"),
        (col("pos") + 1).as("probe_rank"))

  /** Codebooks are trained once per corpus and reused — exactly how a
    * deployment persists its IVF index. Callers that can name their
    * corpus stably (e.g. a dataset directory) pass `cacheKey`. */
  private val codebookCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Seq[Seq[Double]]]()

  def codebookFor(corpus: DataFrame, cells: Int, cacheKey: String): Seq[Seq[Double]] =
    codebookCache.computeIfAbsent((cacheKey, cells), _ => trainCodebook(corpus, cells))

  /** The √N design point, made executable: `cells = 0` callers get
    * max(16, ⌈√N⌉) capped at 4096 — per-cell populations stay ~√N, so
    * within-cell work (SemDeDup's pairs) and per-probe scan fractions
    * shrink as the corpus grows instead of degrading quadratically /
    * linearly. The r8 scale sweep measured the fixed-16-cell default
    * at 5× rows costing 14–16× (per-cell population ∝ N); auto-cells
    * restores the paper shape. Counts memoize beside the codebook so
    * the extra job runs once per corpus. */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** NOTE: with an empty cacheKey every call pays a corpus.count()
    * job — callers sizing repeatedly against the same corpus should
    * name it (any stable string) so the count memoizes. */
  private[similarity] def countFor(corpus: DataFrame, cacheKey: String): Long =
    if (cacheKey.nonEmpty)
      countCache.computeIfAbsent(cacheKey, _ => corpus.count()).toLong
    else corpus.count()

  /** Past the 4096 cap (N ≳ 16.7M vectors) per-cell populations grow
    * ∝ N again — switch to the two-level [[Imi]] product quantizer,
    * whose √N effective cells carry no cap (measured 20–48× cheaper
    * at 20M vectors: bench/imi_cap_r9.json). */
  def autoCells(corpus: DataFrame, cacheKey: String): Int = {
    val n = countFor(corpus, cacheKey)
    math.min(4096, math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))
  }

  private[similarity] def resolveCells(corpus: DataFrame, cells: Int,
      cacheKey: String): Int =
    if (cells > 0) cells else autoCells(corpus, cacheKey)

  /** IVF top-k: corpus rows in the query's probed cells, re-ranked by
    * exact cosine. Recall vs brute force is asserted in the spec.
    *
    * `broadcastQueries = true` (the default) force-broadcasts the
    * probed query side and is only valid for query sets bounded per
    * [[Ann.MaxBroadcastQueries]]; with `false` the probe join is a
    * plain equi-join on cell — both sides shuffle on the cell id,
    * the corpus-scale-query-set shape. */
  /** Deployment persistence: write the corpus PARTITIONED BY cell so a
    * probe's parquet scan prunes to the probed cells' files instead of
    * scanning the whole corpus. Returns the codebook used — a real
    * deployment persists it alongside the index (it is cells × dim
    * doubles). */
  def writeIndex(corpus: DataFrame, path: String, cells: Int = 16,
      cacheKey: String = ""): Seq[Seq[Double]] = {
    val codebook =
      if (cacheKey.nonEmpty) codebookFor(corpus, cells, cacheKey)
      else trainCodebook(corpus, cells)
    assignCells(corpus, codebook)
      .select("vec_id", "embedding", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    codebook
  }

  /** Probe over a written index. The query side is bounded per
    * [[Ann.MaxBroadcastQueries]], so its probed cell-id set is tiny
    * (≤ queries × nprobe ints) — collecting it and pushing a STATIC
    * `cell IN (...)` filter guarantees partition pruning at plan time:
    * the scan reads only nprobe-ish of the `cells` directories,
    * which is the entire point of the IVF layout at 100 TB. */
  def topKFromIndex(spark: SparkSession, indexPath: String,
      codebook: Seq[Seq[Double]], queries: DataFrame, k: Int,
      nprobe: Int = 4): DataFrame = {
    val queryCells = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        explode(probeCells(col("embedding"), codebook, nprobe)).as("cell"))
    val probed = queryCells.select("cell").distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
    val corpusCells = spark.read.parquet(indexPath)
      .filter(col("cell").isin(probed: _*))
    val scored = corpusCells.as("c")
      .join(broadcast(queryCells.as("q")),
        col("c.cell") === col("q.cell") && col("c.vec_id") =!= col("q.q_id"))
      .select(col("q.q_id").as("q_id"), col("c.vec_id").as("vec_id"),
        round(Ann.cosine(col("q.q_emb"), col("c.embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "cos_sim", "rnk")
  }

  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      cells: Int = 0, nprobe: Int = 4, cacheKey: String = "",
      broadcastQueries: Boolean = true): DataFrame = {
    val nCells = resolveCells(corpus, cells, cacheKey)
    val codebook =
      if (cacheKey.nonEmpty) codebookFor(corpus, nCells, cacheKey)
      else trainCodebook(corpus, nCells)
    val corpusCells = assignCells(corpus, codebook)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val queryCells = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        explode(probeCells(col("embedding"), codebook, nprobe)).as("cell"))
    val qSide = if (broadcastQueries) broadcast(queryCells.as("q")) else queryCells.as("q")
    // no distinct: a corpus vector lives in exactly ONE cell and the
    // probed cells are distinct, so (q_id, vec_id) pairs are already
    // unique — unlike multi-table LSH, where dedup is required
    val scored = corpusCells.as("c")
      .join(qSide,
        col("c.cell") === col("q.cell") && col("c.vec_id") =!= col("q.q_id"))
      .select(col("q.q_id").as("q_id"), col("c.vec_id").as("vec_id"),
        round(Ann.cosine(col("q.q_emb"), col("c.embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "cos_sim", "rnk")
  }
}
