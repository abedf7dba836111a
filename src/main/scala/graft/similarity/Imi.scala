package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D111: two-level IVF coarse quantizer — the inverted MULTI-index
  * (Babenko & Lempitsky, "The Inverted Multi-Index", CVPR 2012) that
  * removes [[Ivf]]'s 4096-cell cap.
  *
  * The single-level design point is cells ≈ √N, but its codebook is
  * `cells × dim` driver/broadcast doubles AND every assignment scores
  * all `cells` centroids map-side, so graft caps it at 4096 — past
  * N ≈ 16.7M vectors per-cell populations grow ∝ N again (the r8
  * verdict's item 3). IMI factorizes the quantizer: split each vector
  * into two halves, train an INDEPENDENT codebook of K cells per half,
  * and define cell(v) = (c1(v1), c2(v2)) → K² effective cells from
  * 2·K half-codebooks. √N total cells now needs K = N^(1/4)
  * codebook rows per half: at N = 10^12 that is K = 1000 — codebook
  * state 2·K·(d/2) = K·d doubles (a few MB, trivially broadcastable)
  * and per-row assignment scores 2K half-centroids instead of √N = 10^6
  * full ones. Per-cell population stays ~√N with NO cap anywhere.
  *
  * Probing: the best combined cell for a query is exactly
  * (argmax₁, argmax₂), so the planted-copy top-1 law holds
  * structurally; for nprobe > 1 the probe ranks the t×t grid of
  * top-t half-cells (t = min(K, nprobe)) by summed half-scores — the
  * multi-sequence traversal's output set, computed as one closed
  * array expression (the grid is nprobe², driver-free and tiny).
  * Cosine over concatenated halves is NOT the sum of half-cosines
  * (norms differ), so half-scores here are the same fused
  * graft_cell_scores cosine per half — monotone surrogate exactly as
  * IMI uses per-subspace distances.
  */
object Imi {

  /** √N-total-cells auto-sizing: K per half = N^(1/4), floor 4 — so
    * K² ≈ √N total cells, uncapped (the whole point vs [[Ivf]]). */
  def autoCellsPerHalf(corpus: DataFrame, cacheKey: String): Int =
    math.max(4, math.ceil(math.pow(
      Ivf.countFor(corpus, cacheKey).toDouble, 0.25)).toInt)

  private def half(embCol: Column, dim: Int, which: Int): Column = {
    val h = dim / 2
    if (which == 1) slice(embCol, 1, h) else slice(embCol, h + 1, dim - h)
  }

  private def dimOf(df: DataFrame): Int =
    df.select(size(col("embedding"))).head().getInt(0)

  /** Train the two half-codebooks (each via [[Ivf.trainCodebook]] on
    * the projected half-vectors — same deterministic seeds + one Lloyd
    * step). Memoized per (cacheKey, cells) like the single-level
    * codebook. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int), (Seq[Seq[Double]], Seq[Seq[Double]])]()

  def codebooks(corpus: DataFrame, cellsPerHalf: Int,
      cacheKey: String): (Seq[Seq[Double]], Seq[Seq[Double]]) = {
    def train(): (Seq[Seq[Double]], Seq[Seq[Double]]) = {
      val dim = dimOf(corpus)
      val cb1 = Ivf.trainCodebook(corpus.select(col("vec_id"),
        half(col("embedding"), dim, 1).as("embedding")), cellsPerHalf)
      val cb2 = Ivf.trainCodebook(corpus.select(col("vec_id"),
        half(col("embedding"), dim, 2).as("embedding")), cellsPerHalf)
      (cb1, cb2)
    }
    if (cacheKey.isEmpty) train()
    else cache.computeIfAbsent((cacheKey, cellsPerHalf), _ => train())
  }

  /** Map-side combined-cell assignment: cell = c1 · K2 + c2. */
  def assignCells(df: DataFrame, cb1: Seq[Seq[Double]],
      cb2: Seq[Seq[Double]], dim: Int): DataFrame = {
    def argmax(scores: Column): Column =
      (array_position(scores, array_max(scores)) - 1).cast("int")
    df.withColumn("cell",
      argmax(Ivf.cellScores(half(col("embedding"), dim, 1), cb1)) * cb2.size +
        argmax(Ivf.cellScores(half(col("embedding"), dim, 2), cb2)))
  }

  /** The nprobe combined cells with the highest summed half-scores,
    * as one closed array expression over the t×t top-half-cell grid
    * (t = min(K, nprobe) suffices: a pair outside both top-t lists is
    * dominated by ≥ t pairs inside them on each axis). */
  private[similarity] def probeCells(embCol: Column, cb1: Seq[Seq[Double]],
      cb2: Seq[Seq[Double]], dim: Int, nprobe: Int): Column = {
    val t1 = math.min(cb1.size, nprobe)
    val t2 = math.min(cb2.size, nprobe)
    def top(scores: Column, t: Int): Column =
      slice(array_sort(transform(scores,
        (sc, i) => struct((-sc).as("neg"), i.as("c")))), 1, t)
    val top1 = top(Ivf.cellScores(half(embCol, dim, 1), cb1), t1)
    val top2 = top(Ivf.cellScores(half(embCol, dim, 2), cb2), t2)
    val pairs = flatten(transform(top1, a => transform(top2, b =>
      struct((a.getField("neg") + b.getField("neg")).as("neg"),
        (a.getField("c") * cb2.size + b.getField("c")).as("cell")))))
    transform(slice(array_sort(pairs), lit(1), lit(nprobe)),
      x => x.getField("cell"))
  }

  /** Fixture views for cross-engine oracles — the IMI counterparts of
    * [[Ivf.assignmentFixture]]/[[Ivf.probeFixture]]: combined-cell
    * assignment and the multi-sequence probe set as (id, cell) tables,
    * the only two stages of the IMI pipeline DuckDB cannot re-derive
    * (both are float-argmax over the trained half-codebooks). */
  def assignmentFixture(corpus: DataFrame, cb1: Seq[Seq[Double]],
      cb2: Seq[Seq[Double]]): DataFrame =
    assignCells(corpus, cb1, cb2, dimOf(corpus)).select("vec_id", "cell")

  def probeFixture(queries: DataFrame, cb1: Seq[Seq[Double]],
      cb2: Seq[Seq[Double]], nprobe: Int = 4): DataFrame =
    queries.select(col("vec_id").as("q_id"),
      explode(probeCells(col("embedding"), cb1, cb2, dimOf(queries), nprobe))
        .as("cell"))

  /** Deployment persistence — the CAPLESS counterpart of
    * [[Ivf.writeIndex]]: the corpus written PARTITIONED BY combined
    * cell, so a probe's parquet scan prunes to the probed cells'
    * directories instead of scanning the corpus. Directory count is
    * the nonempty-cell count (~√N — the same layout shape as IVF's,
    * with no 4096 ceiling on how far it keeps shrinking per-cell
    * populations). Returns both half-codebooks — a deployment
    * persists them beside the index (2·K·(d/2) doubles). */
  def writeIndex(corpus: DataFrame, path: String, cellsPerHalf: Int = 0,
      cacheKey: String = ""): (Seq[Seq[Double]], Seq[Seq[Double]]) = {
    val kHalf =
      if (cellsPerHalf > 0) cellsPerHalf else autoCellsPerHalf(corpus, cacheKey)
    val (cb1, cb2) = codebooks(corpus, kHalf, cacheKey)
    assignCells(corpus, cb1, cb2, dimOf(corpus))
      .select("vec_id", "embedding", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    (cb1, cb2)
  }

  /** The distinct combined-cell ids a bounded query set probes —
    * driver-side (O(queries·nprobe) ints), shared by
    * [[topKFromIndex]]'s static pruning filter and the cap bench's
    * pruned-fraction measurement. */
  def probedCellIds(queries: DataFrame, cb1: Seq[Seq[Double]],
      cb2: Seq[Seq[Double]], nprobe: Int = 4): IndexedSeq[Int] = {
    val dim = dimOf(queries)
    queries.select(
        explode(probeCells(col("embedding"), cb1, cb2, dim, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0)).toIndexedSeq
  }

  /** Probe over a written IMI index, mirroring [[Ivf.topKFromIndex]]:
    * the bounded query side's probed cell-id set collects to a STATIC
    * `cell IN (...)` filter, so partition pruning engages at plan time
    * and the scan reads ~nprobe·queries of ~√N directories. */
  def topKFromIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, cb1: Seq[Seq[Double]], cb2: Seq[Seq[Double]],
      queries: DataFrame, k: Int, nprobe: Int = 4): DataFrame = {
    val dim = dimOf(queries)
    val queryCells = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        explode(probeCells(col("embedding"), cb1, cb2, dim, nprobe)).as("cell"))
    val probed = probedCellIds(queries, cb1, cb2, nprobe)
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

  /** IMI top-k, mirroring [[Ivf.topK]]: probe-cell equi-join, exact
    * fused-cosine re-rank, per-query rank window. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      cellsPerHalf: Int = 0, nprobe: Int = 4, cacheKey: String = "",
      broadcastQueries: Boolean = true): DataFrame = {
    val kHalf =
      if (cellsPerHalf > 0) cellsPerHalf else autoCellsPerHalf(corpus, cacheKey)
    val (cb1, cb2) = codebooks(corpus, kHalf, cacheKey)
    val dim = dimOf(corpus)
    val corpusCells = assignCells(corpus, cb1, cb2, dim)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val queryCells = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        explode(probeCells(col("embedding"), cb1, cb2, dim, nprobe)).as("cell"))
    val qSide =
      if (broadcastQueries) broadcast(queryCells.as("q")) else queryCells.as("q")
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
