package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D61 — the IVF-PQ composed index (Jégou et al. TPAMI'11 §V, the
  * architecture production ANN systems actually deploy): coarse IVF
  * cells bound WHICH rows a query scores, PQ codes bound what each
  * scoring costs. The two sketches multiply — at 100 TB a probe reads
  * nprobe/cells of the corpus as m-byte codes instead of all of it as
  * raw float arrays (cells=1024, nprobe=8, m=8 on 768-dim float32:
  * ~1/128 of the rows at ~1/384 of the bytes each).
  *
  * The index artifact is (vec_id, cell, codes) written partitionBy
  * (cell): the probe pushes a static `cell IN (...)` filter (the Ivf
  * deployment layout — partition pruning at plan time, proven in
  * IoSpec for the raw-vector variant) and each surviving row scores
  * with the true ADC LUT path (m lookups, never decoding — the Pq
  * machinery). Both codebooks are the documented O(1)-ish driver
  * materializations (cells × dim and m × ksub × dsub doubles),
  * memoized per corpus exactly as their single-index parents.
  */
object IvfPq {

  private val built =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The stored composed index: (vec_id, cell, codes), cell-partitioned.
    * Memoized per (process, dataset) — the D37/D49 fixture convention:
    * the artifact IS what IVF-PQ exists to produce; bench times the
    * probe, not the one-time build. */
  def indexStored(corpus: DataFrame, cbIvf: Seq[Seq[Double]],
      cbPq: Seq[Seq[Seq[Double]]], cacheKey: String): DataFrame = {
    val s = corpus.sparkSession
    val path = "/tmp/graft_warehouse/ivfpq_" +
      cacheKey.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      ProcessHandle.current().pid()
    if (built.add(path))
      Ivf.assignCells(corpus, cbIvf)
        .select(col("vec_id"), col("cell"),
          Pq.codesCol(col("embedding").cast("array<double>"), cbPq)
            .as("codes"))
        .write.mode("overwrite").partitionBy("cell").parquet(path)
    s.read.parquet(path)
  }

  /** Probe: nprobe cells per query (broadcast-bounded query set per
    * [[Ann.MaxBroadcastQueries]]), static partition-pruning filter
    * from the collected probed-cell set (≤ queries × nprobe ints —
    * the documented bounded-collect class), ADC scoring, rank top-k. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      cells: Int = 0, nprobe: Int = 4, cacheKey: String = ""): DataFrame = {
    val nCells = Ivf.resolveCells(corpus, cells, cacheKey)
    val cbIvf =
      if (cacheKey.nonEmpty) Ivf.codebookFor(corpus, nCells, cacheKey)
      else Ivf.trainCodebook(corpus, nCells)
    val cbPq = Pq.codebooks(corpus, cacheKey)
    val index = indexStored(corpus, cbIvf, cbPq, cacheKey)

    val qEmb = col("embedding").cast("array<double>")
    val queryCells = queries.select(col("vec_id").as("q_id"),
        Pq.dotLut(qEmb, cbPq).as("lut"), Pq.vecNorm(qEmb).as("q_norm"),
        explode(Ivf.probeCells(col("embedding"), cbIvf, nprobe)).as("cell"))
    val probed = queryCells.select("cell").distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
    val pruned = index.filter(col("cell").isin(probed: _*))

    val scored = pruned.as("c")
      .join(broadcast(queryCells.as("q")),
        col("c.cell") === col("q.cell") && col("c.vec_id") =!= col("q.q_id"))
      .select(col("q.q_id").as("q_id"), col("c.vec_id").as("vec_id"),
        Pq.adcScore(col("c.codes"), col("q.lut"), col("q.q_norm"),
          Pq.norm2Table(cbPq)).as("adc_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "adc_sim", "rnk")
  }
}
