package graft.similarity

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D40 — distributed PCA: top principal component of the embedding
  * covariance by power iteration, exact-arithmetic edition.
  *
  * Embedding analytics needs the dominant directions of the corpus
  * (whitening, anisotropy diagnostics, the "rogue dimensions" check
  * before cosine search is trusted). The memory shape is the point:
  * each power step is ONE corpus pass computing s_r = (x_r−μ)·v
  * map-side and accumulating u = Σ_r s_r·(x_r−μ) via the native
  * `graft_vec_sum_long` vector aggregate — no dim-explode shuffle, no
  * gram matrix (d×d never materializes; only O(d) driver state: μ, v,
  * u — the PageRank-N / IVF-codebook budget class).
  *
  * Cross-engine determinism (the repo convention, in vector form):
  * inputs quantize to integers once (floor(x·1e6 + 0.5)); every
  * corpus-order-dependent reduction — per-row dot products, per-dim
  * contribution sums — is a sum of floor-quantized LONGS, exact and
  * order-free; the only float ops are single divisions, multiplies and
  * one sqrt per normalize, all IEEE-deterministic, replayed identically
  * by the driver and the unrolled DuckDB oracle. The result is a
  * hash-gateable eigenvector, not a "close enough" one.
  */
object Pca {

  private val Q = 1e6   // input / contribution quantization
  private val QS = 1e9  // dot-product / loading quantization

  /** Top principal component after `iters` power steps. Returns
    * (dim, loading) rows, 1-based, loadings floor-quantized to 1e-9.
    * The corpus-side work per step is one aggregation job; v0 is the
    * uniform unit vector (deterministic; any v0 not orthogonal to the
    * component works). */
  def topComponent(s: SparkSession, emb: DataFrame, iters: Int): DataFrame = {
    import s.implicits._
    // Quantized longs are CACHED (not the derived x−μ doubles): the
    // head pass populates the cache while computing μ, so the parquet
    // corpus is scanned+decoded exactly ONCE per call (r14 — the
    // previous shape cached xm, whose first materialization re-scanned
    // the parquet a second time inside power step 1). Each step
    // re-derives x−μ from the cached longs with d multiply-adds per
    // row — noise next to the step's own quantized dot/contribution
    // chain, and arithmetically IDENTICAL doubles, so every oracle
    // value carries over.
    val xq = emb.select(transform(col("embedding"),
      x => floor(x.cast("double") * Q + 0.5).cast("long")).as("xq")).persist()
    try {
      val head = xq.agg(
        call_function("graft_vec_sum_long", col("xq")).as("sums"),
        count(lit(1)).as("n")).head()
      val sums = head.getSeq[Long](0)
      val n = head.getLong(1)
      val d = sums.length
      require(d > 0 && n > 0, "empty embedding corpus")
      val mu = sums.map(q => q.toDouble / (n.toDouble * Q)).toArray

      val muL = typedlit(mu.toSeq)
      val xmCol = transform(col("xq"), (q, i) =>
        q.cast("double") / Q - element_at(muL, i + 1)).as("xm")

      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      for (_ <- 1 to iters) {
        val vL = typedlit(v.toSeq)
        val srExpr = aggregate(
          zip_with(col("xm"), vL, (m, vi) => floor(m * vi * QS).cast("long")),
          lit(0L), (acc, x) => acc + x)
        val u = xq.select(xmCol)
          .select(col("xm"), srExpr.as("s"))
          .select(transform(col("xm"), m =>
            floor(m * (col("s").cast("double") / QS) * Q).cast("long")).as("c"))
          .agg(call_function("graft_vec_sum_long", col("c")))
          .head().getSeq[Long](0)
        // normalize — identical arithmetic to the oracle's v{k} CTE
        val w = u.map(_.toDouble / Q)
        val nsq = w.map(wi => math.floor(wi * wi * Q).toLong).sum
        require(nsq > 0L, "degenerate component (zero norm)")
        val norm = math.sqrt(nsq.toDouble / Q)
        v = w.map(wi => math.floor(wi / norm * QS) / QS).toArray
      }
      v.zipWithIndex.map { case (l, i) => (i + 1, l) }.toSeq
        .toDF("dim", "loading").orderBy("dim")
    } finally xq.unpersist()
  }

  private val Iters = 3

  /** One unrolled oracle power step, mirroring [[topComponent]]'s loop
    * body term for term. */
  private def oIter(k: Int): String = {
    val prev = s"v${k - 1}"
    s"""sr$k AS (SELECT x.vec_id,
                   CAST(SUM(CAST(floor(x.m * v.v * 1e9) AS BIGINT)) AS BIGINT) AS s
                 FROM xm x JOIN $prev v USING (i) GROUP BY x.vec_id),
        u$k AS (SELECT x.i,
                  CAST(SUM(CAST(floor(x.m * (CAST(s.s AS DOUBLE) / 1e9) * 1e6)
                    AS BIGINT)) AS BIGINT) AS u
                FROM xm x JOIN sr$k s USING (vec_id) GROUP BY x.i),
        nq$k AS (SELECT CAST(SUM(CAST(floor((CAST(u AS DOUBLE) / 1e6)
                   * (CAST(u AS DOUBLE) / 1e6) * 1e6) AS BIGINT)) AS BIGINT) AS nsq
                 FROM u$k),
        v$k AS (SELECT i, floor((CAST(u AS DOUBLE) / 1e6)
                  / sqrt(CAST(nsq AS DOUBLE) / 1e6) * 1e9) / 1e9 AS v
                FROM u$k, nq$k)"""
  }

  val qTopPc = QueryDef(
    "emb_top_pc",
    (s, d) => topComponent(s, Tables.embeddings(s, d), Iters),
    Some(s"""WITH xq AS (SELECT vec_id, i,
                    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS q
                  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)),
             nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
             mu AS (SELECT i, CAST(SUM(q) AS BIGINT) AS sq FROM xq GROUP BY i),
             dd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS d FROM mu),
             xm AS (SELECT x.vec_id, x.i,
                      CAST(x.q AS DOUBLE) / 1e6
                        - CAST(m.sq AS DOUBLE) / (CAST(nn.n AS DOUBLE) * 1e6) AS m
                    FROM xq x JOIN mu m USING (i), nn),
             v0 AS (SELECT i, CAST(1 AS DOUBLE) / sqrt(dd.d) AS v FROM mu, dd),
             ${oIter(1)},
             ${oIter(2)},
             ${oIter(3)}
             SELECT CAST(i AS INTEGER) AS dim, v AS loading
             FROM v$Iters ORDER BY dim"""))
}
