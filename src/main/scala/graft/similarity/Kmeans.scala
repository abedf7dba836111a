package graft.similarity

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D43 — distributed spherical k-means (multi-iteration Lloyd), the
  * clustering loop behind every IVF / SemDeDup codebook (the Ivf
  * module runs exactly ONE of these steps; real index builds run it to
  * convergence).
  *
  * Per iteration: assignment is the map-side fused
  * `graft_cell_scores` argmax ([[Ivf.assignCells]]); the update is ONE
  * aggregation — per-cell `graft_vec_mean` over the pre-normalized
  * vectors — whose k×d result normalizes on the driver (the codebook
  * budget class). Spherical objective: Σ_r max_c cos(x_r, c) is
  * NON-DECREASING under this loop — assignment picks the best cell per
  * row, and the normalized mean maximizes within-cell cosine sum —
  * which makes the entry SELF-VERIFYING: each output row carries the
  * iteration's objective (an exact integer sum of floor-quantized
  * per-row scores) and its delta from the previous iteration; a
  * negative delta beyond quantization slack means the implementation
  * is wrong, checkable from the output alone. Empty cells keep their
  * centroid (the [[Ivf.trainCodebook]] rule).
  */
object Kmeans {

  /** Unit-normalize the embedding column (cosine is scale-invariant,
    * so pre-normalizing once lets every later dot double as cosine and
    * keeps the mean a valid spherical-centroid estimator). Zero
    * vectors are dropped — they have no direction. */
  private def normalized(emb: DataFrame): DataFrame = {
    val sq = aggregate(
      transform(col("embedding").cast("array<double>"), x => x * x),
      lit(0.0), (a, x) => a + x)
    emb.select(col("vec_id"), col("embedding"))
      .withColumn("nsq", sq)
      .filter(col("nsq") > 0)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => x / sqrt(col("nsq"))).as("embedding"))
  }

  private def unitize(v: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n > 0) v.map(_ / n) else v
  }

  /** Run `iters` Lloyd steps from deterministic seeds (smallest
    * xxhash64(vec_id), the Ivf rule). Returns one row per iteration:
    * (iter, objective_q, delta_q, n_nonempty_cells). */
  def fit(s: SparkSession, emb: DataFrame, k: Int, iters: Int): DataFrame = {
    import s.implicits._
    val unit = normalized(emb).persist()
    try {
      var codebook: Seq[Seq[Double]] = unit
        .withColumn("h", xxhash64(col("vec_id")))
        .orderBy("h").limit(k)
        .select("embedding").collect()
        .map(_.getSeq[Double](0).toSeq).toSeq
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Int)]
      var prevObj = Option.empty[Long]
      for (it <- 1 to iters) {
        val assigned = Ivf.assignCells(unit, codebook)
          .withColumn("best",
            array_max(call_function("graft_cell_scores",
              col("embedding"), typedlit(codebook.map(_.toSeq)))))
        // ONE aggregation: per-cell mean vector + exact quantized
        // objective contribution
        val cells = assigned.groupBy("cell")
          .agg(call_function("graft_vec_mean", col("embedding")).as("c"),
            sum(floor(col("best") * 1e9).cast("long")).as("obj"))
          .collect()
        val obj = cells.map(_.getAs[Long]("obj")).sum
        val means = cells.map(r =>
          r.getAs[Int]("cell") -> r.getSeq[Double](1).toSeq).toMap
        codebook = codebook.indices.map(i =>
          means.get(i).map(unitize).getOrElse(codebook(i)))
        out += ((it, obj, prevObj.map(obj - _).getOrElse(0L), means.size))
        prevObj = Some(obj)
      }
      out.toSeq.toDF("iter", "objective_q", "delta_q", "n_nonempty_cells")
        .orderBy("iter")
    } finally unit.unpersist()
  }

  val qKmeans = QueryDef(
    "emb_kmeans",
    (s, d) => fit(s, Tables.embeddings(s, d), k = 8, iters = 4),
    // no SQL mirror (iterative argmax re-clustering); SELF-VERIFYING:
    // delta_q ≥ -(n rows) covers floor-quantization slack, so monotone
    // ascent is checkable from the output alone — KmeansSpec enforces it
    None)
}
