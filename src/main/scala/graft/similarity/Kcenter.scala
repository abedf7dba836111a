package graft.similarity

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D95 — k-center greedy (farthest-point / Gonzalez 1985) diversity
  * selection over the embedding corpus: repeatedly pick the point
  * FARTHEST (min cosine) from everything chosen so far — the coreset /
  * diverse-subset selector behind "don't fine-tune on 10k near-copies"
  * (sampling by hash keeps duplicates at their corpus rate; k-center
  * provably spreads). Greedy gives the classic 2-approximation of the
  * optimal k-center radius.
  *
  * Scale: per round ONE map-side cosine against the single newest
  * center (each point's running best similarity folds with
  * `greatest`, so round r costs one corpus pass, not r of them) + one
  * partial-aggregable min-struct argmin — no window, no self-join. The
  * only driver state is the chosen centers (k × d — the Ivf codebook
  * budget class). Similarities floor-quantize to 1e-6 longs before the
  * argmin, so selection is deterministic and the spec can replay it
  * bit-for-bit. localCheckpoint cuts the per-round lineage (the
  * Clusters/PageRank discipline).
  *
  * Self-verifying output (one row per selected center, in selection
  * order): `picked_sim_q` — the chosen point's best similarity to the
  * PRIOR set (the greedy objective; what the algorithm minimized) —
  * and `cover_min_sim_q` — the corpus-wide worst coverage AFTER adding
  * it. Laws checkable from the output alone: picked_sim_q is
  * NON-DECREASING over rounds (greedy exhausts the most isolated
  * points first: each pick maximizes distance to a GROWING set, so the
  * minimized similarity can only rise), cover_min_sim_q is
  * non-decreasing (adding a center never worsens any point's
  * coverage), and cover_min_sim_q(r) equals picked_sim_q(r+1).
  */
object Kcenter {

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

  /** Greedy selection: returns (vec_id, picked_sim_q, cover_min_sim_q)
    * per round. Seed = smallest xxhash64(vec_id) (the Ivf/Kmeans seed
    * rule); its picked_sim_q is NULL (there is no prior set). */
  def select(s: SparkSession, emb: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    val unit = normalized(emb).persist()
    try {
      val seed = unit.withColumn("h", xxhash64(col("vec_id")))
        .orderBy("h", "vec_id").limit(1)
        .select("vec_id", "embedding").collect()(0)
      var centers = Seq((seed.getLong(0), seed.getSeq[Double](1).toSeq))
      val simQ = (c: Seq[Double]) =>
        floor(Ann.cosine(col("embedding"), typedlit(c)) * 1e6).cast("long")
      // each point's best similarity to the chosen set so far
      var best = unit
        .withColumn("best_q", simQ(centers.head._2))
        .localCheckpoint(true)
      val rows = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Long, Option[Long], Long)]
      rows += ((0, centers.head._1,
        None,
        best.agg(min("best_q")).collect()(0).getLong(0)))
      for (r <- 1 until k) {
        // farthest point = min best_q, tiebreak vec_id — exact integer argmin
        val pick = best.filter(!col("vec_id").isInCollection(centers.map(_._1)))
          .agg(min(struct(col("best_q"), col("vec_id"))).as("m"))
          .select(col("m.best_q"), col("m.vec_id")).collect()(0)
        val pickedId = pick.getLong(1)
        val pickedVec = unit.filter(col("vec_id") === pickedId)
          .select("embedding").collect()(0).getSeq[Double](0).toSeq
        centers :+= ((pickedId, pickedVec))
        val prev = best
        best = best
          .withColumn("best_q", greatest(col("best_q"), simQ(pickedVec)))
          .localCheckpoint(true)
        prev.unpersist()
        rows += ((r, pickedId, Some(pick.getLong(0)),
          best.agg(min("best_q")).collect()(0).getLong(0)))
      }
      rows.toSeq
        .toDF("sel_idx", "vec_id", "picked_sim_q", "cover_min_sim_q")
    } finally unit.unpersist()
  }

  val embKcenter = QueryDef(
    "emb_kcenter",
    (s, d) => select(s, Tables.embeddings(s, d), 8))

  val all: Seq[QueryDef] = Seq(embKcenter)
}
