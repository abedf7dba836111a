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

  private val fixtures =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def fixtureBase(dir: String): String =
    "/tmp/graft_warehouse/kcenter_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + ProcessHandle.current().pid()

  /** Greedy selection: returns (vec_id, picked_sim_q, cover_min_sim_q)
    * per round. Seed = smallest xxhash64(vec_id) (the Ivf/Kmeans seed
    * rule); its picked_sim_q is NULL (there is no prior set).
    *
    * `fixtureDir` (the oracle-gated entry sets it): dump each center's
    * quantized similarity column — (sel_idx, center_vec_id, vec_id,
    * sim_q) — plus the (vec_id, h) seed-hash table, once per (process,
    * dataset). One extra map-side pass per round over the persisted
    * unit corpus; floor(cos·1e6) is deterministic given the center. */
  def select(s: SparkSession, emb: DataFrame, k: Int,
      fixtureDir: Option[String] = None): DataFrame = {
    import s.implicits._
    val dump = fixtureDir.filter(d => fixtures.add(fixtureBase(d)))
      .map(fixtureBase)
    val unit = normalized(emb).persist()
    try {
      dump.foreach { base =>
        unit.select(col("vec_id"), xxhash64(col("vec_id")).as("h"))
          .write.mode("overwrite").parquet(s"$base/hash")
      }
      val seed = unit.withColumn("h", xxhash64(col("vec_id")))
        .orderBy("h", "vec_id").limit(1)
        .select("vec_id", "embedding").collect()(0)
      var centers = Seq((seed.getLong(0), seed.getSeq[Double](1).toSeq))
      val simQ = (c: Seq[Double]) =>
        floor(Ann.cosine(col("embedding"), typedlit(c)) * 1e6).cast("long")
      def dumpSims(r: Int, centerId: Long, centerVec: Seq[Double]): Unit =
        dump.foreach { base =>
          unit.select(lit(r).as("sel_idx"), lit(centerId).as("center_vec_id"),
              col("vec_id"), simQ(centerVec).as("sim_q"))
            .write.mode(if (r == 0) "overwrite" else "append")
            .parquet(s"$base/sims")
        }
      dumpSims(0, centers.head._1, centers.head._2)
      // each point's best similarity to the chosen set so far
      var best = unit
        .withColumn("best_q", simQ(centers.head._2))
        .localCheckpoint(true)
      // r13: ONE aggregation per round computes round r−1's corpus-wide
      // cover min AND round r's argmin — with the picked EMBEDDING
      // riding the min-struct (vec_id is unique, so the array never
      // participates in the ordering) — where the previous loop ran
      // three driver actions per round (pick agg, picked-vector fetch,
      // cover agg) beside the checkpoint. Same integer argmin, same
      // rows (fixture-oracle-verified).
      def coverAndPick(ids: Seq[Long]) = best.agg(
          min(col("best_q")).as("cover"),
          min(when(!col("vec_id").isInCollection(ids),
            struct(col("best_q"), col("vec_id"), col("embedding")))).as("m"))
        .select(col("cover"), col("m.best_q"), col("m.vec_id"),
          col("m.embedding"))
        .collect()(0)
      val picks = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Option[Long])]
      val covers = scala.collection.mutable.ArrayBuffer.empty[Long]
      picks += ((centers.head._1, None))
      for (r <- 1 until k) {
        // farthest point = min best_q, tiebreak vec_id — exact integer argmin
        val c = coverAndPick(centers.map(_._1))
        covers += c.getLong(0)
        val pickedId = c.getLong(2)
        val pickedVec = c.getSeq[Double](3).toSeq
        centers :+= ((pickedId, pickedVec))
        picks += ((pickedId, Some(c.getLong(1))))
        dumpSims(r, pickedId, pickedVec)
        val prev = best
        best = best
          .withColumn("best_q", greatest(col("best_q"), simQ(pickedVec)))
          .localCheckpoint(true)
        prev.unpersist()
      }
      covers += best.agg(min("best_q")).collect()(0).getLong(0)
      val rows = picks.zip(covers).zipWithIndex.map {
        case (((id, pq), cov), i) => (i, id, pq, cov) }
      rows.toSeq
        .toDF("sel_idx", "vec_id", "picked_sim_q", "cover_min_sim_q")
    } finally unit.unpersist()
  }

  /** FULL FIXTURE ORACLE (r13, was rows-only SV): the per-(point,
    * center) quantized similarity matrix IS the fixture (the one
    * trusted float→int stage). From it DuckDB re-derives the ENTIRE
    * greedy run in exact integers — running best per point, each
    * round's (best_q, vec_id) argmin over non-centers (which must name
    * the fixture's next center: the induction check), picked_sim_q and
    * cover_min_sim_q — re-derives the seed from the dumped xxhash64
    * table, and bounds every fixture sim_q against its own raw-float
    * cosine within floor-quantization distance. */
  val embKcenter = QueryDef.dirOracle(
    "emb_kcenter",
    (s, d) => select(s, Tables.embeddings(s, d), 8, fixtureDir = Some(d))
      .withColumn("n_fixture_viol", lit(0L)),
    dir => {
      val base = fixtureBase(dir)
      s"""WITH sims AS (SELECT sel_idx, center_vec_id, vec_id, sim_q
                        FROM read_parquet('$base/sims/*.parquet')),
          h AS (SELECT vec_id, h FROM read_parquet('$base/hash/*.parquet')),
          centers AS (SELECT DISTINCT sel_idx, center_vec_id FROM sims),
          rounds AS (SELECT DISTINCT sel_idx AS r FROM sims),
          -- running best per point after round r's center joined the set
          best AS (SELECT rounds.r, s.vec_id,
                     CAST(max(s.sim_q) AS BIGINT) AS best_q
                   FROM sims s JOIN rounds ON s.sel_idx <= rounds.r
                   GROUP BY rounds.r, s.vec_id),
          cover AS (SELECT r, CAST(min(best_q) AS BIGINT) AS cover_min
                    FROM best GROUP BY r),
          -- round r+1's pick: integer argmin among non-centers(≤r)
          elig AS (SELECT b.r, b.vec_id, b.best_q FROM best b
                   WHERE NOT EXISTS (SELECT 1 FROM centers c
                     WHERE c.center_vec_id = b.vec_id AND c.sel_idx <= b.r)),
          pickd AS (SELECT r, vec_id, best_q FROM (
                      SELECT r, vec_id, best_q, row_number() OVER
                        (PARTITION BY r ORDER BY best_q, vec_id) AS rn
                      FROM elig) t WHERE rn = 1),
          seedv AS (SELECT vec_id FROM h ORDER BY h, vec_id LIMIT 1),
          e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                FROM embeddings
                WHERE list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                  x -> x * x)) > 0),
          sbound AS (SELECT s.sim_q,
                       list_sum(list_transform(list_zip(p.emb, c.emb),
                         x -> x[1] * x[2]))
                       / (sqrt(list_sum(list_transform(p.emb, x -> x * x)))
                          * sqrt(list_sum(list_transform(c.emb, x -> x * x))))
                         AS own
                     FROM sims s JOIN e p ON p.vec_id = s.vec_id
                     JOIN e c ON c.vec_id = s.center_vec_id),
          viol AS (SELECT CAST(count(*) AS BIGINT) AS n_bad FROM (
                     -- floor(cos·1e6): own − sim_q/1e6 ∈ [0, 1e-6) ± libm
                     SELECT 1 AS x FROM sbound
                     WHERE own < sim_q / 1e6 - 2e-9
                        OR own > sim_q / 1e6 + 1e-6 + 2e-9
                     UNION ALL
                     -- induction: round r's center is round r-1's argmin
                     SELECT 1 FROM centers c JOIN pickd p ON p.r = c.sel_idx - 1
                     WHERE c.center_vec_id != p.vec_id
                     UNION ALL
                     -- the seed is the smallest-hash vector
                     SELECT 1 FROM centers c CROSS JOIN seedv
                     WHERE c.sel_idx = 0 AND c.center_vec_id != seedv.vec_id) t)
          SELECT c.sel_idx, c.center_vec_id AS vec_id,
                 p.best_q AS picked_sim_q, cov.cover_min AS cover_min_sim_q,
                 v.n_bad AS n_fixture_viol
          FROM centers c
          LEFT JOIN pickd p ON p.r = c.sel_idx - 1
          JOIN cover cov ON cov.r = c.sel_idx
          CROSS JOIN viol v
          ORDER BY c.sel_idx"""
    })

  val all: Seq[QueryDef] = Seq(embKcenter)
}
