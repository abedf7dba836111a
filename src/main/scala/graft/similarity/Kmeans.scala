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

  private val fixtures =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def fixtureBase(dir: String): String =
    "/tmp/graft_warehouse/kmeans_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + ProcessHandle.current().pid()

  /** Run `iters` Lloyd steps from deterministic seeds (smallest
    * xxhash64(vec_id), the Ivf rule). Returns one row per iteration:
    * (iter, objective_q, delta_q, n_nonempty_cells).
    *
    * `fixtureDir` (the oracle-gated entry sets it): dump each
    * iteration's per-row quantized argmax — (iter, vec_id, cell,
    * best_q) — and the codebook it argmaxed against, once per
    * (process, dataset). The dump is one extra map-side pass per
    * iteration over the PERSISTED unit corpus; floor(best·1e9) is
    * deterministic given the codebook, so the dumped values are the
    * exact terms the objective sums. */
  def fit(s: SparkSession, emb: DataFrame, k: Int, iters: Int,
      fixtureDir: Option[String] = None): DataFrame = {
    import s.implicits._
    val dump = fixtureDir.filter(d => fixtures.add(fixtureBase(d)))
      .map(fixtureBase)
    val unit = normalized(emb).persist()
    try {
      var codebook: Seq[Seq[Double]] = unit
        .withColumn("h", xxhash64(col("vec_id")))
        .orderBy("h").limit(k)
        .select("embedding").collect()
        .map(_.getSeq[Double](0).toSeq).toSeq
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Int)]
      val cbRows = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Seq[Double])]
      var prevObj = Option.empty[Long]
      for (it <- 1 to iters) {
        val assigned = Ivf.assignCells(unit, codebook)
          .withColumn("best",
            array_max(call_function("graft_cell_scores",
              col("embedding"), typedlit(codebook.map(_.toSeq)))))
        dump.foreach { base =>
          assigned.select(lit(it).as("iter"), col("vec_id"), col("cell"),
              floor(col("best") * 1e9).cast("long").as("best_q"))
            .write.mode(if (it == 1) "overwrite" else "append")
            .parquet(s"$base/assign")
          cbRows ++= codebook.indices.map(c => (it, c, codebook(c)))
        }
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
      dump.foreach { base =>
        cbRows.toSeq.toDF("iter", "cell", "centroid")
          .write.mode("overwrite").parquet(s"$base/codebook")
      }
      out.toSeq.toDF("iter", "objective_q", "delta_q", "n_nonempty_cells")
        .orderBy("iter")
    } finally unit.unpersist()
  }

  /** FULL FIXTURE ORACLE (r13, was rows-only SV): the per-iteration
    * quantized argmax table IS the fixture (the one trusted stage, the
    * ANN recipe); DuckDB re-derives every output value EXACTLY from it
    * (objective = Σ best_q, deltas, distinct-cell counts) and bounds
    * the fixture against its own float arithmetic: each row's best_q
    * must sit within floor-quantization distance of the RAW-float max
    * cosine against that iteration's dumped codebook, and the assigned
    * cell must score within tolerance of that max (argmax law). A
    * cross-libm ulp cannot flip the gate: the exact integers come from
    * the fixture, the floats only pass a 2e-9-tolerance audit. */
  val qKmeans = QueryDef.dirOracle(
    "emb_kmeans",
    (s, d) => fit(s, Tables.embeddings(s, d), k = 8, iters = 4,
        fixtureDir = Some(d))
      .withColumn("n_fixture_viol", lit(0L)),
    dir => {
      val base = fixtureBase(dir)
      s"""WITH a AS (SELECT iter, vec_id, cell, best_q
                     FROM read_parquet('$base/assign/*.parquet')),
          cb AS (SELECT iter, cell, centroid
                 FROM read_parquet('$base/codebook/*.parquet')),
          obj AS (SELECT iter, CAST(SUM(best_q) AS BIGINT) AS objective_q,
                    CAST(count(DISTINCT cell) AS INTEGER)
                      AS n_nonempty_cells
                  FROM a GROUP BY iter),
          outr AS (SELECT iter, objective_q,
                     COALESCE(objective_q - lag(objective_q)
                       OVER (ORDER BY iter), 0) AS delta_q,
                     n_nonempty_cells
                   FROM obj),
          e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                FROM embeddings
                WHERE list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                  x -> x * x)) > 0),
          sc AS (SELECT a.iter, a.vec_id, a.cell, a.best_q, cb.cell AS c,
                   list_sum(list_transform(list_zip(e.emb,
                     CAST(cb.centroid AS DOUBLE[])), p -> p[1] * p[2]))
                   / (sqrt(list_sum(list_transform(e.emb, x -> x * x)))
                      * sqrt(list_sum(list_transform(
                          CAST(cb.centroid AS DOUBLE[]), x -> x * x))))
                     AS s
                 FROM a JOIN e USING (vec_id)
                 JOIN cb ON cb.iter = a.iter),
          per AS (SELECT iter, vec_id, cell, best_q, max(s) AS smax,
                    max(CASE WHEN c = cell THEN s END) AS sassigned
                  FROM sc GROUP BY iter, vec_id, cell, best_q),
          -- floor(best·1e9): smax − best_q/1e9 ∈ [0, 1e-9) modulo libm
          -- noise; the assigned cell must achieve the max within noise
          viol AS (SELECT CAST(count(*) AS BIGINT) AS n_bad FROM per
                   WHERE smax < best_q / 1e9 - 2e-9
                      OR smax > best_q / 1e9 + 1e-9 + 2e-9
                      OR sassigned < smax - 2e-9)
          SELECT o.iter, o.objective_q, o.delta_q, o.n_nonempty_cells,
                 v.n_bad AS n_fixture_viol
          FROM outr o CROSS JOIN viol v ORDER BY o.iter"""
    })
}
