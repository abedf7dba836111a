package graft.similarity

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D89 — IVF index MAINTENANCE: delta ingest + oversized-cell split.
  *
  * Every ANN entry so far builds its index once (D7-alt trains, writes,
  * probes); a production vector store instead absorbs a continuous
  * stream of new vectors into an EXISTING index and must react when
  * cells outgrow their serving budget (an oversized cell makes every
  * probe that hits it scan too much). This entry is that ops loop:
  * (1) new vectors are assigned with the BASE codebook — maintenance
  * never retrains the world; (2) per-cell occupancy is audited against
  * a cap (the 0.75-quantile of cell sizes — data-driven, so the split
  * path provably exercises on any corpus); (3) each oversized cell
  * splits in place by a deterministic local 2-means (hash-seeded pair,
  * one assign + one `graft_vec_mean` refine + one reassign) touching
  * ONLY that cell's vectors.
  *
  * Scale shape: one map-side assignment pass over base+delta (codebook
  * broadcast as a literal, the D7-alt discipline), ONE O(cells) driver
  * collect for the occupancy audit (the codebook-sized class), and the
  * split machinery runs on the oversized cells only — all cell-keyed
  * windows/joins, never cross-cell. At 100 TB the same plan holds
  * because every stage is keyed by cell and the per-cell split is
  * local; the delta/base ratio, not the corpus size, drives cost.
  *
  * Rows-only SV (k-means centroids are float — no SQL mirror): the
  * output carries, per resulting cell, base/delta/total occupancy, the
  * parent's pre-split total and the cap, so conservation
  * (Σ n_total = |base| + |delta|), split-trigger correctness
  * (split ⟺ parent_total > cap) and per-parent child conservation are
  * all checkable from the emitted rows alone; IvfMaintainSpec asserts
  * each law.
  */
object IvfMaintain {

  private val Cells = 16

  /** Base corpus vs the later-arriving delta batch (disjoint by id). */
  def corpusParts(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val all = Tables.embeddings(s, dir)
    (all.filter(col("vec_id") % 5 =!= 0), all.filter(col("vec_id") % 5 === 0))
  }

  def maintain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (base, delta) = corpusParts(s, dir)
    val codebook = Ivf.codebookFor(base, Cells, dir + "#maintain_base")
    val assigned = Ivf.assignCells(
        base.withColumn("is_delta", lit(false))
          .unionByName(delta.withColumn("is_delta", lit(true))), codebook)
      .select(col("vec_id"), col("embedding"), col("cell"), col("is_delta"))
      .localCheckpoint() // one assignment pass feeds audit + split
    // occupancy audit: O(cells) rows — the codebook-sized driver class
    val totals = assigned.groupBy("cell")
      .agg(sum(when(!col("is_delta"), 1L).otherwise(0L)).as("n_base"),
        sum(when(col("is_delta"), 1L).otherwise(0L)).as("n_delta"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val sizes = totals.map(t => t._2 + t._3).sorted
    val cap = sizes(((sizes.length * 3) / 4).min(sizes.length - 1))
    val oversized = totals.collect { case (c, b, d) if b + d > cap => c }.toSet

    val ovs = assigned.filter(col("cell").isin(oversized.toSeq: _*))
    // deterministic 2-means seeds: the two smallest-hash vectors per cell
    val seeds = ovs
      .withColumn("rn", row_number().over(
        Window.partitionBy("cell").orderBy(xxhash64(col("vec_id")), col("vec_id"))))
      .filter(col("rn") <= 2)
      .select(col("cell").as("sc"), (col("rn") - 1).cast("int").as("child"),
        col("embedding").as("s_emb"))
    val byVec = Window.partitionBy("cell", "vec_id")
      .orderBy(col("score").desc, col("child"))
    val subAssign = ovs.join(seeds, col("cell") === col("sc"))
      .withColumn("score", Ann.cosine(col("embedding"), col("s_emb")))
      .withColumn("rnk", row_number().over(byVec))
      .filter(col("rnk") === 1)
    val children = subAssign.groupBy("cell", "child")
      .agg(call_function("graft_vec_mean",
        col("embedding").cast("array<double>")).as("c_emb"))
    val reassigned = ovs.join(children, Seq("cell"))
      .withColumn("score", Ann.cosine(col("embedding"), col("c_emb")))
      .withColumn("rnk", row_number().over(byVec))
      .filter(col("rnk") === 1)

    val splitRows = reassigned.groupBy("cell", "child")
      .agg(sum(when(!col("is_delta"), 1L).otherwise(0L)).as("n_base"),
        sum(when(col("is_delta"), 1L).otherwise(0L)).as("n_delta"))
      .select(concat(col("cell"), lit("."), col("child")).as("cell_key"),
        col("cell").as("parent_cell"), lit(true).as("was_split"),
        col("n_base"), col("n_delta"))
    val keepRows = totals.toSeq
      .filterNot { case (c, _, _) => oversized(c) }
      .map { case (c, b, d) => (c.toString, c, false, b, d) }
      .toDF("cell_key", "parent_cell", "was_split", "n_base", "n_delta")
    val parents = totals.toSeq.map { case (c, b, d) => (c, b + d) }
      .toDF("parent_cell", "parent_total")
    splitRows.unionByName(keepRows)
      .withColumn("n_total", col("n_base") + col("n_delta"))
      .join(parents, "parent_cell")
      .withColumn("cap", lit(cap))
      .select("cell_key", "parent_cell", "was_split", "n_base", "n_delta",
        "n_total", "parent_total", "cap")
      .orderBy("parent_cell", "cell_key")
  }

  val qIvfMaintain = QueryDef("emb_ivf_maintain", (s, d) => maintain(s, d))

  val all: Seq[QueryDef] = Seq(qIvfMaintain)
}
