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
  * FULL FIXTURE ORACLE (r13, was rows-only SV): the two float-argmax
  * stages — the base-codebook assignment and the post-refine child
  * reassignment — are dumped as per-process fixtures (the ANN recipe:
  * the argmax is the one trusted stage, its planted laws spec-asserted
  * in IvfMaintainSpec), and DuckDB independently re-derives EVERYTHING
  * downstream in exact integer arithmetic: the delta flag (vec_id%5),
  * per-cell occupancy, the 0.75-quantile cap by sorted-multiset index,
  * the oversized set, split/keep occupancies, parent totals, and the
  * coverage law (the reassignment fixture holds EXACTLY the oversized
  * cells' vectors, children 0/1) as an n_fixture_viol audit column.
  */
object IvfMaintain {

  private val Cells = 16

  private val fixtures =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def fixtureBase(dir: String): String =
    "/tmp/graft_warehouse/ivfmaintain_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + ProcessHandle.current().pid()
  private def fixture(dir: String, sub: String)(df: => DataFrame): Unit = {
    val base = fixtureBase(dir)
    if (fixtures.add(s"$base/$sub"))
      df.write.mode("overwrite").parquet(s"$base/$sub")
  }

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
    // fixture 1 of 2: the base-codebook argmax (trusted stage)
    fixture(dir, "assign")(assigned.select("vec_id", "cell"))
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
    // fixture 2 of 2: the post-refine child argmax (trusted stage)
    fixture(dir, "reassign")(reassigned.select("vec_id", "cell", "child"))

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
      // asserted 0: DuckDB independently counts reassignment-fixture
      // coverage violations (see the oracle's viol CTE)
      .withColumn("n_fixture_viol", lit(0L))
      .select("cell_key", "parent_cell", "was_split", "n_base", "n_delta",
        "n_total", "parent_total", "cap", "n_fixture_viol")
      .orderBy("parent_cell", "cell_key")
  }

  val qIvfMaintain = QueryDef.dirOracle("emb_ivf_maintain",
    (s, d) => maintain(s, d),
    dir => {
      val base = fixtureBase(dir)
      s"""WITH a AS (SELECT vec_id, cell, (vec_id % 5 = 0) AS is_delta
                     FROM read_parquet('$base/assign/*.parquet')),
          tot AS (SELECT cell,
                    CAST(count(*) FILTER (WHERE NOT is_delta) AS BIGINT)
                      AS n_base,
                    CAST(count(*) FILTER (WHERE is_delta) AS BIGINT)
                      AS n_delta,
                    CAST(count(*) AS BIGINT) AS n_total
                  FROM a GROUP BY cell),
          -- the 0.75-quantile cap by sorted-multiset index: zero-based
          -- i = min(3L/4, L-1) over ASCENDING sizes (ties rank-stable:
          -- the value at a multiset rank is order-independent)
          capq AS (SELECT n_total AS cap FROM (
                     SELECT n_total,
                            row_number() OVER (ORDER BY n_total) AS rn,
                            count(*) OVER () AS nl
                     FROM tot)
                   WHERE rn = least(nl * 3 // 4 + 1, nl)),
          ovr AS (SELECT cell FROM tot CROSS JOIN capq WHERE n_total > cap),
          r AS (SELECT vec_id, cell, child
                FROM read_parquet('$base/reassign/*.parquet')),
          -- coverage law: the reassignment fixture holds EXACTLY the
          -- oversized cells' vectors, each once, child in {0,1}
          viol AS (SELECT CAST(count(*) AS BIGINT) AS n_bad FROM (
                     SELECT a.vec_id FROM a JOIN ovr USING (cell)
                     LEFT JOIN r ON r.vec_id = a.vec_id AND r.cell = a.cell
                     WHERE r.vec_id IS NULL OR r.child NOT IN (0, 1)
                     UNION ALL
                     SELECT r.vec_id FROM r
                     LEFT JOIN (SELECT a.vec_id, a.cell FROM a
                                JOIN ovr USING (cell)) ao
                       ON ao.vec_id = r.vec_id AND ao.cell = r.cell
                     WHERE ao.vec_id IS NULL)),
          split_rows AS (SELECT CAST(cell AS VARCHAR) || '.' ||
                           CAST(child AS VARCHAR) AS cell_key,
                           cell AS parent_cell, TRUE AS was_split,
                           CAST(count(*) FILTER (WHERE vec_id % 5 != 0)
                             AS BIGINT) AS n_base,
                           CAST(count(*) FILTER (WHERE vec_id % 5 = 0)
                             AS BIGINT) AS n_delta
                         FROM r GROUP BY cell, child),
          keep_rows AS (SELECT CAST(cell AS VARCHAR) AS cell_key,
                          cell AS parent_cell, FALSE AS was_split,
                          n_base, n_delta
                        FROM tot
                        WHERE cell NOT IN (SELECT cell FROM ovr)),
          allr AS (SELECT * FROM split_rows
                   UNION ALL SELECT * FROM keep_rows)
          SELECT allr.cell_key, allr.parent_cell, allr.was_split,
                 allr.n_base, allr.n_delta,
                 allr.n_base + allr.n_delta AS n_total,
                 tot.n_total AS parent_total, capq.cap,
                 viol.n_bad AS n_fixture_viol
          FROM allr JOIN tot ON tot.cell = allr.parent_cell
          CROSS JOIN capq CROSS JOIN viol
          ORDER BY parent_cell, cell_key"""
    })

  val all: Seq[QueryDef] = Seq(qIvfMaintain)
}
