package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D82 — the layout claim as assertions (values are oracle-gated). */
class LayoutSpec extends SparkSpec {

  test("D82: similarity order beats insertion order on adjacent Jaccard") {
    val rows = Layout.textSimLayout.fn(spark, sf).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("mean_adj_jaccard_ppm")))
      .toMap
    assert(rows.keySet === Set("id_order", "sim_order"))
    val (nId, jId) = rows("id_order")
    val (nSim, jSim) = rows("sim_order")
    assert(nId === nSim, "both layouts order the same corpus")
    assert(jSim > jId,
      s"clustered layout must increase neighbor similarity ($jSim vs $jId)")
    // the planted near-dups are ~1.0 Jaccard pairs; with 1-in-25 docs
    // planted, clustering them adjacent should lift the mean well clear
    // of noise — require at least a 2x improvement
    assert(jSim > jId * 2,
      s"expected a decisive locality win, got $jId -> $jSim")
  }

  test("D82: in similarity order, planted variants sit next to their originals") {
    val base = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val planted = base.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zzz")).as("text"))
    val sh = base.unionByName(planted)
      .select(col("doc_id"),
        array_distinct(transform(
          graft.functions.Text.shingles(col("text"), 3),
          x => conv(substring(md5(x), 1, 15), 16, 10).cast("long")))
          .as("sh"))
      .withColumn("minsh", array_min(col("sh")))
    val ordered = graft.operators.Ranks
      .globalRowNumber(sh, Seq(col("minsh"), col("doc_id")), 8, "rnk")
      .select("doc_id", "rnk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plants = ordered.keys.filter(_ >= 1000000L)
    assert(plants.nonEmpty)
    val adjacent = plants.count { p =>
      math.abs(ordered(p) - ordered(p - 1000000L)) == 1
    }
    // the minhash identity makes adjacency probabilistic (the appended
    // token can itself become the min shingle, and unrelated docs can
    // sort between a tied pair) — bottom-1 locality is a clustering
    // heuristic, not a guarantee; a strong majority is the claim
    assert(adjacent.toDouble / plants.size > 0.6,
      s"only $adjacent of ${plants.size} plants landed next to their original")
  }
}
