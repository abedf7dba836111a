package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D51 — degree-ordered triangle counting: hand-built graphs with known
  * answers (including the hub shape the orientation exists for), plus
  * structural invariants on the co-supply graph. */
class TrianglesSpec extends SparkSpec {

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Triangles.triangleCounts(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("D51: K4 has four triangles, three per node") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val c = counts(k4)
    assert(c === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("D51: a star has no triangles; closing one spoke pair makes one") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(counts(star).values.forall(_ === 0L))
    val closed = star :+ (2L, 3L)
    val c = counts(closed)
    assert(c(1L) === 1L && c(2L) === 1L && c(3L) === 1L)
    assert(c(4L) === 0L && c(5L) === 0L)
  }

  test("D51: co-supply graph invariants — Σn_tri ≡ 0 (mod 3), all nodes present") {
    val edges = Triangles.coSupplyEdges(spark, sf).cache()
    val out = Triangles.triangleCounts(edges).cache()
    val nodes = edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n"))).distinct().count()
    assert(out.count() === nodes, "one output row per graph node")
    val total = out.agg(sum("n_tri")).head().getLong(0)
    assert(total % 3 === 0, "each triangle is counted at exactly 3 corners")
    assert(out.filter(col("n_tri") < 0).count() === 0)
    out.unpersist(); edges.unpersist()
  }
}
