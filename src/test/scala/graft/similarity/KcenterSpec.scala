package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D95 — k-center greedy selection laws. */
class KcenterSpec extends SparkSpec {

  test("planted recovery: three orthogonal clusters → k=3 picks one center per cluster") {
    import spark.implicits._
    // tight clusters around e1, e2, e3 (orthogonal — cross-cluster cos ≈ 0)
    def v(axis: Int, eps: Double, at: Int) =
      (0 until 4).map(i =>
        (if (i == axis) 1.0f else 0.0f) + (if (i == at) eps.toFloat else 0.0f))
    val emb = Seq(
      (1L, v(0, 0.00, 1), "a"), (2L, v(0, 0.01, 1), "a"), (3L, v(0, 0.02, 2), "a"),
      (4L, v(1, 0.00, 2), "b"), (5L, v(1, 0.01, 2), "b"),
      (6L, v(2, 0.00, 3), "c"), (7L, v(2, 0.01, 3), "c"))
      .toDF("vec_id", "embedding", "label")
    val picked = Kcenter.select(spark, emb, 3)
      .select("vec_id").as[Long].collect().toSet
    val cluster = Map(1L -> "a", 2L -> "a", 3L -> "a", 4L -> "b", 5L -> "b",
      6L -> "c", 7L -> "c")
    assert(picked.map(cluster) == Set("a", "b", "c"))
  }

  test("selection replays exactly from a driver-side greedy reference") {
    import spark.implicits._
    val ids = (1L to 12L)
    val vecs = ids.map { id =>
      // deterministic pseudo-random unit-ish vectors
      val raw = (0 until 6).map(j => ((id * 31 + j * 17) % 13).toDouble - 6.0)
      (id, raw.map(_.toFloat), "x")
    }
    val emb = vecs.toDF("vec_id", "embedding", "label")
    val got = Kcenter.select(spark, emb, 5)
      .select("sel_idx", "vec_id").as[(Int, Long)].collect().sortBy(_._1).map(_._2)

    // driver replay, mirroring the engine arithmetic: unit-normalize,
    // index-order dot, floor-quantize at 1e-6, min-(sim, id) argmin
    val unit = vecs.map { case (id, raw, _) =>
      val d = raw.map(_.toDouble)
      val n = math.sqrt(d.map(x => x * x).sum)
      id -> d.map(_ / n)
    }.toMap
    def simQ(a: Seq[Double], b: Seq[Double]): Long =
      math.floor(a.zip(b).map { case (x, y) => x * y }.sum * 1e6).toLong
    // seed: smallest xxhash64(vec_id) — read it from the engine output
    var centers = Seq(got(0))
    val bestQ = scala.collection.mutable.Map(
      ids.filterNot(_ == got(0)).map(i => i -> simQ(unit(i), unit(got(0)))): _*)
    val expect = scala.collection.mutable.ArrayBuffer(got(0))
    for (_ <- 1 until 5) {
      val pick = bestQ.toSeq.map { case (id, q) => (q, id) }.min
      expect += pick._2
      bestQ.remove(pick._2)
      bestQ.keys.foreach { i =>
        bestQ(i) = math.max(bestQ(i), simQ(unit(i), unit(pick._2)))
      }
      centers :+= pick._2
    }
    assert(got.toSeq == expect.toSeq)
  }

  test("output laws on the real corpus: monotone objective, monotone coverage, chain identity") {
    val rows = Kcenter.embKcenter.fn(spark, sf)
      .orderBy("sel_idx").collect()
    assert(rows.length == 8)
    val picked = rows.tail.map(_.getAs[Long]("picked_sim_q"))
    assert(picked.zip(picked.tail).forall { case (a, b) => a <= b },
      "greedy objective must be non-decreasing")
    val cover = rows.map(_.getAs[Long]("cover_min_sim_q"))
    assert(cover.zip(cover.tail).forall { case (a, b) => a <= b },
      "coverage floor must be non-decreasing")
    // chain: the worst-covered point after round r is exactly what round
    // r+1 picks
    rows.sliding(2).foreach { w =>
      assert(w(1).getAs[Long]("picked_sim_q") == w(0).getAs[Long]("cover_min_sim_q"))
    }
  }
}
