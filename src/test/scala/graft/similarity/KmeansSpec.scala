package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** D43 — Lloyd's invariants: monotone spherical objective, planted
  * cluster recovery. */
class KmeansSpec extends SparkSpec {

  test("objective is non-decreasing across iterations on the real embeddings") {
    val rows = Kmeans.fit(spark, Tables.embeddings(spark, sf), k = 8, iters = 4)
      .orderBy("iter").collect()
    assert(rows.length === 4)
    // delta ≥ -(quantization slack): each row's score quantizes with
    // floor(·1e9), so Σ can understate by at most 1 per row; 500
    // vectors → slack 500
    rows.drop(1).foreach { r =>
      assert(r.getAs[Long]("delta_q") >= -500L,
        s"objective decreased at iter ${r.getAs[Int]("iter")}: ${rows.toSeq}")
    }
    // and it genuinely improves from the seed assignment
    assert(rows.last.getAs[Long]("objective_q") >
      rows.head.getAs[Long]("objective_q"))
    assert(rows.forall(_.getAs[Int]("n_nonempty_cells") > 0))
  }

  test("planted well-separated clusters are recovered") {
    import spark.implicits._
    // three orthogonal directions + small deterministic jitter
    val d = 6
    val dirs = Seq(
      Array(1.0, 0, 0, 0, 0, 0), Array(0, 1.0, 0, 0, 0, 0),
      Array(0, 0, 1.0, 0, 0, 0))
    val rows = (0 until 300).map { i =>
      val c = i % 3
      val v = (0 until d).map(j =>
        (dirs(c)(j) + math.sin(i * 13 + j * 5) * 0.08).toFloat).toArray
      (i.toLong, v, c)
    }
    val emb = rows.map(r => (r._1, r._2)).toDF("vec_id", "embedding")
    val fitRows = Kmeans.fit(spark, emb, k = 3, iters = 5).collect()
    assert(fitRows.last.getAs[Int]("n_nonempty_cells") === 3)
    // final codebook isn't exposed; verify via a fresh 1-step fit-like
    // assignment: vectors of the same planted cluster must co-locate.
    // Re-run fit's internal assignment by training k-means again and
    // checking objective reaches near the planted optimum: with 0.08
    // jitter, mean cosine to own centroid ≈ 0.99 → objective_q ≈
    // 300 · 0.99e9
    val objective = fitRows.last.getAs[Long]("objective_q")
    assert(objective > (300L * 0.97e9).toLong,
      s"converged objective $objective below planted-cluster optimum")
  }
}
