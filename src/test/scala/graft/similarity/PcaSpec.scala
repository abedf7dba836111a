package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** D40 — the power iteration must actually FIND the dominant
  * direction (the oracle only proves both engines run the same
  * arithmetic), and the vector aggregate must be exact. */
class PcaSpec extends SparkSpec {

  test("graft_vec_sum_long sums element-wise exactly") {
    import spark.implicits._
    val df = Seq(
      Seq(1L, -2L, 3L), Seq(10L, 20L, -30L), Seq(100L, 200L, 300L))
      .toDF("v")
    val out = df.agg(call_function("graft_vec_sum_long", col("v")))
      .head().getSeq[Long](0)
    assert(out === Seq(111L, 218L, 273L))
  }

  test("power iteration recovers a planted dominant direction") {
    import spark.implicits._
    // planted component e ∝ (3,4,0,...)/5 with strong scores, plus
    // small deterministic off-axis noise on the remaining dims
    val d = 8
    val e = Array(0.6, 0.8) ++ Array.fill(d - 2)(0.0)
    val rows = (0 until 400).map { r =>
      val score = if (r % 2 == 0) 2.0 + (r % 7) * 0.5 else -2.0 - (r % 5) * 0.5
      val noise = (0 until d).map(i =>
        math.sin(r * 31 + i * 7) * 0.05)
      (r.toLong, (0 until d).map(i => (e(i) * score + noise(i)).toFloat).toArray)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val v = Pca.topComponent(spark, emb, iters = 5)
      .orderBy("dim").collect().map(_.getDouble(1))
    val cos = v.zip(e).map { case (a, b) => a * b }.sum /
      math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(cos) > 0.995,
      s"recovered component ${v.toSeq} misses planted direction (cos=$cos)")
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"loadings must be unit-norm, got $norm")
  }

  test("entry output is a unit vector over the real embeddings") {
    val v = Pca.topComponent(spark, Tables.embeddings(spark, sf), iters = 3)
      .collect().map(_.getDouble(1))
    assert(v.length === 64)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
  }
}
