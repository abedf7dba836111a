package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D81 — JL projection gates: exact arithmetic replay, matrix
  * balance, and the distance-preservation property the projection
  * exists for (values are oracle-gated). */
class ProjectSpec extends SparkSpec {

  test("D81: projected components equal an exact driver-side replay") {
    val rows = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).limit(5).collect()
    val got = Project.embProjectJl.fn(spark, sf)
      .filter(col("vec_id").isin(rows.map(_.getLong(0)): _*))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (0 until Project.OutDim).map(j => r.getAs[Long](s"p$j"))).toMap
    rows.foreach { r =>
      val xq = r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1e6).toLong)
      val expect = (0 until Project.OutDim).map { j =>
        (0 until Project.InDim).map(i =>
          Project.sign(i, j) * xq(i)).sum
      }
      assert(got(r.getLong(0)) === expect)
    }
  }

  test("D81: the sign matrix is roughly balanced (unbiased bit source)") {
    val flat = for (i <- 0 until Project.InDim; j <- 0 until Project.OutDim)
      yield Project.sign(i, j)
    val pos = flat.count(_ > 0)
    // 1024 fair coin flips: expect ~512, allow ±4 sigma (sigma = 16)
    assert(math.abs(pos - flat.size / 2) < 64,
      s"sign matrix badly unbalanced: $pos of ${flat.size} positive")
  }

  test("D81: pairwise distances survive the projection within JL tolerance") {
    // JL with k=16 is loose; assert rank-correlation-flavored sanity:
    // across sampled pairs, projected distance² / k tracks original
    // distance² within a wide multiplicative band for the MEDIAN pair
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).limit(20).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val proj = Project.embProjectJl.fn(spark, sf)
      .filter(col("vec_id").isin(vecs.keys.toSeq: _*))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (0 until Project.OutDim)
          .map(j => r.getAs[Long](s"p$j").toDouble / 1e6).toArray).toMap
    val ids = vecs.keys.toSeq.sorted
    val ratios = (for {
      a <- ids; b <- ids if a < b
    } yield {
      val d2 = vecs(a).zip(vecs(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      val p2 = proj(a).zip(proj(b)).map { case (x, y) => (x - y) * (x - y) }.sum /
        Project.OutDim
      if (d2 > 1e-12) Some(p2 / d2) else None
    }).flatten.sorted
    assert(ratios.nonEmpty)
    val median = ratios(ratios.size / 2)
    assert(median > 0.4 && median < 2.5,
      s"median distortion $median outside the JL sanity band")
  }
}
