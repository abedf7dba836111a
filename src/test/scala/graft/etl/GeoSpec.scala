package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E27 — spatial nearest-center enrichment: semantics (self-match,
  * true argmin) and plan shape (broadcast dim, aggregation not
  * window). */
class GeoSpec extends SparkSpec {

  private lazy val res = Geo.nearestCenter(spark).cache()
  private lazy val pts = Geo.points(spark).cache()

  test("E27: every center is its own nearest center at distance 0") {
    val centers = pts.filter(col("is_center"))
      .select(col("composite_key")).collect().map(_.getString(0)).toSet
    assert(centers.nonEmpty)
    val self = res.filter(col("composite_key").isin(centers.toSeq: _*))
      .collect()
    assert(self.nonEmpty)
    self.foreach { r =>
      assert(r.getAs[String]("center_key") === r.getAs[String]("composite_key"))
      assert(r.getAs[Long]("dist2") === 0L)
    }
  }

  test("E27: the struct-min argmin equals an exhaustive per-point recompute") {
    val centers = pts.filter(col("is_center"))
      .select("composite_key", "latc", "lonc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sample = pts.filter(xxhash64(col("composite_key")) % 37 === 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sample.nonEmpty)
    val expected = sample.map { case (k, la, lo) =>
      val best = centers.map { case (ck, cla, clo) =>
        val (d1, d2) = (la - cla, lo - clo)
        (d1 * d1 + d2 * d2, ck)
      }.min
      k -> best
    }.toMap
    val got = res.filter(col("composite_key").isin(expected.keys.toSeq: _*))
      .collect()
      .map(r => r.getAs[String]("composite_key") ->
        ((r.getAs[Long]("dist2"), r.getAs[String]("center_key")))).toMap
    assert(got === expected)
  }

  test("E27: plan broadcasts the center dim and reduces via aggregation, not a window") {
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "the bounded center dim must broadcast")
    assert(!plan.contains("WindowExec"),
      "the argmin must be the partial-aggregable struct-min, not a " +
        "points×centers window sort")
  }
}
