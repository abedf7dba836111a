package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** R151 — largest-remainder apportionment laws. */
class AllocateSpec extends SparkSpec {

  private lazy val rows =
    Allocate.qApportion.fn(spark, sf)
      .select("source", "n_tokens", "base", "rem", "alloc")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  private val Budget = 1000000L

  test("allocations sum to the budget exactly") {
    assert(rows.map(_._5).sum == Budget)
  }

  test("quota property: every stratum gets floor or ceil of its exact quota") {
    val tot = rows.map(_._2).sum
    rows.foreach { case (src, n, base, _, alloc) =>
      val floorQ = Budget * n / tot // Long division truncates = floor (all positive)
      assert(base == floorQ, src)
      assert(alloc == floorQ || alloc == floorQ + 1, src)
    }
  }

  test("engine result equals a driver-side largest-remainder replay") {
    val tot = rows.map(_._2).sum
    val base = rows.map { case (src, n, _, _, _) => (src, Budget * n / tot, Budget * n % tot) }
    val leftover = Budget - base.map(_._2).sum
    val extras = base.sortBy { case (src, _, rem) => (-rem, src) }
      .take(leftover.toInt).map(_._1).toSet
    val expect = base.map { case (src, b, _) =>
      src -> (b + (if (extras(src)) 1L else 0L))
    }.toMap
    rows.foreach { case (src, _, _, _, alloc) => assert(alloc == expect(src), src) }
  }
}
