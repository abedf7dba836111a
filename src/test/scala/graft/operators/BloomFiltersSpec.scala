package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IO20 — parquet bloom-filter audit gates: the control variant
  * proves the skipping signal comes from the written filters, the
  * probe laws prove the filters behave like bloom filters. */
class BloomFiltersSpec extends SparkSpec {

  private lazy val rows =
    BloomFilters.bloomAudit(spark, sf).collect()

  test("IO20: every bloom-variant group carries a filter; the plain control none") {
    assert(rows.length === 32, "16 probes x 2 variants")
    val (bloom, plain) = rows.partition(_.getAs[String]("variant") == "bloom")
    bloom.foreach { r =>
      assert(r.getAs[Long]("total_groups") > 1, "fixture must span several row groups")
      assert(r.getAs[Long]("bloom_groups") === r.getAs[Long]("total_groups"))
    }
    plain.foreach { r =>
      assert(r.getAs[Long]("bloom_groups") === 0L)
      assert(r.getAs[Long]("pass_groups") === r.getAs[Long]("total_groups"),
        "without filters a point lookup reads every group")
    }
  }

  test("IO20: planted-absent keys skip nearly everything; present keys never vanish") {
    val bloom = rows.filter(_.getAs[String]("variant") == "bloom")
    val total = bloom.head.getAs[Long]("total_groups")
    val absent = bloom.filter(!_.getAs[Boolean]("present"))
    assert(absent.length === 8, "all negative probe keys must be absent from lineitem")
    // fpp is 0.01 by default; allow a generous 20% residue per key
    absent.foreach(r => assert(r.getAs[Long]("pass_groups") <= total / 5,
      s"absent key ${r.getAs[Long]("key")} passes too many groups"))
    val present = bloom.filter(_.getAs[Boolean]("present"))
    assert(present.length === 8, "probe keys 1..8 must exist in lineitem")
    present.foreach(r => assert(r.getAs[Long]("pass_groups") >= 1L,
      "a present key can never be bloom-rejected everywhere (no false negatives)"))
    // discrimination: present keys pass strictly more than absent ones
    val minPresent = present.map(_.getAs[Long]("pass_groups")).min
    val maxAbsent = absent.map(_.getAs[Long]("pass_groups")).max
    assert(minPresent > maxAbsent)
  }
}
