package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** E32 — late-arriving dimensions: placeholder coverage, the
  * upgrade-on-arrival merge, and replay safety. */
class LateDimSpec extends SparkSpec {

  test("E32: placeholders cover exactly the missing fact keys; none dangle") {
    val facts = Tables.orders(spark, sf)
      .select(col("o_custkey").as("c_custkey"))
    val dim = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 7 =!= 0).select("c_custkey", "c_name")
    val inferred = LateDim.inferredMembers(facts, dim, "c_custkey")
    val expectMissing = facts.distinct()
      .filter(col("c_custkey") % 7 === 0).count()
    assert(inferred.count() === expectMissing && expectMissing > 0)
    // with placeholders appended, every fact key joins
    val full = LateDim.withInferred(facts, dim, "c_custkey")
    assert(facts.join(full, Seq("c_custkey"), "left_anti").count() === 0)
  }

  test("E32: the arrival upgrade removes every placeholder and is replay-safe") {
    val facts = Tables.orders(spark, sf)
      .select(col("o_custkey").as("c_custkey"))
    val all = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val dim = all.filter(col("c_custkey") % 7 =!= 0)
    val current = LateDim.withInferred(facts, dim, "c_custkey")
    val arrivals = all.filter(col("c_custkey") % 7 === 0)
    val upgraded = LateDim.upgrade(current, arrivals, "c_custkey").cache()
    // every placeholder whose real row arrived upgraded in place
    assert(upgraded.filter(col("is_inferred") &&
      col("c_custkey") % 7 === 0).count() === 0)
    // upgraded rows carry the REAL name, not UNKNOWN
    val sample = upgraded.filter(col("c_custkey") % 7 === 0)
      .filter(col("c_name") === "UNKNOWN").count()
    assert(sample === 0)
    // member count conserved: one row per key, before and after
    assert(upgraded.count() === current.count())
    // replaying the same arrivals changes nothing (key-idempotent)
    val again = LateDim.upgrade(upgraded, arrivals, "c_custkey")
    assert(again.exceptAll(upgraded).count() === 0)
    assert(upgraded.exceptAll(again).count() === 0)
    upgraded.unpersist()
  }
}
