package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** E25 — incremental view maintenance law: the delta-assembled view
  * must equal the direct join exactly, and the delta terms must
  * partition it. */
class IvmSpec extends SparkSpec {

  test("E25: incremental assembly equals the direct join and deltas partition") {
    val direct = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"),
        col("c_mktsegment").as("segment"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val incr = Ivm.etlIvmJoin.fn(spark, sf)
    assert(incr.count() === direct.count())
    assert(incr.exceptAll(direct).isEmpty && direct.exceptAll(incr).isEmpty,
      "incremental view diverges from the direct join")
    // the four assembly terms are pairwise disjoint on the view key
    // (o_orderkey, c_custkey): each row has exactly one provenance
    val keys = incr.groupBy("o_orderkey", "c_custkey")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(keys === 0L, "a view row was produced by more than one term")
  }
}
