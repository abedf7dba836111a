package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E42 — masking-policy laws: per-kind semantics, pass-through
  * fidelity, and the loud failure on a bad policy. */
class MaskingSpec extends SparkSpec {

  private lazy val src = graft.Tables.customer(spark, sf)
  private lazy val masked = Masking.applyPolicy(src, Map(
    "c_name" -> "last4", "c_acctbal" -> "nullify",
    "c_mktsegment" -> "hash8")).cache()

  test("E42: last4 preserves length and tail, hides the rest") {
    val j = masked.select(col("c_custkey"), col("c_name").as("m"))
      .join(src.select(col("c_custkey"), col("c_name").as("o")), "c_custkey")
      .collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val (m, o) = (r.getAs[String]("m"), r.getAs[String]("o"))
      assert(m.length === o.length)
      assert(m.takeRight(4) === o.takeRight(4))
      assert(m.dropRight(4).forall(_ === '*'))
    }
  }

  test("E42: nullify keeps the typed column, hash8 tokenizes deterministically") {
    assert(masked.filter(col("c_acctbal").isNotNull).count() === 0)
    assert(masked.schema("c_acctbal").dataType ===
      org.apache.spark.sql.types.DoubleType)
    val toks = masked.select("c_mktsegment").distinct().collect()
      .map(_.getString(0))
    assert(toks.forall(t => t.length === 8 && t.matches("[0-9a-f]+")))
    // same source value → same token (group-bys keep working): token
    // cardinality equals source segment cardinality
    assert(toks.length === src.select("c_mktsegment").distinct().count())
  }

  test("E42: unlisted columns pass through bit-identically; bad policies fail loudly") {
    assert(masked.select("c_custkey", "c_nationkey").exceptAll(
      src.select("c_custkey", "c_nationkey")).count() === 0)
    intercept[IllegalArgumentException] {
      Masking.applyPolicy(src, Map("c_name" -> "rot13"))
    }
    intercept[IllegalArgumentException] {
      Masking.applyPolicy(src, Map("no_such_column" -> "nullify"))
    }
  }
}
