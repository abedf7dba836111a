package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** E45 — field-level survivorship laws, replayed from the known truth
  * (the feed derives deterministically from customer, so every golden
  * field is predictable from the source row alone). */
class GoldenRecordSpec extends SparkSpec {

  private lazy val golden = GoldenRecord.etlGoldenRecord.fn(spark, sf).cache()

  private lazy val joined = golden
    .join(Tables.customer(spark, sf), golden("key") === col("c_custkey"))
    .collect()

  test("mode rule: the original name outvotes the single upcased version 2:1") {
    joined.foreach { r =>
      assert(r.getAs[String]("golden_name") == r.getAs[String]("c_name"))
      assert(r.getAs[Long]("name_votes") == 2L)
    }
  }

  test("most-frequent-non-null: segment survives v3's null; all-null keys stay null") {
    joined.foreach { r =>
      val key = r.getAs[Long]("key")
      val seg = r.getAs[String]("golden_segment")
      if (key % 7 == 0) assert(seg == null, s"key $key")
      else assert(seg == r.getAs[String]("c_mktsegment"), s"key $key")
    }
  }

  test("recency rule: latest NON-null balance — v2's when v3 is nulled, else v3's") {
    joined.foreach { r =>
      val key = r.getAs[Long]("key")
      val expect = r.getAs[Double]("c_acctbal") + (if (key % 4 == 0) 2 else 3)
      assert(r.getAs[Double]("golden_bal") == expect, s"key $key")
    }
  }

  test("longest rule: the v1 suffixed display wins") {
    joined.foreach { r =>
      val expect = s"${r.getAs[String]("c_name")} #${r.getAs[Long]("key")}"
      assert(r.getAs[String]("golden_display") == expect)
    }
  }

  test("one golden row per entity, all entities present") {
    assert(golden.count() == Tables.customer(spark, sf).count())
    assert(golden.select("key").distinct().count() == golden.count())
  }
}
