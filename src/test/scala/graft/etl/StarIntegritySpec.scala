package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** E48 — whole-star referential audit: clean star reads zero orphans
  * on every edge; planted damage is found with exact counts. */
class StarIntegritySpec extends SparkSpec {

  test("the clean star audits to zero orphans on all seven edges") {
    val rows = Quality.starIntegrity.fn(spark, sf).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphans") == 0L, r.getAs[String]("edge"))
      assert(r.getAs[Long]("n_orphan_keys") == 0L, r.getAs[String]("edge"))
      assert(r.getAs[Long]("n_children") > 0L, r.getAs[String]("edge"))
    }
  }

  test("planted damage is found with exact per-edge counts") {
    val dir = java.nio.file.Files.createTempDirectory("star").toString
    // copy the star, then break two edges deterministically
    Seq("region", "nation", "part", "supplier").foreach { t =>
      graft.Tables.load(spark, sf, t).write.parquet(s"$dir/$t.parquet")
    }
    // drop one customer that provably HAS orders; its orders orphan
    val c = Tables.customer(spark, sf)
    val victim = Tables.orders(spark, sf)
      .agg(min("o_custkey")).collect()(0).getLong(0)
    c.filter(col("c_custkey") =!= victim).write.parquet(s"$dir/customer.parquet")
    val o = Tables.orders(spark, sf)
    o.write.parquet(s"$dir/orders.parquet")
    // point 5 lineitems at a nonexistent order key
    val li = Tables.lineitem(spark, sf)
    val victims = li.select("l_orderkey").distinct().orderBy("l_orderkey")
      .limit(1).collect()(0).getLong(0)
    li.withColumn("l_orderkey",
      when(col("l_orderkey") === victims, lit(999999999L))
        .otherwise(col("l_orderkey")))
      .write.parquet(s"$dir/lineitem.parquet")

    val rows = Quality.starIntegrity.fn(spark, dir).collect()
      .map(r => r.getAs[String]("edge") ->
        (r.getAs[Long]("n_orphans"), r.getAs[Long]("n_orphan_keys"))).toMap
    val expectedOrderOrphans = o.filter(col("o_custkey") === victim).count()
    assert(rows("orders->customer") == ((expectedOrderOrphans, 1L)))
    val expectedLiOrphans = li.filter(col("l_orderkey") === victims).count()
    assert(rows("lineitem->orders") == ((expectedLiOrphans, 1L)))
    // untouched edges stay clean
    assert(rows("nation->region")._1 == 0L)
    assert(rows("supplier->nation")._1 == 0L)
  }
}
