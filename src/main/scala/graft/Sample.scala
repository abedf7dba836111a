package graft

import org.apache.spark.sql.functions._

/** Usage sample for the library APIs that are not coverage-map queries:
  * salted joins, bucketed co-located tables, multimodal resize/frame
  * sampling. Run: `sbt "runMain graft.Sample [sfDir]"`. */
object Sample {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")

    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    println(s"[sample] salted join rows: " +
      operators.Skew.saltedJoin(orders, cust, "o_custkey").count())

    spark.sql("DROP TABLE IF EXISTS sample_orders")
    // the in-memory catalog forgets tables across sessions but their
    // warehouse directories persist; clear the location too
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File("/tmp/graft_warehouse/sample_orders"))
    etl.Sink.writeBucketed(orders, "sample_orders", "o_orderkey", 4)
    println(s"[sample] bucketed table rows: " +
      spark.table("sample_orders").count())

    val assets = multimodal.Multimodal.syntheticAssets(Tables.documents(spark, sf))
    println(s"[sample] resized 32x32 assets: " +
      multimodal.Multimodal.resizeStub(assets, 32, 32)
        .filter(length(col("content")) === 32 * 32).count())
    println(s"[sample] sampled video frames: " +
      multimodal.Multimodal.sampleFrames(assets, stride = 10).count())

    spark.stop()
  }
}
