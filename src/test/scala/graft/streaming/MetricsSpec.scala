package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** S30 — StreamingQueryListener flow metrics: exact row accounting,
  * monotone batch ids, stateful-operator visibility, watermark
  * progress — all captured with zero extra scans. */
class MetricsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("S30: listener captures exact per-batch rows, state size and watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val metrics = new Metrics()
    spark.streams.addListener(metrics)
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val agg = stream.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("s30_out")
      .outputMode("update").start()
    try {
      stream.addData((1L, ts("2026-01-01 10:05:00"), 1.0),
        (1L, ts("2026-01-01 10:10:00"), 2.0),
        (2L, ts("2026-01-01 10:20:00"), 3.0))
      q.processAllAvailable()
      stream.addData((2L, ts("2026-01-01 12:30:00"), 4.0),
        (1L, ts("2026-01-01 12:45:00"), 5.0))
      q.processAllAvailable()
      metrics.awaitBatches("s30_out", 2)
      val rows = metrics.frame(spark)
        .filter(col("query") === "s30_out" && col("input_rows") > 0)
        .orderBy("batch_id").collect()
      assert(rows.length == 2)
      // exact flow accounting: 3 rows then 2
      assert(rows.map(_.getAs[Long]("input_rows")).toSeq == Seq(3L, 2L))
      // batch ids strictly increase
      assert(rows(0).getAs[Long]("batch_id") < rows(1).getAs[Long]("batch_id"))
      // the stateful agg reports its state rows: 2 open windows after
      // batch 1, and the second batch's windows add 2 more keys
      assert(rows(0).getAs[Long]("state_rows") >= 2L)
      assert(rows(1).getAs[Long]("state_rows") >= rows(0).getAs[Long]("state_rows"))
      // batch N's progress reports the watermark it RAN under, i.e.
      // max event time of batch N-1 minus the 1h delay: 10:20 - 1h
      assert(rows(1).getAs[String]("watermark") == "2026-01-01T09:20:00.000Z")
    } finally {
      q.stop()
      spark.streams.removeListener(metrics)
    }
  }
}
