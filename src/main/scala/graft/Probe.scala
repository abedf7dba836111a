package graft

import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing bisection for slow queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, sfDir)
    import functions.{Spread, Text}
    val withWs = Spread(docs, col("doc_id"))
      .withColumn("ws", Text.words(col("text")))
    for (r <- 1 to 2) {
      spark.sqlContext.clearCache()
      time(s"withWs scan r$r")(noop(withWs.select("doc_id", "ws")))
      time(s"vocab distinct r$r")(noop(withWs.select(explode(col("ws")).as("word"))
        .agg(countDistinct(col("word")).as("v"))))
      time(s"full lm_score r$r")(noop(
        functions.LmScore.score(docs, hashKeys = false)))
    }
    spark.stop()
  }
}
