package graft

import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing bisection for slow queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val docs = dedup.Dedup.withPlantedDups(Tables.documents(spark, sfDir))
    time("scan+count")(docs.count())
    val canon = docs.select(col("doc_id"), functions.Text.canonical(col("text")).as("c"))
    time("canonical")(canon.write.format("noop").mode("overwrite").save())
    val sh = docs.select(col("doc_id"), functions.Text.shingles(col("text"), 3).as("sh"))
    time("shingles")(sh.write.format("noop").mode("overwrite").save())
    val ex = docs.select(col("doc_id"), explode(functions.Text.shingles(col("text"), 3)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    time("explode+hash")(ex.write.format("noop").mode("overwrite").save())
    time("signatures")(dedup.Dedup.minhashSignatures(docs)
      .write.format("noop").mode("overwrite").save())
    time("candidates")(dedup.Dedup.minhashLshCandidates(docs)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
