package graft

/** Dev tool: print the formatted physical plan for one or all queries.
  * Usage: runMain graft.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val targets =
      if (name.nonEmpty)
        // comma-separated names: one JVM for a whole dump batch
        name.split(',').toSeq.map(n => n -> SparkEntry.queries(n))
      else SparkEntry.queries.toSeq.sortBy(_._1)
    targets.foreach { case (n, fn) =>
      println(s"\n===== $n =====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
