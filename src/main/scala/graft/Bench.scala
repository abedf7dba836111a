package graft

/** Benchmark main. Per query: one warm-up execution (JIT + codegen
  * cache + file-listing caches), then one timed execution into the
  * `noop` sink — a real end-to-end materialization of every output row
  * that Catalyst cannot optimize away (a bare .count() lets the
  * optimizer drop unreferenced projections, under-measuring
  * compute-heavy queries). Failures are propagated into the JSON
  * (`"errors"`) instead of being swallowed as fake timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // bench contract is local[32] unless the driver overrides
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // optional args: bench only the named queries (dev loop)
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    names.foreach { name =>
      try {
        runOnce(name) // warm-up (JIT + codegen + file listing)
        // min of two timed runs — damps machine noise without hiding
        // real plan cost. Caches registered inside operators (LSH
        // banded tables, the pipeline's dedup subtree) are cleared
        // before each timed run so the timing covers the FULL compute,
        // not a warm cache hit.
        val ts = (1 to 2).map { _ =>
          spark.sqlContext.clearCache()
          val t0 = System.nanoTime()
          runOnce(name)
          (System.nanoTime() - t0) / 1e9
        }
        spark.sqlContext.clearCache()
        timings(name) = ts.min
      } catch {
        case e: Throwable =>
          // strip EVERYTHING outside printable ASCII — any control char
          // would corrupt the driver's json.load of the bench line
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[^\\x20-\\x7e]", " ")
            .replaceAll("[\"\\\\]", " ").take(200)
      }
    }
    val qs = timings.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val total = timings.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
