package graft

/** Benchmark main. Phase 1 warms EVERY query once (per-query warm-up
  * alone leaves the first queries of a sweep paying global JIT/C2
  * compilation, which swung sweep totals by up to 60%); phase 2 times
  * each query into the `noop` sink — a real end-to-end materialization
  * of every output row that Catalyst cannot optimize away (a bare
  * .count() lets the optimizer drop unreferenced projections,
  * under-measuring compute-heavy queries). The Spark DataFrame cache is
  * cleared before each timed run so the timing covers the full compute,
  * not a warm cache hit.
  *
  * Noise-proofing (BENCH_r04 shipped 4× phantom regressions — one
  * GC pause or C2 recompilation poisoned BOTH back-to-back reps of a
  * query inside a 65-query sweep): each query's number is the min of
  * THREE timed reps split across TWO interleaved sweep passes — two
  * reps in the first pass, one more in a second full pass that runs
  * minutes later, when any transient event from the first pass is
  * over. Failures are propagated into the JSON (`"errors"`) instead of
  * being swallowed as fake timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // bench contract is local[32] unless the driver overrides
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    // r14: no svBaselines gate — the bench times every declared query
    // body exactly as verify and the oracle gate execute it

    def runOnce(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // optional args: bench only the named queries (dev loop)
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    def guarded(name: String)(body: => Unit): Unit =
      try body catch {
        case e: Throwable =>
          // strip EVERYTHING outside printable ASCII — any control char
          // would corrupt the driver's json.load of the bench line
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[^\\x20-\\x7e]", " ")
            .replaceAll("[\"\\\\]", " ").take(200)
      }
    // phase 1: global warm-up
    names.foreach(name => guarded(name)(runOnce(name)))
    spark.sqlContext.clearCache()
    // phase 2: timed — two interleaved sweep passes (2 reps, then 1
    // more a full sweep later); min across all three reps
    for (repsThisPass <- Seq(2, 1)) {
      names.filterNot(errors.contains).foreach { name =>
        guarded(name) {
          val ts = (1 to repsThisPass).map { _ =>
            spark.sqlContext.clearCache()
            val t0 = System.nanoTime()
            runOnce(name)
            (System.nanoTime() - t0) / 1e9
          }
          spark.sqlContext.clearCache()
          val t = ts.min
          timings(name) = timings.get(name).fold(t)(math.min(t, _))
        }
      }
    }
    val qs = timings.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val total = timings.values.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}"""
    // the driver's committed artifact truncates long lines; when
    // SPARK_GRAFT_BENCH_OUT is set, keep the FULL per-query record as a
    // repo file so round-over-round drift analysis never needs /tmp
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      val w = new java.io.PrintWriter(p); try w.println(line) finally w.close()
    }
    // The driver captures a FIXED-SIZE ~2000-char stdout tail and has
    // never parsed a bench line (BENCH_r01..r13 "parsed: null"): the
    // full per-query line outgrew the tail at ~300 entries, and the
    // r09 compact line arrived wrapped in sbt's "[info] " prefix with a
    // "[success]" line after it. Fix (r14): build.sbt now forwards the
    // forked JVM's stdout verbatim (outputStrategy := StdoutOutput) and
    // suppresses the "[success]" line (showSuccess := false), and the
    // LAST stdout line — printed after spark.stop() so no late log can
    // trail it — is a compact record sized to a conservative 1850-byte
    // budget: same metric contract, ms-rounded timings, the TPC-H
    // q<N>_* family always included, then the slowest remaining entries
    // while they fit. The full-precision 312-entry record is the line
    // right above it and in the committed bench/ file.
    def fmt(v: Double) = f"$v%.3f"
    val esC = errors.map { case (k, v) => s""""$k":"${v.take(60)}"""" }
      .mkString("{", ",", "}")
    val prefix =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":{"""
    val suffix =
      s"""},"errors":$esC,"n":${timings.size},"n_errors":${errors.size},"sf":"$sfDir"}"""
    var budget = 1850 - prefix.length - suffix.length
    val ordered = timings.toSeq.sortBy { case (k, v) =>
      (if (k.matches("q\\d+_.*")) 0 else 1, -v)
    }
    val kept = scala.collection.mutable.ArrayBuffer[String]()
    ordered.foreach { case (k, v) =>
      val piece = s""""$k":${fmt(v)}"""
      val cost = piece.length + (if (kept.nonEmpty) 1 else 0)
      if (cost <= budget) { kept += piece; budget -= cost }
    }
    val compact = prefix + kept.mkString(",") + suffix
    spark.stop()
    println(line)
    println(compact)
    if (errors.nonEmpty) sys.exit(1)
  }
}
