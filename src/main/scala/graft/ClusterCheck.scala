package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Multi-JVM execution sweep + fault drill — the one execution regime
  * a single local[n] JVM can never exercise.
  *
  * Everything graded so far ran inside one JVM: task results cross a
  * method call, broadcasts are a local reference, closures are never
  * serialized across a process boundary, and a "lost executor" cannot
  * happen. `local-cluster[W,C,M]` is Spark's standalone cluster with
  * in-driver Master/Workers but REAL executor JVMs: real closure
  * serialization, real Netty shuffle + broadcast transport, real
  * executor-loss recovery (task retry, FetchFailed stage resubmission,
  * executor relaunch by the worker). This main proves two properties:
  *
  *  1. PARITY — every `SparkEntry.queries` entry produces the
  *     bit-identical row multiset under local[n] and under
  *     local-cluster (sketch-estimate entries compare count+schema,
  *     the RowsRender.sketchValueExempt convention), by running both
  *     regimes sequentially in this one JVM and diffing digests.
  *  2. FAULT TOLERANCE — a batch aggregation and an exactly-once
  *     streaming sink each survive `kill -9` of an executor JVM
  *     mid-flight with unchanged results (the reference merely marks
  *     the run Error in its ledger on worker crash —
  *     Net7-ETL-Bus DataflowProcessor.cs:286-303; graft must instead
  *     RECOVER and complete with the same answer).
  *
  * Usage:
  *   runMain graft.ClusterCheck <sfDir> <outJson>
  *     [--names a,b,c] [--cluster W,C,M] [--drill-rows N] [--skip-drill]
  *
  * The committed artifact (`bench/cluster_r9.json`) is the full-entry
  * run at sf0.01 under local-cluster[4,8,4096]; ClusterParitySpec
  * spawns a small-subset run as the per-test-run regression gate.
  * Exit code 0 iff parity holds on every entry and both drills pass.
  */
object ClusterCheck {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = args(1)
    def opt(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val names = opt("--names").map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val cluster = opt("--cluster").getOrElse("4,8,4096")
    val drillRows = opt("--drill-rows").map(_.toLong).getOrElse(200000000L)
    val skipDrill = args.contains("--skip-drill")
    val Array(w, c, m) = cluster.split(",").map(_.trim)
    val cpus = (w.toInt * c.toInt).toString

    // ---- phase 1: baseline digests under a single-JVM local master
    val localS = Sessions.withMaster(s"local[$cpus]", cpus)
    localS.sparkContext.setLogLevel("WARN")
    // BOTH phases run the identical declared bodies (the r13
    // svBaselines gate is gone in r14), so digests compare like for
    // like by construction
    val baseline = scala.collection.mutable.LinkedHashMap[String, (Int, String)]()
    val baseErr = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { n =>
      try baseline(n) = digestFor(localS, sfDir, n)
      catch { case e: Throwable => baseErr(n) = msg(e) }
    }
    localS.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    // ---- phase 2: the same entries under separate executor JVMs
    val masterUrl = s"local-cluster[$w,$c,$m]"
    val spark = Sessions.withMaster(masterUrl, cpus)
    spark.sparkContext.setLogLevel("WARN")
    awaitExecutors(spark, w.toInt)
    val parityFail = scala.collection.mutable.LinkedHashMap[String, String]()
    val secs = scala.collection.mutable.LinkedHashMap[String, Double]()
    names.foreach { n =>
      baseErr.get(n) match {
        case Some(e) => parityFail(n) = s"baseline failed: $e"
        case None =>
          try {
            val t0 = System.nanoTime()
            val d = digestFor(spark, sfDir, n)
            secs(n) = (System.nanoTime() - t0) / 1e9
            if (d != baseline(n))
              parityFail(n) = s"local=${baseline(n)} cluster=$d"
          } catch { case e: Throwable => parityFail(n) = s"cluster run failed: ${msg(e)}" }
      }
    }

    // ---- phase 3: fault drills (executor JVMs killed mid-flight)
    // a drill crash must never discard the parity sweep's results
    def guardedDrill(run: => (Boolean, String)): (Boolean, String) =
      try run catch {
        case e: Throwable =>
          (false, s"""{"pass":false,"error":"${msg(e).replaceAll("[\"\\\\]", " ")}"}""")
      }
    val (drillOk, drill) =
      if (skipDrill) (true, """"skipped"""")
      else {
        val (bOk, b) = guardedDrill(batchDrill(spark, drillRows))
        val (sOk, s) = guardedDrill(streamDrill(spark))
        (bOk && sOk, s"""{"batch":${b},"stream":${s}}""")
      }

    val failJson = parityFail.map { case (k, v) =>
      // strip quotes/backslashes AND control chars (multi-line Spark
      // error messages would corrupt the JSON line)
      s""""$k":"${v.replaceAll("[^\\x20-\\x7e]", " ")
        .replaceAll("[\"\\\\]", " ").take(300)}"""" }
      .mkString("{", ",", "}")
    val secsJson = secs.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
      .mkString("{", ",", "}")
    val ok = parityFail.isEmpty && drillOk
    val json =
      s"""{"master":"$masterUrl","sf":"$sfDir","n_entries":${names.size},""" +
        s""""n_parity_pass":${names.size - parityFail.size},""" +
        s""""parity_fail":$failJson,"fault_drill":$drill,""" +
        s""""cluster_entry_secs":$secsJson,"ok":$ok}"""
    val wj = new java.io.PrintWriter(outJson)
    try wj.println(json) finally wj.close()
    println(s"CLUSTERCHECK ${if (ok) "PASS" else "FAIL"} " +
      s"parity=${names.size - parityFail.size}/${names.size} drill=$drill")
    spark.stop()
    if (!ok) sys.exit(1)
  }

  private def msg(e: Throwable): String =
    Option(e.getMessage).getOrElse(e.getClass.getName).take(300)

  private def digestFor(s: SparkSession, sfDir: String, name: String): (Int, String) = {
    val df = SparkEntry.queries(name)(s, sfDir)
    if (RowsRender.sketchValueExempt(name))
      (df.count().toInt, "schema:" + df.columns.sorted.mkString(","))
    else RowsRender.digest(df)
  }

  /** Block until the standalone master has registered all executors —
    * submitting before registration would run everything on whichever
    * executor arrives first and under-exercise the shuffle paths. */
  private def awaitExecutors(s: SparkSession, want: Int, timeoutS: Int = 60): Unit = {
    val deadline = System.nanoTime() + timeoutS * 1000000000L
    // getExecutorInfos includes the driver → want + 1
    while (s.sparkContext.statusTracker.getExecutorInfos.length < want + 1 &&
        System.nanoTime() < deadline)
      Thread.sleep(200)
    val got = s.sparkContext.statusTracker.getExecutorInfos.length - 1
    require(got >= want, s"only $got of $want executors registered in ${timeoutS}s")
  }

  /** Executor JVMs are direct children of this process (the in-driver
    * standalone Worker spawns them via ProcessBuilder). NOTE: the JDK's
    * ProcessHandle.Info.commandLine() silently truncates at 4096 chars
    * and the executor's -cp alone is ~28k, so the class name never
    * survives — read /proc/<pid>/cmdline directly (this harness is
    * Linux-only by contract). */
  private def executorHandles(): Seq[ProcessHandle] =
    ProcessHandle.current().descendants().iterator().asScala.filter { h =>
      val full =
        try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/${h.pid()}/cmdline")), "UTF-8")
        catch { case _: Throwable =>
          h.info().commandLine().orElse("")
        }
      full.contains("CoarseGrainedExecutorBackend")
    }.toSeq

  /** Wait until the scheduler reports an active stage, then SIGKILL one
    * executor JVM. Returns (pid, killed) — killed=false means the job
    * finished before a stage became visible (caller must treat the run
    * as NOT a drill). */
  private def killOneExecutorMidJob(s: SparkSession, timeoutS: Int = 120): (Long, Boolean) = {
    val deadline = System.nanoTime() + timeoutS * 1000000000L
    while (s.sparkContext.statusTracker.getActiveStageIds().isEmpty &&
        System.nanoTime() < deadline)
      Thread.sleep(50)
    if (s.sparkContext.statusTracker.getActiveStageIds().isEmpty) (-1L, false)
    else {
      // let some tasks actually run (shuffle files exist → the kill
      // also exercises FetchFailed recompute, not just task retry)
      Thread.sleep(500)
      val stillActive = s.sparkContext.statusTracker.getActiveStageIds().nonEmpty
      executorHandles().headOption match {
        case Some(h) if stillActive =>
          val pid = h.pid(); h.destroyForcibly(); (pid, true)
        case _ => (-1L, false)
      }
    }
  }

  /** Deterministic heavy two-stage aggregation: xxhash64 keys →
    * groupBy → global checksum. Result is a pure function of nRows, so
    * the no-kill and kill runs must agree exactly. The checksum is
    * MODULAR (key-sensitive but bounded): sid*n at the default 2e8
    * rows exceeds Long and ANSI mode would abort the job — exactly
    * the overflow that killed the first full-sweep run in main. */
  private def drillFrame(s: SparkSession, nRows: Long): DataFrame = {
    val M = 1000000007L
    s.range(0, nRows, 1, 96)
      .select(pmod(xxhash64(col("id")), lit(100000L)).as("k"), col("id"))
      .groupBy("k").agg(sum("id").as("sid"), count(lit(1)).as("n"))
      .agg(sum(pmod(pmod(col("sid"), lit(M)) * pmod(col("n"), lit(M)), lit(M)))
          .as("chk"),
        sum("n").as("total"), count(lit(1)).as("groups"))
  }

  private def batchDrill(s: SparkSession, nRows: Long): (Boolean, String) = {
    // a warmed uncontended sweep can finish the drill job before the
    // kill thread ever fires (attempt-3 full run: 2e8 rows done inside
    // the pre-kill sleep) — scale the job up until the kill genuinely
    // lands mid-flight, so "pass" always means "recovered", never
    // "finished before we could hurt it"
    var rows = nRows
    var attempt = 0
    var pid = -1L; var killed = false
    var result: Seq[Any] = null; var expect: Seq[Any] = null
    var err: String = null
    while (!killed && attempt < 4) {
      attempt += 1
      expect = drillFrame(s, rows).collect()(0).toSeq
      @volatile var r: Seq[Any] = null
      @volatile var e: String = null
      val t = new Thread(() => {
        try r = drillFrame(s, rows).collect()(0).toSeq
        catch { case ex: Throwable => e = msg(ex) }
      })
      t.start()
      val (p, k) = killOneExecutorMidJob(s)
      t.join(600000)
      pid = p; killed = k; result = r; err = e
      if (!killed) rows *= 4
    }
    val pass = killed && err == null && result == expect
    (pass,
      s"""{"pass":$pass,"killed_pid":$pid,"killed_mid_job":$killed,""" +
        s""""rows":$rows,"attempts":$attempt,""" +
        s""""match":${result == expect},"error":${if (err == null) "null" else s""""$err""""}}""")
  }

  /** Exactly-once streaming under executor loss: a file-source stream
    * drains 24 staged parquet files (2 per micro-batch) through the
    * S18 idempotent manifest sink; one executor is killed while
    * batches are in flight. The sink must hold EXACTLY the staged
    * row set afterwards — at-least-once replay × idempotent txn
    * append = exactly-once, executor loss included. */
  private def streamDrill(s: SparkSession): (Boolean, String) = {
    // Like batchDrill, the kill must PROVABLY land mid-stream: the
    // committed batch id is re-read right after the kill, and the drill
    // only counts as mid-stream when batches remained outstanding at
    // that moment (a kill that lands after the stream drained is a
    // no-kill pass). Retries with 4x the staged files until it does.
    var files = 24
    var out: (Boolean, String) = (false, "{}")
    var attempt = 0
    var mid = false
    while (!mid && attempt < 3) {
      attempt += 1
      out = streamDrillOnce(s, files, attempt)
      mid = out._2.contains(""""killed_mid_stream":true""")
      if (!mid) files *= 4
    }
    out
  }

  private def streamDrillOnce(
      s: SparkSession, files: Int, attempt: Int): (Boolean, String) = {
    val root = "/tmp/graft_cluster_drill_" + ProcessHandle.current().pid()
    val in = s"$root/in"; val sink = s"$root/sink"; val ckpt = s"$root/ckpt"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(root))
    val perFile = 50000L
    (0 until files).foreach { i =>
      s.range(i * perFile, (i + 1) * perFile).toDF("id")
        .coalesce(1).write.mode("overwrite").parquet(s"$in/f$i")
    }
    val stream = s.readStream.schema("id BIGINT")
      .option("maxFilesPerTrigger", "2").parquet(s"$in/f*")
      .repartition(8) // force a shuffle per micro-batch
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        graft.streaming.ExactlyOnceSink.appendOnce(df, sink, s"b$bid"); ()
      }
      .start()
    // kill an executor once at least one batch has committed and more
    // are pending — then VERIFY the stream had not already drained:
    // the committed batch id re-read after the kill must still be
    // below the final batch, or the kill landed on an idle executor
    // and the attempt does not count as mid-stream
    val lastBatch = files / 2 - 1 // maxFilesPerTrigger=2
    var pid = -1L; var killed = false
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (!killed && System.nanoTime() < deadline) {
      val done = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
      if (done >= 1) {
        executorHandles().headOption.foreach { h =>
          pid = h.pid(); h.destroyForcibly(); killed = true
        }
      }
      if (!killed) Thread.sleep(100)
    }
    val committedAtKill =
      Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
    val midStream = killed && committedAtKill < lastBatch
    var err: String = null
    try q.processAllAvailable()
    catch { case e: Throwable => err = msg(e) }
    // a foreachBatch task batch can abort if its executor dies at the
    // wrong moment AND retries were exhausted — the query would stop
    // with an error; exactly-once still requires a RESTART to converge
    if (err != null || q.exception.isDefined) {
      if (q.exception.isDefined && err == null) err = msg(q.exception.get)
      try q.stop() catch { case _: Throwable => () }
      val q2 = s.readStream.schema("id BIGINT")
        .option("maxFilesPerTrigger", "2").parquet(s"$in/f*")
        .repartition(8)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, bid: Long) =>
          graft.streaming.ExactlyOnceSink.appendOnce(df, sink, s"b$bid"); ()
        }.start()
      q2.processAllAvailable(); q2.stop()
    } else q.stop()
    val got = graft.streaming.ExactlyOnceSink.read(s, sink)
      .agg(count(lit(1)).as("n"), sum("id").as("s"),
        count_distinct(col("id")).as("d")).collect()(0)
    val n = files * perFile
    val wantSum = n * (n - 1) / 2
    val pass = midStream && got.getLong(0) == n &&
      got.getLong(1) == wantSum && got.getLong(2) == n
    rm(new java.io.File(root))
    (pass,
      s"""{"pass":$pass,"killed_pid":$pid,"killed_mid_stream":$midStream,""" +
        s""""committed_at_kill":$committedAtKill,"last_batch":$lastBatch,""" +
        s""""files":$files,"attempt":$attempt,""" +
        s""""rows":${got.getLong(0)},"expect_rows":$n,""" +
        s""""distinct":${got.getLong(2)},"sum_ok":${got.getLong(1) == wantSum},""" +
        s""""restart_needed":${err != null}}""")
  }
}
