package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The end-to-end DEPLOYMENT REHEARSAL (r10 verdict item 6): the
  * composition E44 → E14 → IO14/IO23 → S18 → S30 run as one chain in
  * child JVMs, with a hard crash (halt = driver-side SIGKILL, no
  * shutdown hooks) inside the second sink batch's commit window, then
  * a replay, then a second replay. Exactness is asserted against the
  * in-suite recomputation of the same E44 spec:
  *
  *   1. crash run: the published snapshot must already be complete
  *      and readable (commit-before-stream), the sink must hold an
  *      uncorrupted PREFIX of the batches, the E14 observation row
  *      must match the suite's own count/crc;
  *   2. replay run: the crashed batch is re-delivered (offsets were
  *      never committed) and its append is a no-op; the sink ends
  *      EXACTLY equal to the published snapshot — no dupes, no
  *      losses; S30 metrics recorded the replayed batches;
  *   3. second replay: nothing new to process — byte-identical final
  *      state (the idempotence fixed point).
  */
class DeploymentRehearsalSpec extends AnyFunSuite {

  private val spark = graft.SparkSpec.session

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
  }

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def runChild(root: String, mode: String): (Int, String) = {
    val javaBin = sys.props("java.home") + "/bin/java"
    val cmd = Seq(javaBin, "-Xmx3g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC") ++ addOpens ++
      Seq("-cp", sys.props("java.class.path"),
        "graft.etl.DeploymentRehearsalChild", root, mode)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val outS = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor(5, java.util.concurrent.TimeUnit.MINUTES),
      s"child ($mode) hung:\n${outS.takeRight(800)}")
    (p.exitValue(), outS)
  }

  test("crash mid-stream, replay, replay again: published snapshot " +
      "complete at every step, sink converges to the exact table, " +
      "third run is a fixed point") {
    val root = "/tmp/graft_rehearsal_" + ProcessHandle.current().pid()
    rm(new java.io.File(root))
    try {
      // the suite's own rendering of the same E44 spec = ground truth
      val expected = PipelineConfig.runJson(spark,
        DeploymentRehearsalChild.specJson).cache()
      val expN = expected.count()
      val expCrc = expected.agg(sum(crc32(concat_ws("|",
        expected.columns.map(col): _*)))).head.getLong(0)

      // ---- run 1: hard crash inside sink batch 1's commit window
      val (code1, _) = runChild(root, "crash")
      assert(code1 === 137, s"crash run must die by halt(137), got $code1")
      // the snapshot commit happened-before the stream: table complete
      val published = Snapshots.read(spark, root + "/table")
      assert(published.count() === expN)
      assert(published.exceptAll(expected).count() === 0 &&
        expected.exceptAll(published).count() === 0,
        "published snapshot must equal the spec's plan output")
      // E14 observation row matches the suite's own count/crc
      val obs = spark.read.parquet(s"$root/out/observe").head
      assert(obs.getAs[Long]("rows") === expN)
      assert(obs.getAs[Long]("crc") === expCrc)
      // sink after the crash: an uncorrupted, incomplete prefix —
      // batches {0, 1} committed (halt fired after batch 1's append),
      // and every sink row is a published row (nothing torn/invented)
      val txns1 = graft.streaming.ExactlyOnceSink.committed(root + "/sink")
      assert(txns1.sorted === Seq("batch-0", "batch-1"),
        s"crash point fixes the committed prefix, got $txns1")
      val sink1 = graft.streaming.ExactlyOnceSink.read(spark, root + "/sink")
      assert(sink1.exceptAll(published).count() === 0,
        "post-crash sink holds only published rows")
      assert(sink1.count() < expN, "crash must leave the sink incomplete")

      // ---- run 2: replay — batch 1 re-delivered, append is a no-op
      val (code2, out2) = runChild(root, "run")
      assert(code2 === 0, s"replay failed:\n${out2.takeRight(800)}")
      assert(out2.linesIterator.exists(_.trim == s"DONE $expN"),
        s"replay verdict missing:\n${out2.takeRight(400)}")
      val sink2 = graft.streaming.ExactlyOnceSink.read(spark, root + "/sink")
      assert(sink2.count() === expN, "no losses")
      assert(sink2.distinct().count() === expected.distinct().count() &&
        sink2.exceptAll(published).count() === 0 &&
        published.exceptAll(sink2).count() === 0,
        "no dupes: sink == published snapshot exactly")
      assert(graft.streaming.ExactlyOnceSink.committed(root + "/sink")
        .sorted === Seq("batch-0", "batch-1", "batch-2", "batch-3"))
      // exactly ONE published version: the replay did not double-commit
      assert(Snapshots.readManifest(root + "/table")._2.length === 1)
      // S30 observability: the replay's metrics recorded real batches
      val metrics = spark.read.parquet(s"$root/out/metrics")
      assert(metrics.count() >= 1)
      assert(metrics.agg(sum("input_rows")).head.getLong(0) >= 1,
        "replayed micro-batches must carry input rows")

      // ---- run 3: the fixed point — nothing new, nothing changed
      val (code3, out3) = runChild(root, "run")
      assert(code3 === 0)
      assert(out3.linesIterator.exists(_.trim == s"DONE $expN"))
      assert(graft.streaming.ExactlyOnceSink.committed(root + "/sink")
        .sorted === Seq("batch-0", "batch-1", "batch-2", "batch-3"))
      assert(graft.streaming.ExactlyOnceSink.read(spark, root + "/sink")
        .count() === expN)
      assert(Snapshots.readManifest(root + "/table")._2.length === 1)
      expected.unpersist()
    } finally rm(new java.io.File(root))
  }
}
