package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The end-to-end DEPLOYMENT REHEARSAL (r10 verdict item 6, JDBC leg
  * r11 verdict item 4): the composition E44 → E14 → IO14/IO23 → S18 →
  * E5b/E8c → S30 run as one chain in child JVMs, with hard crashes
  * (halt = driver-side SIGKILL, no shutdown hooks) inside BOTH sinks'
  * worst-case commit windows, then replays. Exactness is asserted
  * against the in-suite recomputation of the same E44 spec:
  *
  *   1. crash run: halt inside the second FILE batch's commit window.
  *      The published snapshot must already be complete and readable
  *      (commit-before-stream), the sink must hold an uncorrupted
  *      PREFIX of the batches, the E14 observation row must match the
  *      suite's own count/crc;
  *   2. crashjdbc run: the file leg replays to completion, then halt
  *      fires inside the second JDBC batch's window — AFTER the Derby
  *      transaction committed, BEFORE the offset commit. The table
  *      must hold a key-clean strict subset of the published rows;
  *   3. replay run: both crashed batches are re-delivered (offsets
  *      were never committed); the file append is a no-op and the
  *      JDBC upsert is key-idempotent; BOTH sinks end EXACTLY equal
  *      to the published snapshot — no dupes, no losses; S30 metrics
  *      recorded the replayed batches;
  *   4. second replay: nothing new to process — byte-identical final
  *      state in both sinks (the idempotence fixed point).
  */
class DeploymentRehearsalSpec extends AnyFunSuite {

  private val spark = graft.SparkSpec.session

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
  }

  /** Read the rehearsal's Derby table aligned to the published
    * snapshot's column order/types, materialize, then SHUT THE
    * EMBEDDED ENGINE DOWN — Derby is single-JVM, so a suite that kept
    * the database booted would block the next child run. */
  private def jdbcRows(root: String,
      published: org.apache.spark.sql.DataFrame): Seq[String] = {
    val url = s"jdbc:derby:$root/derbydb"
    val aligned = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "rehearsal_zip").load()
      // Derby uppercases unquoted identifiers; Spark resolves columns
      // case-insensitively, so selecting by the published names aligns
      .select(published.schema.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
    val rows = aligned.collect().map(_.toString).toSeq.sorted
    try java.sql.DriverManager.getConnection(s"$url;shutdown=true")
    catch { case _: java.sql.SQLException => () } // 08006 = clean shutdown
    rows
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

      // ---- run 2: JDBC crash — the file leg replays to completion,
      // then halt fires after the second Derby COMMIT but before the
      // offset commit (the window where replay re-delivers persisted
      // rows and only key-idempotence prevents duplication)
      val (code1b, _) = runChild(root, "crashjdbc")
      assert(code1b === 137, s"crashjdbc run must die by halt(137), got $code1b")
      // the file sink completed during this run
      assert(graft.streaming.ExactlyOnceSink.committed(root + "/sink")
        .sorted === Seq("batch-0", "batch-1", "batch-2", "batch-3"))
      val pubRows = published.collect().map(_.toString).toSeq.sorted
      val jdbc1 = jdbcRows(root, published)
      assert(jdbc1.nonEmpty && jdbc1.size < expN,
        s"jdbc crash must leave the table a strict prefix, got ${jdbc1.size}")
      assert(jdbc1.toSet.subsetOf(pubRows.toSet),
        "post-crash Derby table holds only published rows (no torn keys)")

      // ---- run 3: replay — both crashed batches re-delivered; the
      // file append is a no-op, the JDBC upsert lands on existing keys
      val (code2, out2) = runChild(root, "run")
      assert(code2 === 0, s"replay failed:\n${out2.takeRight(800)}")
      assert(out2.linesIterator.exists(_.trim == s"DONE $expN"),
        s"replay verdict missing:\n${out2.takeRight(400)}")
      assert(out2.linesIterator.exists(_.trim == s"JDBCROWS $expN"),
        s"jdbc replay verdict missing:\n${out2.takeRight(400)}")
      assert(jdbcRows(root, published) === pubRows,
        "after replay the Derby table equals the published snapshot " +
          "exactly (key-idempotent upsert: no dupes, no losses)")
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

      // ---- run 4: the fixed point — nothing new, nothing changed
      val (code3, out3) = runChild(root, "run")
      assert(code3 === 0)
      assert(out3.linesIterator.exists(_.trim == s"DONE $expN"))
      assert(out3.linesIterator.exists(_.trim == s"JDBCROWS $expN"))
      assert(graft.streaming.ExactlyOnceSink.committed(root + "/sink")
        .sorted === Seq("batch-0", "batch-1", "batch-2", "batch-3"))
      assert(graft.streaming.ExactlyOnceSink.read(spark, root + "/sink")
        .count() === expN)
      assert(Snapshots.readManifest(root + "/table")._2.length === 1)
      assert(jdbcRows(root, published) === pubRows,
        "the fixed point holds in the JDBC sink too")
      expected.unpersist()
    } finally rm(new java.io.File(root))
  }
}
