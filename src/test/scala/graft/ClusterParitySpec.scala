package graft

import org.scalatest.funsuite.AnyFunSuite

/** Multi-JVM regression gate: spawns [[ClusterCheck]] in its OWN JVM
  * (one SparkContext per JVM — the suite's shared local[4] session and
  * a local-cluster master cannot coexist in-process) and asserts that
  * a representative entry subset is bit-identical between local[] and
  * local-cluster[] execution AND that both executor-kill fault drills
  * pass (batch retry/FetchFailed recompute; exactly-once streaming
  * sink under executor loss).
  *
  * The subset spans the serialization-sensitive shapes: a multi-agg
  * groupBy, a join+top-k, a window, a hash dedup, a salted join, an
  * upsert merge, a native-expression entry (graft_cosine path), and a
  * text pipeline entry. The FULL 309-entry parity sweep is the
  * committed `bench/cluster_r9.json` artifact (run per round, not per
  * test invocation — it is a ~25 min job).
  */
class ClusterParitySpec extends AnyFunSuite {

  private val names = Seq(
    "q1_pricing_summary", // multi-agg groupBy
    "q3_shipping_priority", // join + agg + top-k
    "q_window_rank", // window function
    "dedup_exact", // hash groupBy dedup
    "q_salted_join", // skew-salted join equivalence
    "etl_upsert_merge", // keyed merge
    "dedup_embedding_cosine", // native graft expression over arrays
    "text_token_count", // text pipeline + regex
    "text_hybrid_rrf" // full-outer fusion of two retrieval legs
  )

  test("representative entries are bit-identical across executor JVMs; " +
      "executor kill mid-job and mid-stream leaves results exact") {
    val out = java.io.File.createTempFile("cluster_parity", ".json")
    out.deleteOnExit()
    val javaBin = sys.props("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin, "-Xmx6g", "-Dspark.ui.enabled=false") ++ addOpens ++
      Seq("-cp", sys.props("java.class.path"), "graft.ClusterCheck",
        "/root/testdata/sf0.001", out.getAbsolutePath,
        "--names", names.mkString(","),
        "--cluster", "2,2,1536",
        "--drill-rows", "60000000")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val done = p.waitFor(12, java.util.concurrent.TimeUnit.MINUTES)
    if (!done) { p.destroyForcibly(); fail("ClusterCheck timed out:\n" + tail(log)) }
    val json = java.nio.file.Files.readString(out.toPath)
    assert(p.exitValue() == 0,
      s"ClusterCheck exited ${p.exitValue()}\n$json\n${tail(log)}")
    assert(json.contains(""""ok":true"""), json)
    assert(json.contains(s""""n_parity_pass":${names.size}"""), json)
    assert(json.contains(""""killed_mid_job":true"""), json)
    assert(json.contains(""""killed_mid_stream":true"""), json)
  }

  private def tail(s: String): String =
    s.linesIterator.toSeq.takeRight(40).mkString("\n")
}
