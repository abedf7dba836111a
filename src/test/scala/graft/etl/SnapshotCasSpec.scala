package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** IO23 cross-PROCESS scope: two separate JVMs race `commitIf` against
  * the same table root with the same base; the OS file lock must
  * serialize the check-and-swap so exactly one wins and the loser
  * refuses loudly (no lost update, no torn manifest). Runs in spawned
  * JVMs because the property under test IS cross-process — an in-JVM
  * test only exercises the `synchronized` path. */
class SnapshotCasSpec extends AnyFunSuite {

  test("two processes racing commitIf on one table: exactly one wins, " +
      "the loser refuses, the manifest holds exactly the winner's commit") {
    val root = "/tmp/graft_cas_race_" + ProcessHandle.current().pid()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(root))
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
    def child(tag: String): Process = {
      val cmd = Seq(javaBin, "-Xmx2g", "-Dspark.ui.enabled=false") ++
        addOpens ++ Seq("-cp", sys.props("java.class.path"),
          "graft.etl.SnapshotRaceChild", root, "4000", tag)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.start()
    }
    try {
      // both children read base=None before either commits: the 4s
      // hold INSIDE the locked section guarantees overlap even with
      // skewed JVM startup times
      val (a, b) = (child("a"), child("b"))
      val outA = new String(a.getInputStream.readAllBytes(), "UTF-8")
      val outB = new String(b.getInputStream.readAllBytes(), "UTF-8")
      assert(a.waitFor(3, java.util.concurrent.TimeUnit.MINUTES))
      assert(b.waitFor(3, java.util.concurrent.TimeUnit.MINUTES))
      def verdict(s: String): String =
        s.linesIterator.toSeq.reverseIterator
          .collectFirst { case l if l.startsWith("WIN") || l == "LOSE" => l }
          .getOrElse(fail(s"child printed no verdict:\n${s.takeRight(800)}"))
      val vs = Seq(verdict(outA), verdict(outB))
      assert(vs.count(_.startsWith("WIN")) === 1,
        s"exactly one child must win the CAS, got: $vs")
      assert(vs.count(_ == "LOSE") === 1, s"got: $vs")
      // the table holds exactly the winner's single commit
      val winnerTag = if (verdict(outA).startsWith("WIN")) "a" else "b"
      val rows = Snapshots.read(graft.SparkSpec.session, root).collect()
      assert(rows.length === 1)
      assert(rows(0).getString(0) === winnerTag)
      assert(Snapshots.readManifest(root)._2.length === 1,
        "exactly one committed version (the loser wrote NOTHING)")
    } finally rm(new java.io.File(root))
  }
}
