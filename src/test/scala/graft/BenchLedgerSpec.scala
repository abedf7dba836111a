package graft

import org.scalatest.funsuite.AnyFunSuite

/** The perf ledger's fast gates: the committed `ledger/bench_times.tsv`
  * stays well-formed and in sync with the entry set, and the mover
  * math is exactly the contract the main enforces. The MEASUREMENT is
  * `runMain graft.BenchLedger` (a 3-JVM randomized sweep — a per-round
  * main, not test-suite material); this spec makes sure the committed
  * artifact and the comparison mechanism can be trusted between runs. */
class BenchLedgerSpec extends AnyFunSuite {

  private lazy val ledger = BenchLedger.read(BenchLedger.File)

  test("perf ledger exists, parses, and covers exactly the entry set") {
    assert(ledger.nonEmpty, s"${BenchLedger.File} missing — run " +
      "GRAFT_UPDATE_LEDGER=1 sbt 'runMain graft.BenchLedger' and commit it")
    val entries = SparkEntry.queries.keySet
    assert(ledger.keySet === entries,
      "entry set drifted: only-in-ledger=" +
        s"${(ledger.keySet -- entries).toSeq.sorted}, " +
        s"only-current=${(entries -- ledger.keySet).toSeq.sorted} — " +
        "regen the perf ledger (GRAFT_UPDATE_LEDGER=1 runMain graft.BenchLedger)")
  }

  test("ledger times are sane: positive, sub-minute per entry at sf0.1") {
    ledger.foreach { case (n, t) =>
      assert(t > 0.0 && t < 60.0, s"$n: $t s is outside the sane band")
    }
  }

  test("mover predicate: both the ratio AND the absolute band must trip") {
    // tiny entry, big ratio, small absolute delta: NOT a mover
    assert(!BenchLedger.isMover(stored = 0.1, now = 0.35))
    // big entry, big absolute delta, small ratio: NOT a mover
    assert(!BenchLedger.isMover(stored = 10.0, now = 12.0))
    // both gates trip: mover
    assert(BenchLedger.isMover(stored = 1.0, now = 1.5))
    // boundary: exactly 1.3x is not a mover (strict >)
    assert(!BenchLedger.isMover(stored = 1.0, now = 1.3))
    // improvements never count as regressions
    assert(!BenchLedger.isMover(stored = 5.0, now = 1.0))
  }

  test("median: odd picks the middle, even averages, single passes through") {
    assert(BenchLedger.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(BenchLedger.median(Seq(4.0, 1.0, 2.0, 3.0)) === 2.5)
    assert(BenchLedger.median(Seq(7.0)) === 7.0)
    // one poisoned sweep cannot move the median of three
    assert(BenchLedger.median(Seq(1.0, 1.1, 30.0)) === 1.1)
  }

  test("compare splits slower (failures) from faster (informational)") {
    val stored = Map("a" -> 1.0, "b" -> 2.0, "c" -> 0.1, "gone" -> 1.0)
    val now = Map("a" -> 1.6, "b" -> 1.0, "c" -> 0.2, "new" -> 1.0)
    val (slower, faster) = BenchLedger.compare(stored, now)
    assert(slower.size === 1 && slower.head.startsWith("a:"))
    assert(faster.size === 1 && faster.head.startsWith("b:"))
  }

  test("write/read round-trips to 3-decimal precision") {
    val f = java.nio.file.Files.createTempFile("graft_bl", ".tsv").toString
    val m = Map("x" -> 1.23456, "y" -> 0.001)
    BenchLedger.write(f, m)
    val back = BenchLedger.read(f)
    assert(back("x") === 1.235 && back("y") === 0.001)
  }
}
