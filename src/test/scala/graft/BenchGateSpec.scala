package graft

import org.scalatest.funsuite.AnyFunSuite

/** The in-test PERF GATE (r10 verdict item 8): a perf regression on
  * the expensive slice of the entry surface fails `sbt test` the way
  * a plan regression already does, instead of waiting for the
  * per-round `runMain graft.BenchLedger`.
  *
  * Protocol — identical to the ledger main's, NOT an in-suite timing:
  * the suite JVM runs local[4] with every other suite's cache wake,
  * so it launches ONE isolated child JVM (same classpath and module
  * flags, local[32], sf0.1, seeded-random order, warm pass then timed
  * pass) over the gate slice and applies the committed ledger's
  * variance-aware dual-gate predicate to the child's measurements.
  *
  * Slice: entries with committed median ≥ [[BenchGateSpec.MinMedian]]
  * — the band where a real regression (the r10 etl_profile_table
  * 2.98→3.92 s class) is detectable above the measured ambient noise
  * floor — MINUS the mechanically-derived ambient-bimodal class (see
  * [[bimodal]]); sub-band and bimodal entries stay covered by the
  * per-round 3-sweep main. Measured on the committed r10/r11 raw
  * sweeps, a single fresh reading false-alarms on the stable slice at
  * 1.7% (docs/BENCH_LEDGER.md). Flagged entries get ONE confirming
  * re-measurement in a
  * second child JVM (min of the two readings) before failing — a
  * single GC pause or C2 recompile in the child must not fail the
  * build. Skip with GRAFT_SKIP_PERF_GATE=1 (e.g. when iterating on an
  * unrelated suite under constrained hardware).
  */
class BenchGateSpec extends AnyFunSuite {

  val MinMedian = 2.0
  private val SfDir = "/root/testdata/sf0.1"

  /** Entries whose committed RAW sweep history (bench/benchledger_
    * r*_sweep*.tsv) is measurably BIMODAL — max/min > 1.6× and
    * max−min > 0.5 s across all committed readings. Three sweeps can
    * land entirely in one mode, so the stored spread under-states
    * these entries' ambient band and no per-reading gate has power
    * over them; they are info-reported here and adjudicated by the
    * per-round 3-sweep median in `runMain graft.BenchLedger` instead.
    * Derived mechanically from the committed records, never
    * hand-pinned. */
  private def bimodal: Set[String] = {
    val sweeps = Option(new java.io.File("bench").listFiles()).get
      .filter(_.getName.matches("benchledger_r\\d+_sweep\\d+\\.tsv"))
    // only the LATEST two rounds of raw sweeps: a code change that
    // legitimately moved an entry between old rounds must not label
    // it bimodal forever
    def round(f: java.io.File): Int =
      "benchledger_r(\\d+)_".r.findFirstMatchIn(f.getName).get.group(1).toInt
    val keepRounds = sweeps.map(round).distinct.sorted.takeRight(2).toSet
    val readings = sweeps.filter(f => keepRounds(round(f)))
      .flatMap(f => BenchLedger.read(f.getPath).toSeq)
      .groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2) }
    readings.collect {
      case (n, xs) if xs.max / xs.min > 1.6 && xs.max - xs.min > 0.5 => n
    }.toSet
  }

  test(s"perf gate: every STABLE entry with committed median >= " +
      s"$MinMedian s re-measures inside its variance-aware band " +
      "(isolated JVM, sf0.1)") {
    assume(sys.env.get("GRAFT_SKIP_PERF_GATE").isEmpty,
      "GRAFT_SKIP_PERF_GATE=1 set")
    assume(new java.io.File(SfDir).isDirectory, s"$SfDir absent")
    val stored = BenchLedger.readFull(BenchLedger.File)
    assert(stored.nonEmpty, s"${BenchLedger.File} missing")
    val bim = bimodal
    val slice = stored.collect {
      case (n, e) if e.median >= MinMedian && !bim(n) &&
        SparkEntry.queries.contains(n) => n
    }.toSeq.sorted
    assert(slice.nonEmpty, "gate slice empty — MinMedian too high?")
    info(s"gate slice: ${slice.size} entries, committed total " +
      f"${slice.map(stored(_).median).sum}%.1f s; " +
      s"${bim.count(n => stored.get(n).exists(_.median >= MinMedian))} " +
      "bimodal entries excluded (3-sweep-median adjudicated instead)")

    val tmp = java.nio.file.Files.createTempDirectory("graft_benchgate")
    def sweep(seed: Int, names: Seq[String]): Map[String, Double] = {
      val out = s"$tmp/gate_$seed.tsv"
      BenchLedger.runSweep(seed, SfDir, out, Some(names.mkString(",")))
      BenchLedger.read(out)
    }
    val now = sweep(seed = 11, slice)
    val missing = slice.filterNot(now.contains)
    assert(missing.isEmpty, s"gate sweep failed to measure: $missing")
    val flagged = slice.filter(n => BenchLedger.isMover(stored(n), now(n)))
    val confirmed =
      if (flagged.isEmpty) Seq.empty
      else {
        info(s"flagged on first measurement, confirming: $flagged")
        val again = sweep(seed = 12, flagged)
        flagged.filter { n =>
          val best = math.min(now(n), again.getOrElse(n, now(n)))
          BenchLedger.isMover(stored(n), best)
        }
      }
    assert(confirmed.isEmpty,
      "PERF REGRESSION (confirmed in two isolated JVMs): " +
        confirmed.map(n => f"$n: ${stored(n).median}%.2fs " +
          f"(spread ${stored(n).spread}%.2fs) -> ${now(n)}%.2fs").mkString("; ") +
        " — if intended, regen the ledger " +
        "(GRAFT_UPDATE_LEDGER=1 runMain graft.BenchLedger) and commit the diff")
  }
}
