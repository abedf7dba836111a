package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** IO14 — snapshot-manifest table commits: atomic overwrite semantics
  * for plain-parquet tables without a lakehouse format on the
  * classpath.
  *
  * `mode("overwrite")` on a parquet dir DELETES BEFORE WRITING — a
  * reader racing the writer sees a missing or partial table, and a
  * failed write leaves nothing. The fix is the manifest pointer
  * pattern every table format builds on: each commit writes a FRESH
  * immutable snapshot directory, then swaps one small manifest file
  * (written to a temp name, atomically renamed) to point at it.
  * Readers resolve the pointer at plan time and scan an immutable dir:
  * they see the old snapshot or the new one, never a mixture; a
  * writer crash before the swap leaves an orphan directory and an
  * untouched manifest — the table is never corrupted.
  *
  * `vacuum` is the retention half: drop history beyond `keep`
  * snapshots and delete unreferenced directories (including crash
  * orphans). Keeping a few snapshots gives in-flight readers a grace
  * window — the reason vacuum is a POLICY, not part of commit.
  *
  * Manifest I/O is driver-side java.nio on O(history) bytes — the
  * metadata plane, not the data path. The reference's
  * `EtlBusImports` ledger is the same idea (run bookkeeping beside the
  * data); this applies it to the storage layout itself.
  */
object Snapshots {

  private val ManifestName = "_manifest.json"

  private def manifestPath(root: String): Path = Paths.get(root, ManifestName)

  /** (current, history oldest→newest). Missing manifest = empty table. */
  private[etl] def readManifest(root: String): (Option[String], Seq[String]) = {
    val p = manifestPath(root)
    if (!Files.exists(p)) (None, Nil)
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      // single-purpose parse of {"current":"...","history":["...",...]}
      val cur = "\"current\"\\s*:\\s*\"([^\"]+)\"".r
        .findFirstMatchIn(s).map(_.group(1))
      val hist = "\"history\"\\s*:\\s*\\[([^\\]]*)\\]".r
        .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
        .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq
      (cur, hist)
    }
  }

  private def writeManifest(root: String, current: String,
      history: Seq[String]): Unit = {
    val json = s"""{"current":"$current","history":[${
      history.map(h => s""""$h"""").mkString(",")}]}"""
    val tmp = Paths.get(root, s".$ManifestName.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Commit `df` as the table's new current snapshot. Returns the
    * snapshot id. The data write completes fully before the pointer
    * swap; nothing existing is touched. */
  def commit(df: DataFrame, root: String): String = {
    Files.createDirectories(Paths.get(root))
    val (_, hist) = readManifest(root)
    // next ordinal = max surviving ordinal + 1, NOT hist.size + 1 —
    // vacuum shrinks the history list, and a reused ordinal would
    // alias a vacuumed version id (IO15 reads by ordinal)
    val ord = hist.flatMap(h =>
      "snap-(\\d+)-".r.findFirstMatchIn(h).map(_.group(1).toInt))
      .maxOption.getOrElse(0) + 1
    val next = s"snap-$ord-${System.nanoTime()}"
    df.write.parquet(s"$root/$next")
    writeManifest(root, next, hist :+ next)
    next
  }

  /** IO23 — optimistic-concurrency commit (the table-format
    * conditional write): the caller states which snapshot its write
    * was DERIVED FROM (`expectedCurrent`, None = expects an empty
    * table); if another writer committed in between, this commit
    * REFUSES with a loud conflict error instead of silently publishing
    * a lost update — two read-modify-write maintainers (S20's SCD2
    * fold, E18's incremental refresh) racing the same table would
    * otherwise each base on the same parent and the second would erase
    * the first's work. The base check runs under the commit lock
    * BEFORE any data write, so a refused commit writes nothing at all
    * — no torn state, not even a vacuum-class orphan.
    *
    * Cross-PROCESS scope (r8 verdict item 6): the check-and-swap runs
    * under an OS file lock (`FileChannel.lock` on a `.commit.lock`
    * sibling of the manifest), so two DRIVERS racing the same table
    * root on a shared filesystem serialize too — the loser observes
    * the winner's manifest and refuses. `this.synchronized` stays for
    * intra-JVM writers (a second lock() on an already-held FileLock in
    * the SAME JVM throws OverlappingFileLockException rather than
    * blocking). On filesystems without advisory locking (lock() throws
    * IOException / UnsupportedOperationException) the commit proceeds
    * under `this.synchronized` alone — the single-JVM guarantee, same
    * CONTRACT (stated parent, loud refusal, nothing torn), best
    * transport available; the degradation is a real fallback path, not
    * a propagated failure. */
  def commitIf(df: DataFrame, root: String,
      expectedCurrent: Option[String]): String = this.synchronized {
    Files.createDirectories(Paths.get(root))
    val ch = java.nio.channels.FileChannel.open(
      Paths.get(root, ".commit.lock"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      // null = filesystem refused advisory locking; fall back to the
      // intra-JVM monitor already held. OverlappingFileLockException is
      // NOT caught: same-JVM re-entry is a logic error this.synchronized
      // makes impossible, so it should stay loud.
      val lock =
        try ch.lock()
        catch {
          case _: java.io.IOException | _: UnsupportedOperationException =>
            null
        }
      try {
        val (cur, _) = readManifest(root)
        if (cur != expectedCurrent)
          throw new java.util.ConcurrentModificationException(
            s"snapshot conflict under $root: expected base " +
              s"${expectedCurrent.getOrElse("<empty>")} but current is " +
              s"${cur.getOrElse("<empty>")} — rebase and retry")
        if (raceHoldMs > 0) Thread.sleep(raceHoldMs) // test seam
        commit(df, root)
      } finally if (lock != null) lock.release()
    } finally ch.close()
  }

  /** Test seam for the two-process race spec: widens the
    * check-to-swap window so a concurrent writer demonstrably blocks
    * on the OS lock instead of interleaving. Never set in production
    * paths. */
  @volatile private[etl] var raceHoldMs: Long = 0L

  /** The current snapshot id (None = never committed) — what a
    * read-modify-write maintainer records as its base for [[commitIf]]. */
  def currentId(root: String): Option[String] = readManifest(root)._1

  /** E50 — the table's own CHANGE FEED between two retained versions:
    * IO15 time travel composed with E24's snapshot-diff-to-CDC
    * extractor, so any snapshot table emits the minimal I/U/D feed
    * that transforms version `fromV` into version `toV` — downstream
    * consumers (an E17 apply, a search-index refresher, a cache
    * invalidator) subscribe to committed versions without the writer
    * producing a feed. Inherits E24's round-trip law (apply(old, feed)
    * ≡ new) and E17's idempotent-apply contract; both ends resolve at
    * plan time against immutable dirs, so the feed is stable no matter
    * when it is computed. Versions vacuumed away fail loudly (the
    * IO15 retention edge — a change feed over reclaimed history would
    * be silently partial). */
  def changes(spark: SparkSession, root: String, fromV: Int, toV: Int,
      key: String, valueCols: Seq[String]): DataFrame =
    Cdc.extractChanges(
      readVersion(spark, root, fromV),
      readVersion(spark, root, toV), key, valueCols)

  /** True once the table has a committed current snapshot — the
    * bootstrap probe for incremental maintainers (S20). */
  def hasCurrent(root: String): Boolean = readManifest(root)._1.isDefined

  /** Read the current snapshot (empty-schema error if no commit yet —
    * callers race-checking existence should handle None). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val (cur, _) = readManifest(root)
    val snap = cur.getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    spark.read.parquet(s"$root/$snap")
  }

  /** IO15 — time travel: read the table as of commit `version`
    * (1-based, oldest = 1). History is exactly the manifest's commit
    * list, so any un-vacuumed version is readable at plan time — the
    * audit/backfill-debugging read every table format ships. A
    * version vacuumed away fails LOUDLY (the grace-window contract:
    * retention is a policy decision, readers must see its edge). */
  def readVersion(spark: SparkSession, root: String, version: Int): DataFrame = {
    val (_, hist) = readManifest(root)
    // the commit ordinal is part of the immutable snapshot name
    // (snap-<n>-<nanos>), so version ids stay stable across vacuums
    // (vacuum drops entries from the history list)
    val snap = hist.find(_.startsWith(s"snap-$version-"))
    require(snap.isDefined,
      s"version $version is not readable under $root — never committed, " +
        s"or vacuumed away (retained: ${hist.mkString(", ")})")
    spark.read.parquet(s"$root/${snap.get}")
  }

  /** Retain the newest `keep` referenced snapshots (always including
    * current); delete older ones AND unreferenced orphan dirs (crashed
    * commits). Returns deleted directory names. */
  def vacuum(root: String, keep: Int): Seq[String] = {
    require(keep >= 1, "must keep at least the current snapshot")
    val (cur, hist) = readManifest(root)
    val keepSet = (hist.takeRight(keep) ++ cur).toSet
    val live = Files.list(Paths.get(root)).iterator().asScala
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString)
      .filter(_.startsWith("snap-"))
      .toSeq
    val doomed = live.filterNot(keepSet)
    doomed.foreach { d =>
      val dir = Paths.get(root, d)
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
    writeManifest(root, cur.getOrElse(""), hist.filter(keepSet))
    doomed.sorted
  }

  // -------------------------------------------- IO17: group commits

  private val GroupManifestName = "_group_manifest.json"

  /** IO17 — atomic MULTI-table commit: every table's fresh snapshot
    * directory is fully written first, then ONE group manifest swaps
    * atomically to reference them ALL. A reader that resolves the
    * group sees every table at the SAME commit — never table A's new
    * version joined against table B's old one, the torn read that
    * per-table pointers (IO14, and per-table lakehouse transactions
    * generally) cannot rule out when a job publishes related tables
    * together (fact + its dims, train + its eval split). A crash
    * before the swap leaves orphan dirs and the previous group intact.
    * Returns the commit stamp shared by every table dir. */
  def commitGroup(tables: Map[String, DataFrame], root: String): String = {
    require(tables.nonEmpty, "empty group commit")
    Files.createDirectories(Paths.get(root))
    val stamp = java.util.UUID.randomUUID().toString.take(12)
    val dirs = tables.map { case (name, df) =>
      val dir = s"$root/$name/snap_$stamp"
      df.write.parquet(dir) // fresh dir — existing data untouched
      name -> dir
    }
    val json = dirs.map { case (n, d) => s""""$n":"$d"""" }
      .mkString("{", ",", "}")
    val tmp = Paths.get(root, s".$GroupManifestName.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(root, GroupManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    stamp
  }

  /** Resolve the whole group from ONE manifest read: the returned
    * frames all scan immutable dirs of a single commit, so they stay
    * mutually consistent regardless of later commits. */
  def readGroup(spark: SparkSession,
      root: String): Map[String, DataFrame] = {
    val p = Paths.get(root, GroupManifestName)
    require(Files.exists(p), s"no group commit at $root")
    val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    "\"([^\"]+)\"\\s*:\\s*\"([^\"]+)\"".r.findAllMatchIn(s)
      .map(m => m.group(1) -> spark.read.parquet(m.group(2)))
      .toMap
  }
}
