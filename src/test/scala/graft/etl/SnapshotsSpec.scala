package graft.etl

import java.nio.file.{Files, Paths}
import graft.SparkSpec

/** IO14 — the manifest pointer contract: readers always see a complete
  * snapshot, history is a grace window, vacuum reclaims the rest. */
class SnapshotsSpec extends SparkSpec {

  test("commits swap atomically; an in-flight reader's snapshot survives until vacuumed") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_snap").toString
    Snapshots.commit(Seq((1L, "v1")).toDF("id", "tag"), root)
    // an old reader resolves its snapshot path NOW (plan time)
    val oldReader = Snapshots.read(spark, root)
    Snapshots.commit(Seq((1L, "v2"), (2L, "v2")).toDF("id", "tag"), root)
    Snapshots.commit(Seq((1L, "v3"), (2L, "v3"), (3L, "v3")).toDF("id", "tag"), root)
    // new reads see the newest complete snapshot
    assert(Snapshots.read(spark, root).count() === 3)
    // the old reader still scans ITS immutable snapshot — overwrite
    // semantics without delete-before-write
    assert(oldReader.count() === 1)
    // vacuum keep=2: snap-1 goes, current + previous stay
    val deleted = Snapshots.vacuum(root, keep = 2)
    assert(deleted.length === 1 && deleted.head.startsWith("snap-1"))
    assert(Snapshots.read(spark, root).count() === 3)
    // the old reader's data is now legitimately gone
    intercept[Exception] { oldReader.count() }
    // vacuum is idempotent and never deletes current
    assert(Snapshots.vacuum(root, keep = 1).length === 1)
    assert(Snapshots.read(spark, root).count() === 3)
  }

  test("a crashed commit (orphan dir, manifest unswapped) does not corrupt the table; vacuum reclaims it") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_snap_crash").toString
    Snapshots.commit(Seq((1L, "good")).toDF("id", "tag"), root)
    // simulate a writer dying after its data write, before the swap
    Seq((9L, "torn")).toDF("id", "tag")
      .write.parquet(s"$root/snap-99-0")
    assert(Snapshots.read(spark, root).collect().map(_.getString(1)).toSeq ===
      Seq("good"), "readers must never see the unswapped snapshot")
    val deleted = Snapshots.vacuum(root, keep = 3)
    assert(deleted === Seq("snap-99-0"), "orphans are vacuum's to reclaim")
    assert(!Files.exists(Paths.get(root, "snap-99-0")))
    assert(Snapshots.read(spark, root).count() === 1)
  }

  test("IO15: time travel reads any retained version by stable ordinal; vacuumed versions fail loudly") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_snap_tt").toString
    Snapshots.commit(Seq((1L, "v1")).toDF("id", "tag"), root)
    Snapshots.commit(Seq((1L, "v2"), (2L, "v2")).toDF("id", "tag"), root)
    Snapshots.commit(Seq((1L, "v3"), (2L, "v3"), (3L, "v3")).toDF("id", "tag"), root)
    assert(Snapshots.readVersion(spark, root, 1).collect()
      .map(_.getString(1)).toSeq === Seq("v1"))
    assert(Snapshots.readVersion(spark, root, 2).count() === 2)
    assert(Snapshots.readVersion(spark, root, 3).count() === 3)
    // current == newest version, always
    assert(Snapshots.read(spark, root).count() ===
      Snapshots.readVersion(spark, root, 3).count())
    Snapshots.vacuum(root, keep = 2)
    // version ids stay STABLE across the vacuum...
    assert(Snapshots.readVersion(spark, root, 2).count() === 2)
    // ...the reclaimed version fails loudly...
    val e = intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, root, 1)
    }
    assert(e.getMessage.contains("vacuumed"))
    // ...and a post-vacuum commit gets a FRESH ordinal, never a reused one
    Snapshots.commit(Seq((4L, "v4")).toDF("id", "tag"), root)
    assert(Snapshots.readVersion(spark, root, 4).collect()
      .map(_.getString(1)).toSeq === Seq("v4"))
    assert(Snapshots.read(spark, root).count() === 1)
  }

  test("reading an uncommitted table fails loudly") {
    val root = Files.createTempDirectory("graft_snap_empty").toString
    val e = intercept[IllegalStateException] { Snapshots.read(spark, root) }
    assert(e.getMessage.contains("no committed snapshot"))
  }

  test("E23: run-over-run snapshot diff names exactly what the job changed") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_snap_diff").toString
    Snapshots.commit(Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"))
      .toDF("k", "price", "status"), root)
    // "the nightly run": drops 3, changes 2, adds 4
    Snapshots.commit(Seq((1L, 10.0, "A"), (2L, 25.0, "B"), (4L, 40.0, "D"))
      .toDF("k", "price", "status"), root)
    val diff = Quality.snapshotDiff(spark, root, 1, 2, "k",
      Seq("price", "status")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff === Map(2L -> "changed", 3L -> "removed", 4L -> "added"),
      s"got $diff")
    // identical versions diff empty
    assert(Quality.snapshotDiff(spark, root, 2, 2, "k",
      Seq("price", "status")).isEmpty)
  }

  test("IO17: group commits are cross-table atomic — no torn reads, crash-safe") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_group").toString
    val s1 = Snapshots.commitGroup(Map(
      "fact" -> Seq((1L, 10.0)).toDF("k", "v"),
      "dim" -> Seq((1L, "a")).toDF("k", "name")), root)
    // resolve the group ONCE; both frames pin commit s1
    val g1 = Snapshots.readGroup(spark, root)
    val s2 = Snapshots.commitGroup(Map(
      "fact" -> Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"),
      "dim" -> Seq((1L, "a"), (2L, "b")).toDF("k", "name")), root)
    assert(s1 !== s2)
    // the held group still reads BOTH tables at s1 — consistent join
    assert(g1("fact").count() === 1 && g1("dim").count() === 1)
    // a fresh resolve reads BOTH at s2, dirs share the commit stamp
    val g2 = Snapshots.readGroup(spark, root)
    assert(g2("fact").count() === 2 && g2("dim").count() === 2)
    val stamps = g2.values.map(_.inputFiles.head
      .replaceAll(".*/snap_([^/]+)/.*", "$1")).toSet
    assert(stamps === Set(s2),
      s"all tables of one resolve must carry one commit stamp, got $stamps")
    // crash between data write and swap: orphan dirs, readers unharmed
    Seq((9L, 9.9)).toDF("k", "v")
      .write.parquet(s"$root/fact/snap_deadbeef")
    val g3 = Snapshots.readGroup(spark, root)
    assert(g3("fact").count() === 2,
      "an unswapped snapshot dir must never be read")
  }

  test("IO23: a stale-based conditional commit refuses loudly and writes nothing") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_occ").toString
    // bootstrap: both writers expect the empty table; the first wins
    val v1 = Snapshots.commitIf(Seq((1L, "a")).toDF("id", "tag"), root, None)
    val boot = intercept[java.util.ConcurrentModificationException] {
      Snapshots.commitIf(Seq((1L, "b")).toDF("id", "tag"), root, None)
    }
    assert(boot.getMessage.contains("conflict"))
    // read-modify-write race: both maintainers base on v1; writer A
    // commits, writer B's conditional commit must refuse
    val base = Snapshots.currentId(root)
    assert(base.contains(v1))
    val v2 = Snapshots.commitIf(Seq((2L, "a2")).toDF("id", "tag"), root, base)
    val e = intercept[java.util.ConcurrentModificationException] {
      Snapshots.commitIf(Seq((2L, "b2")).toDF("id", "tag"), root, base)
    }
    assert(e.getMessage.contains(v1) && e.getMessage.contains(v2))
    // nothing torn: current is writer A's commit, history has no
    // refused dirs (a refused commitIf writes no data at all)
    assert(Snapshots.currentId(root).contains(v2))
    assert(Snapshots.read(spark, root).collect().map(_.getString(1)).toSet
      == Set("a2"))
    val dirs = Files.list(Paths.get(root)).toArray.map(_.toString)
      .count(_.contains("snap-"))
    assert(dirs == 2, "exactly the two successful commits on disk")
    // rebase-and-retry converges: B re-reads, re-derives, commits on v2
    val v3 = Snapshots.commitIf(Seq((3L, "b3")).toDF("id", "tag"), root,
      Snapshots.currentId(root))
    assert(Snapshots.currentId(root).contains(v3))
  }

  test("E50: the table emits its own change feed, and applying it reproduces the target version") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_feed").toString
    Snapshots.commit(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "tag", "v"), root)
    // v2: key 2 updated, key 3 deleted, key 4 inserted
    Snapshots.commit(Seq((1L, "a", 10L), (2L, "b2", 25L), (4L, "d", 40L))
      .toDF("k", "tag", "v"), root)
    val feed = Snapshots.changes(spark, root, 1, 2, "k", Seq("tag", "v"))
    val ops = feed.collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("op")).toMap
    assert(ops == Map(2L -> "U", 3L -> "D", 4L -> "I"), s"got $ops")
    // round trip: applying the feed to v1 reproduces v2 exactly
    val rebuilt = Cdc.applyExtracted(
      Snapshots.readVersion(spark, root, 1), feed, "k", Seq("tag", "v"))
    val v2 = Snapshots.readVersion(spark, root, 2)
    assert(rebuilt.exceptAll(v2).isEmpty && v2.exceptAll(rebuilt).isEmpty)
    // identical versions emit an empty feed
    assert(Snapshots.changes(spark, root, 2, 2, "k", Seq("tag", "v")).isEmpty)
    // a vacuumed end fails loudly — no silently partial feeds
    Snapshots.commit(Seq((1L, "a", 10L)).toDF("k", "tag", "v"), root)
    Snapshots.vacuum(root, keep = 2)
    val e = intercept[IllegalArgumentException] {
      Snapshots.changes(spark, root, 1, 3, "k", Seq("tag", "v"))
    }
    assert(e.getMessage.contains("not readable"))
  }
}
