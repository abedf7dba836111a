package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E11 — SCD2 invariants beyond the oracle's value equality: interval
  * algebra per key and the single-Exchange plan shape. */
class ScdSpec extends SparkSpec {

  private def versions = Scd.scd2(
    Tables.orders(spark, sf).select(
      col("o_custkey"), col("o_orderpriority").as("attr"),
      col("o_orderdate").as("ts"), col("o_orderkey").as("seq")),
    "o_custkey", "attr")

  test("E13b: PIT lookup matches at most one version, inside its interval") {
    val probes = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 10 === 0).count()
    val out = Scd.qPitLookup.fn(spark, sf).cache()
    assert(out.count() === probes,
      "left join + non-overlapping intervals ⇒ exactly one row per probe")
    assert(out.groupBy("o_orderkey").count().filter(col("count") > 1).count() === 0)
    val hits = out.filter(col("attr_at_probe").isNotNull)
    assert(hits.count() > 0, "some probes must find history")
    assert(out.filter(col("attr_at_probe").isNull).count() > 0,
      "probes 30 days before a key's first order must miss")
    assert(hits.filter(col("valid_from") > col("probe_ts")).count() === 0,
      "a matched version must already be valid at the probe instant")
    out.unpersist()
  }

  test("exactly one current version per key; no consecutive-equal attrs") {
    // no cache: a cached canonical plan would satisfy the later plan
    // test with an InMemoryTableScan instead of the real build
    val v = versions
    val perKey = v.groupBy("o_custkey")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_current"))
    assert(perKey.filter(col("n_current") =!= 1).count() === 0)
    // consecutive versions must differ in attr (the change filter's job)
    val w = Window.partitionBy("o_custkey").orderBy("valid_from", "seq")
    val consec = v.withColumn("next_attr", lead(col("attr"), 1).over(w))
      .filter(col("next_attr").isNotNull && col("attr") === col("next_attr"))
    assert(consec.count() === 0)
  }

  test("intervals tile the key's timeline: contiguous, half-open, ordered") {
    val w = Window.partitionBy("o_custkey").orderBy("valid_from", "seq")
    val v = versions.withColumn("next_from", lead(col("valid_from"), 1).over(w))
    // every closed version ends exactly where the next one starts
    assert(v.filter(col("valid_to").isNotNull &&
      col("valid_to") =!= col("next_from")).count() === 0)
    // only the last version per key is open-ended
    assert(v.filter(col("valid_to").isNull &&
      col("next_from").isNotNull).count() === 0)
    // each key's first valid_from is its feed's min ts
    val firsts = versions.groupBy("o_custkey")
      .agg(min("valid_from").as("first_from"))
    val minTs = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(min("o_orderdate").as("min_ts"))
    assert(firsts.join(minTs, "o_custkey")
      .filter(col("first_from") =!= col("min_ts")).count() === 0)
  }

  test("E13c: incremental apply equals the full rebuild; untouched keys byte-identical") {
    def feed = Tables.orders(spark, sf).select(
      col("o_custkey"), col("o_orderpriority").as("attr"),
      col("o_orderdate").as("ts"), col("o_orderkey").as("seq"))
    val cutoff = "1995-01-01"
    val history = feed.filter(col("ts") <= lit(cutoff))
    val delta = feed.filter(col("ts") > lit(cutoff))
    val state = Scd.scd2(history, "o_custkey", "attr").cache()
    val merged = Scd.scd2Apply(state, delta, "o_custkey", "attr").cache()
    val full = Scd.scd2(feed, "o_custkey", "attr")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "incremental SCD2 apply must equal the full rebuild")
    // keys absent from the delta pass through with no row change at all
    val deltaKeys = delta.select("o_custkey").distinct()
    val stateUntouched = state.join(deltaKeys, Seq("o_custkey"), "left_anti")
    val mergedUntouched = merged.join(deltaKeys, Seq("o_custkey"), "left_anti")
    assert(mergedUntouched.exceptAll(stateUntouched).isEmpty &&
      stateUntouched.exceptAll(mergedUntouched).isEmpty)
    // empty delta: state passes through unchanged
    val noop = Scd.scd2Apply(state, delta.limit(0), "o_custkey", "attr")
    assert(noop.exceptAll(state).isEmpty && state.exceptAll(noop).isEmpty)
    // IDEMPOTENCE: re-applying the already-applied delta is a no-op —
    // every replayed row is stale under the (valid_from, seq) gate
    val replay = Scd.scd2Apply(merged, delta, "o_custkey", "attr")
    assert(replay.exceptAll(merged).isEmpty && merged.exceptAll(replay).isEmpty,
      "replaying an applied batch must not change the state")
    merged.unpersist(); state.unpersist()
  }

  test("E13d: tombstone semantics — gaps are history, trailing deletes are markers") {
    import spark.implicits._
    val feed = Seq(
      // key 1: A → delete → A again: the re-insert is a NEW version
      (1L, "U", "A", 10L, 1L), (1L, "D", null, 20L, 2L), (1L, "U", "A", 30L, 3L),
      // key 2: update then delete: trailing tombstone marker stays
      (2L, "U", "X", 10L, 4L), (2L, "U", "Y", 20L, 5L), (2L, "D", null, 30L, 6L),
      // key 3: consecutive equal upserts still collapse
      (3L, "U", "P", 10L, 7L), (3L, "U", "P", 20L, 8L),
      // key 4: leading tombstone records "known deleted"
      (4L, "D", null, 10L, 9L)
    ).toDF("k", "op", "attr", "ts", "seq")
    val v = Scd.scd2Cdc(feed, "k", "attr").orderBy("k", "valid_from").collect()
    val k1 = v.filter(_.getLong(0) == 1L)
    assert(k1.map(r => (r.getAs[String]("attr"), r.getAs[Long]("valid_from"),
      Option(r.getAs[Any]("valid_to")))).toSeq ===
      Seq(("A", 10L, Some(20L)), ("A", 30L, None)),
      "delete-then-reinsert of the same value must be two versions with a gap")
    assert(k1.last.getAs[Boolean]("is_current"))
    val k2 = v.filter(_.getLong(0) == 2L)
    assert(k2.length === 3)
    assert(k2(1).getAs[Any]("valid_to") === 30L, "delete closes the open version")
    assert(k2(2).getAs[String]("attr") === null &&
      !k2(2).getAs[Boolean]("is_current"), "trailing tombstone marker row")
    assert(v.count(_.getLong(0) == 3L) === 1, "equal upserts collapse")
    val k4 = v.filter(_.getLong(0) == 4L)
    assert(k4.length === 1 && k4.head.getAs[String]("attr") === null)

    // incremental apply across a split + replay idempotence
    val hist = feed.filter(col("ts") <= 20L)
    val delta = feed.filter(col("ts") > 20L)
    val merged = Scd.scd2ApplyCdc(Scd.scd2Cdc(hist, "k", "attr"),
      delta, "k", "attr")
    val full = Scd.scd2Cdc(feed, "k", "attr")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
    val replay = Scd.scd2ApplyCdc(merged, delta, "k", "attr")
    assert(replay.exceptAll(merged).isEmpty && merged.exceptAll(replay).isEmpty)
  }

  test("the whole build runs inside one hash partitioning on the key") {
    // window Exchanges are inserted by EnsureRequirements, so they only
    // exist in executedPlan; on a fresh (unexecuted, uncached) plan the
    // AQE wrapper prints exactly one plan copy
    val plan = versions.queryExecution.executedPlan.toString
    assert(!plan.contains("InMemoryTableScan"), "plan must not come from cache")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 hash Exchange, plan:\n$plan")
  }
}
