package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** L1 — the plan linter catches exactly the §5 anti-patterns and
  * passes clean plans. */
class LintSpec extends SparkSpec {

  test("a clean keyed aggregation lints clean") {
    val df = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    assert(Lint.check(df).isEmpty)
    Lint.assertClean(df) // must not throw
  }

  test("a cross join is flagged as a cartesian product") {
    val a = Tables.nation(spark, sf)
    val b = Tables.region(spark, sf)
    val crossed = a.crossJoin(b)
    val kinds = Lint.check(crossed).map(_.kind).toSet
    assert(kinds.contains("cartesian-product") ||
      kinds.contains("nested-loop-join"),
      s"cross join must flag, got $kinds")
    intercept[IllegalStateException] { Lint.assertClean(crossed) }
    // ...and is accepted when explicitly allowlisted (the sanctioned
    // 1-row stats broadcast pattern)
    Lint.assertClean(crossed,
      allow = Set("cartesian-product", "nested-loop-join"))
  }

  test("the naive global window funnels and is flagged; the R53 shape is not") {
    val naive = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("o_orderkey"))))
    val kinds = Lint.check(naive).map(_.kind).toSet
    assert(kinds.contains("global-window") ||
      kinds.contains("single-partition-exchange"),
      s"the one-task global window must flag, got $kinds")

    val scalable = Ranks.globalRowNumber(
      Tables.orders(spark, sf).select(col("o_orderkey")),
      Seq(col("o_orderkey").asc), 8, "rn")
    assert(Lint.check(scalable).isEmpty,
      s"the two-pass rank must lint clean: ${Lint.check(scalable)}")
  }

  test("a 1-row aggregate reduction is the benign SinglePartition class") {
    val df = Tables.lineitem(spark, sf).agg(sum("l_quantity"))
    assert(!Lint.check(df).map(_.kind)
      .contains("single-partition-exchange"),
      "final aggregation of partials must not flag")
  }

  test("L3: the advisor's stats-based call matches what the planner does") {
    import org.apache.spark.sql.functions._
    // dim join: nation is tiny — advice must say broadcast, and the
    // executed plan must agree
    val dimJoin = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
    val a1 = Lint.adviseJoins(dimJoin)
    assert(a1.length === 1)
    assert(a1.head.advice.startsWith("broadcast"),
      s"a nation-dim join should broadcast: ${a1.head}")
    assert(dimJoin.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "the planner must agree with the advice")
    // both sides over the threshold: advice says shuffle, plan uses
    // a shuffle join (threshold shrunk so the fixture tables qualify)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      val big = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
      val a2 = Lint.adviseJoins(big)
      assert(a2.length === 1 && a2.head.advice == "shuffle-both",
        s"both sides exceed 1KB: ${a2.head}")
      assert(a2.head.thresholdBytes === 1024L)
      assert(a2.head.leftBytes > 1024 && a2.head.rightBytes > 1024)
      assert(!big.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("L4: plan fingerprints are formulation-stable and change-sensitive") {
    import org.apache.spark.sql.functions._
    def q1 = graft.Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 10)
      .groupBy("l_returnflag").agg(sum("l_extendedprice").as("rev"))
    // identical computation, rebuilt → same fingerprint
    assert(Lint.planFingerprint(q1) === Lint.planFingerprint(q1))
    // alias renaming is cosmetic — Catalyst canonicalization erases it
    val renamed = graft.Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 10)
      .groupBy("l_returnflag").agg(sum("l_extendedprice").as("revenue_x"))
    assert(Lint.planFingerprint(renamed) === Lint.planFingerprint(q1))
    // a changed literal is a different computation
    val shifted = graft.Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 11)
      .groupBy("l_returnflag").agg(sum("l_extendedprice").as("rev"))
    assert(Lint.planFingerprint(shifted) !== Lint.planFingerprint(q1))
    // a dropped filter is a different plan shape
    val noFilter = graft.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(sum("l_extendedprice").as("rev"))
    assert(Lint.planFingerprint(noFilter) !== Lint.planFingerprint(q1))
  }

  test("L4: fingerprints pin a representative slice of the coverage surface") {
    // smoke: fingerprinting works across heterogeneous plan shapes
    // (windows, joins, generators) without throwing, and is stable
    // within a session
    Seq("q1_pricing_summary", "q3_shipping_priority", "q_window_rank",
      "q_sessionize", "text_token_count").foreach { name =>
      val a = Lint.planFingerprint(
        graft.SparkEntry.queries(name)(spark, sf))
      val b = Lint.planFingerprint(
        graft.SparkEntry.queries(name)(spark, sf))
      assert(a === b, s"$name fingerprint unstable")
      assert(a.length === 32)
    }
  }

  test("L5: the shuffle bill prices a fact join, sees broadcasts, and shrinks under reuse") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf)
    val o = graft.Tables.orders(spark, sf)
    // a fact-fact join on the order key: two fact-sized shuffles (or
    // one + broadcast at tiny sf) — the bill must be non-empty and its
    // estimates positive
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority").count()
    val bill = Lint.shuffleBill(joined)
    assert(bill.nonEmpty)
    assert(bill.forall(_.estBytes > 0), s"estimates must be positive: $bill")
    // a broadcast dim join is billed as a broadcast, not a shuffle of
    // the fact
    val dim = graft.Tables.nation(spark, sf)
    val bc = li.join(graft.Tables.supplier(spark, sf), li("l_suppkey") === col("s_suppkey"))
      .join(dim, col("s_nationkey") === dim("n_nationkey"))
      .groupBy("n_name").count()
    val bcBill = Lint.shuffleBill(bc)
    assert(bcBill.exists(_.kind == "broadcast"), s"dim join must broadcast: $bcBill")
    // exchange reuse makes the paragraph-dedup bill show the shared
    // h-exchange ONCE per distinct subtree (the D93 reuse property in
    // bill form): the same-schema branches collapse, so shuffle count
    // stays small
    val pd = graft.dedup.ParagraphDedup.textParagraphDedup.fn(spark, sf)
    val pdBill = Lint.shuffleBill(pd).filter(_.kind == "shuffle")
    assert(pdBill.nonEmpty && pdBill.size <= 6, s"bill: $pdBill")
  }

  test("L5: SinglePartition tokens carry their L1 allowlist class — " +
      "benign agg reductions read differently from global funnels") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf)
    // a global aggregate's final 1-partition exchange: the sanctioned
    // 1-row-reduction class (partial agg upstream, one row per task)
    val globalAgg = li.agg(sum("l_quantity").as("s"))
    val aggTokens = Lint.shuffleBill(globalAgg)
      .filter(_.partitioning.startsWith("SinglePartition"))
    assert(aggTokens.nonEmpty, "global agg must bill a SinglePartition")
    assert(aggTokens.forall(_.partitioning == "SinglePartition[agg-1row]"),
      s"agg reduction must carry [agg-1row]: $aggTokens")
    // a raw repartition(1) of a fact scan: the funnel L1 would flag
    val funnel = li.repartition(1).select("l_orderkey")
    val funnelTokens = Lint.shuffleBill(funnel)
      .filter(_.partitioning.startsWith("SinglePartition"))
    assert(funnelTokens.nonEmpty && funnelTokens.forall(
      _.partitioning == "SinglePartition[non-agg]"),
      s"non-agg funnel must carry [non-agg]: $funnelTokens")
  }
}
