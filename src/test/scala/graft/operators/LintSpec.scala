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
}
