package graft.etl

import graft.{SparkSpec, Tables}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** E19 — the plan→repair cycle: a damaged partitioned table is
  * restored to the expected state by rewriting ONLY the partitions the
  * plan flags; untouched partitions' files are left byte-identical on
  * disk (same paths, sizes, mtimes). */
class RepairSpec extends SparkSpec {

  private def partFiles(root: String, keep: String => Boolean): Map[String, (Long, Long)] =
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .filter(p => keep(p.toString))
      .map(p => p.toString ->
        (Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toMap

  test("E19: repair rewrites exactly the flagged partitions and restores parity") {
    val dir = Files.createTempDirectory("graft_repair").toString
    val expected = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"),
        col("o_orderstatus").as("status"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .cache()
    // damage: drop every k%89 row, bump every k%97 price — confined to
    // whatever months those keys live in
    val damaged = expected.filter(col("k") % 89 =!= 0)
      .withColumn("price",
        when(col("k") % 97 === 0, col("price") + 1).otherwise(col("price")))
    damaged.write.mode("overwrite").partitionBy("month").parquet(dir)

    val current = spark.read.parquet(dir)
    val plan = Repair.repairPlan(current, expected, "k", "month",
      Seq("price", "status")).cache()
    val flagged = plan.select("month").collect().map(_.getString(0)).toSet
    assert(flagged.nonEmpty)
    // damage counts in the plan must equal the injected damage
    val nRemoved = plan.agg(sum("n_added")).head().getLong(0)
    assert(nRemoved === expected.filter(col("k") % 89 === 0).count(),
      "dropped rows surface as 'added' (present in expected, not current)")

    // months with NO damaged key must not be flagged
    val damagedMonths = expected
      .filter(col("k") % 89 === 0 || col("k") % 97 === 0)
      .select("month").distinct().collect().map(_.getString(0)).toSet
    assert(flagged === damagedMonths)

    val before = partFiles(dir, p => !flagged.exists(m => p.contains(s"month=$m")))
    Repair.repair(expected, plan, "month", dir)
    val after = partFiles(dir, p => !flagged.exists(m => p.contains(s"month=$m")))
    assert(after === before, "untouched partitions must keep their files")

    val repaired = spark.read.parquet(dir)
      .select("k", "price", "status", "month")
    val exp = expected.select("k", "price", "status", "month")
    assert(repaired.exceptAll(exp).isEmpty && exp.exceptAll(repaired).isEmpty,
      "repaired table must equal the expected table exactly")

    // a clean table yields an empty plan, and repair on it is a no-op
    val cleanPlan = Repair.repairPlan(repaired, exp, "k", "month",
      Seq("price", "status"))
    assert(cleanPlan.isEmpty)
    plan.unpersist(); expected.unpersist()
  }

  test("E20: backfill plan finds exactly the damaged partitions with exact deficits") {
    val src = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("mi"))
      .cache()
    val loaded = src.filter(col("mi") % 5 =!= 0)
    val plan = Repair.backfillPlan(src, loaded, "month").collect()
    val expectedMissing = src.filter(col("mi") % 5 === 0)
      .groupBy("month").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plan.map(_.getString(0)).toSet === expectedMissing.keySet)
    plan.foreach { r =>
      assert(r.getAs[Long]("n_loaded") === 0L)
      assert(r.getAs[Long]("n_missing") === expectedMissing(r.getString(0)))
    }
    // fully loaded: empty plan
    assert(Repair.backfillPlan(src, src, "month").isEmpty)
    src.unpersist()
  }
}
