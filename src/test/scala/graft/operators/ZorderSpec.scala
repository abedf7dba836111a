package graft.operators

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** R37 — the part an SQL oracle cannot gate: a Z-ordered layout must
  * actually skip row groups for range filters on EITHER interleaved
  * dimension, where a random layout reads everything. */
class ZorderSpec extends SparkSpec {

  test("R37: z-value interleaves bits so both dims cluster") {
    import spark.implicits._
    // adjacent (x, y) cells must map to nearby z-values: the max z of
    // the low quadrant is below the min z of the high quadrant
    val pts = (for (x <- 0 until 16; y <- 0 until 16) yield (x, y))
      .toDF("x", "y")
      .withColumn("z", Zorder.zvalue2(col("x"), col("y"), bits = 4))
    val rows = pts.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // bijective on the 4-bit × 4-bit grid
    assert(rows.map(_._3).distinct.length === 256)
    assert(rows.map(_._3).min === 0L && rows.map(_._3).max === 255L)
    val lowQuad = rows.filter(r => r._1 < 8 && r._2 < 8).map(_._3)
    val highQuad = rows.filter(r => r._1 >= 8 && r._2 >= 8).map(_._3)
    assert(lowQuad.max < highQuad.min,
      "quadrants must occupy disjoint z-ranges — the skipping property")
  }

  test("R37: z-ordered parquet layout skips row groups for a 2-dim box filter") {
    val base = Files.createTempDirectory("graft_zorder").toString
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    // small row groups so min/max skipping is observable at spec scale
    val opts = Map("parquet.block.size" -> (32 * 1024).toString)
    Zorder.writeZordered(li, col("l_partkey"), col("l_suppkey"),
      s"$base/zorder", numFiles = 8, options = opts)
    li.repartition(8) // round-robin: every file spans the full key space
      .write.options(opts).mode("overwrite").parquet(s"$base/random")

    val (pHi, sHi) = {
      val r = li.agg(max("l_partkey"), max("l_suppkey")).head()
      (r.getLong(0), r.getLong(1))
    }
    // a selective box on BOTH dims — the workload a 1-dim sort can't serve
    def box(path: String) = spark.read.parquet(path)
      .filter(col("l_partkey") <= pHi / 8 && col("l_suppkey") <= sHi / 8)
    def scanned(path: String): Long = {
      val df = box(path)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.sum
    }
    // identical results from both layouts
    val a = box(s"$base/zorder").orderBy("l_orderkey", "l_linenumber").collect()
    val b = box(s"$base/random").orderBy("l_orderkey", "l_linenumber").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
    val zRows = scanned(s"$base/zorder")
    val rRows = scanned(s"$base/random")
    assert(zRows < rRows / 2,
      s"z-layout must skip most row groups: scanned $zRows vs random-layout $rRows")
  }

  test("R86: the zone-map readout shows z-order pruning where linear cannot") {
    val rows = Zorder.qZonemapSkipping.fn(spark, sf).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("value_ratio_q"),
          r.getAs[Long]("n_rows"))).toMap
    assert(rows.keySet === Set("linear", "zorder"))
    // both layouts hold the same data
    assert(rows("linear")._3 === rows("zorder")._3)
    // the value-dimension predicate prunes nothing on the user-sorted
    // layout and most files on the z-ordered one — the R37 claim as data
    assert(rows("linear")._2 === 0L,
      "a single-dim sort cannot prune on the other dimension")
    assert(rows("zorder")._2 >= 500000L,
      "z-order must prune at least half the files on the value dim")
  }
}
