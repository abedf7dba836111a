package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** R75 — compaction planning over the fragmented fixture. */
class CompactionSpec extends SparkSpec {

  test("R75: bins replay the greedy prefix packing and conserve rows") {
    val out = Compaction.plan(spark, sf).collect()
    assert(out.length === Compaction.SmallFiles)
    // driver-side replay of the same packing
    var prefix = 0L
    val refBins = out.sortBy(_.getAs[String]("file")).map { r =>
      val bin = prefix / Compaction.TargetRows
      prefix += r.getAs[Long]("rows")
      bin
    }
    assert(out.map(_.getAs[Long]("bin")).toSeq === refBins.toSeq)
    // conservation + monotone bins + per-bin rollups consistent
    assert(out.map(_.getAs[Long]("rows")).sum ===
      Tables.events(spark, sf).count())
    assert(out.map(_.getAs[Long]("bin")).toSeq ===
      out.map(_.getAs[Long]("bin")).sorted.toSeq)
    out.groupBy(_.getAs[Long]("bin")).foreach { case (_, rs) =>
      assert(rs.forall(_.getAs[Long]("bin_files") === rs.length))
      assert(rs.forall(_.getAs[Long]("bin_rows") ===
        rs.map(_.getAs[Long]("rows")).sum))
    }
    // every bin but the last fills to at least the target minus one
    // straddling file (the greedy guarantee a compactor relies on)
    val maxFile = out.map(_.getAs[Long]("rows")).max
    val lastBin = out.map(_.getAs[Long]("bin")).max
    out.groupBy(_.getAs[Long]("bin"))
      .filter(_._1 != lastBin).values.foreach { rs =>
        assert(rs.head.getAs[Long]("bin_rows") >
          Compaction.TargetRows - maxFile,
          "a non-final bin stopped short of the target")
      }
  }

  test("R75: executing the plan rewrites to one file per bin, rows conserved") {
    val out = java.nio.file.Files.createTempDirectory("graft_compact_out")
      .toString
    Compaction.execute(spark, sf, out)
    val planned = Compaction.plan(spark, sf).collect()
    val nBins = planned.map(_.getAs[Long]("bin")).distinct.length
    val back = spark.read.parquet(out)
    assert(back.count() === planned.map(_.getAs[Long]("rows")).sum)
    // one physical file per bin directory (materialize the file name
    // as a column first — nondeterministic exprs can't sit inside an
    // aggregate)
    import org.apache.spark.sql.functions.{col, input_file_name, countDistinct}
    val files = back
      .withColumn("f", input_file_name())
      .groupBy(col("bin"))
      .agg(countDistinct(col("f")).as("nf"))
      .collect()
    assert(files.length === nBins)
    assert(files.forall(_.getAs[Long]("nf") === 1L),
      "each compaction bin must land in exactly one output file")
    // per-bin rows match the plan
    val planBins = planned.groupBy(_.getAs[Long]("bin"))
      .map { case (b, rs) => b -> rs.head.getAs[Long]("bin_rows") }
    val gotBins = back.groupBy("bin").count().collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("count")).toMap
    assert(gotBins === planBins)
  }
}
