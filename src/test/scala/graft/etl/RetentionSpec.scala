package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E36 — the three partition fates of a retention sweep (values are
  * oracle-gated). */
class RetentionSpec extends SparkSpec {

  private def files(path: String): Map[String, Set[String]] = {
    val root = new java.io.File(path)
    root.listFiles().filter(_.getName.startsWith("o_month="))
      .map(d => d.getName ->
        d.listFiles().map(f => f.getName + ":" + f.length()).toSet)
      .toMap
  }

  private def build(): String = {
    val path = java.nio.file.Files
      .createTempDirectory("graft_retention_spec").toString + "/t"
    graft.Tables.orders(spark, sf)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.partitionBy("o_month").parquet(path)
    path
  }

  test("E36: untouched byte-identical, partial trimmed, fully-expired REMOVED") {
    val path = build()
    val before = files(path)
    val cutoff = lit(Retention.Cutoff).cast("timestamp")
    val (rewritten, deleted) =
      Retention.sweep(spark, path, "o_month", col("o_orderdate") < cutoff)
    assert(rewritten >= 1 && deleted >= 1,
      "fixture must exercise both partial and fully-expired partitions")
    val after = files(path)
    // fate 1: partitions entirely after the cutoff are byte-identical
    val untouched = before.keys.filter(_ > "o_month=1996-06").toSeq
    assert(untouched.nonEmpty)
    untouched.foreach { p =>
      assert(after(p) === before(p), s"$p must not be rewritten") }
    // fate 2: the cutoff month survives with only its post-cutoff rows
    assert(after.contains("o_month=1996-06"))
    // fate 3: months wholly before the cutoff are GONE (the dynamic-
    // overwrite-leaves-empty-partitions trap, handled)
    before.keys.filter(_ < "o_month=1996-06").foreach { p =>
      assert(!after.contains(p), s"fully-expired $p must be deleted") }
    // row-level: survivors are exactly the non-expired source rows
    val survivors = spark.read.parquet(path)
    assert(survivors.filter(col("o_orderdate") < cutoff).count() === 0)
    val expect = graft.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= cutoff).count()
    assert(survivors.count() === expect)
  }

  test("E36: escaped and NULL partition values sweep correctly (the " +
      "raw-interpolation trap: 'a/b' dirs are URL-escaped on disk, " +
      "null is __HIVE_DEFAULT_PARTITION__, isin() skips nulls)") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_retention_esc").toString + "/t"
    // part values: one untouched, one fully-expired with '/' and ':'
    // (URL-escaped on disk), one fully-expired NULL, one partial
    Seq(
      ("keep", 10, false), ("keep", 11, false),
      ("a/b:c", 1, true), ("a/b:c", 2, true),
      (null.asInstanceOf[String], 3, true),
      ("mixed", 4, true), ("mixed", 5, false)
    ).toDF("p", "id", "expired")
      .write.partitionBy("p").parquet(path)
    val dirsBefore = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith("p=")).toSet
    assert(dirsBefore.contains("p=a%2Fb%3Ac"),
      s"fixture must produce an escaped dir, got $dirsBefore")
    assert(dirsBefore.contains("p=__HIVE_DEFAULT_PARTITION__"))
    val (rw, del) =
      Retention.sweep(spark, path, "p", col("expired") === true)
    assert(rw === 1L && del === 2L)
    val dirsAfter = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith("p=")).toSet
    assert(!dirsAfter.contains("p=a%2Fb%3Ac"),
      "escaped fully-expired dir must be deleted on disk")
    assert(!dirsAfter.contains("p=__HIVE_DEFAULT_PARTITION__"),
      "null fully-expired partition must be deleted")
    val left = spark.read.parquet(path)
    assert(left.filter(col("expired")).count() === 0)
    assert(left.select("id").as[Int].collect().sorted
      === Array(5, 10, 11))
  }

  test("E36: a sweep with nothing expired touches nothing") {
    val path = build()
    val before = files(path)
    val (rw, del) = Retention.sweep(spark, path, "o_month",
      col("o_orderdate") < lit("1900-01-01").cast("timestamp"))
    assert(rw === 0L && del === 0L)
    assert(files(path) === before)
  }
}
