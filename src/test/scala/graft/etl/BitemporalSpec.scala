package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E35 — bitemporal reads: TRANSACTION time (which commit of the
  * dimension — IO15 `Snapshots.readVersion`) × VALID time (which
  * version interval contains the probe — E13b's PIT predicate),
  * composed. The question only both axes can answer: "what did last
  * week's report SAY, and what would it say today, about the same
  * business instant" — an audit cannot re-run old numbers without
  * transaction time, and cannot attribute facts without valid time.
  * No new machinery: the two existing operators compose because the
  * snapshot read is plan-time table resolution and the PIT lookup is
  * an ordinary join over whatever table it is handed.
  */
class BitemporalSpec extends SparkSpec {

  private def pitAt(dim: org.apache.spark.sql.DataFrame, key: Long,
      ts: String): Option[String] = {
    val probe = lit(ts).cast("timestamp")
    dim.filter(col("o_custkey") === key &&
        col("valid_from") <= probe &&
        (col("valid_to").isNull || probe < col("valid_to")))
      .collect().headOption.map(_.getAs[String]("attr"))
  }

  test("E35: the same valid instant answers differently as knowledge advances") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bitemporal").toString
    import spark.implicits._
    // knowledge as of commit 1: key 1 became 'A' at t1
    val feed1 = Seq((1L, "A", "2020-01-01", 1L))
      .toDF("o_custkey", "attr", "ts", "seq")
      .withColumn("ts", col("ts").cast("timestamp"))
    val v1 = Scd.scd2(feed1, "o_custkey", "attr")
    Snapshots.commit(v1, root)
    // later knowledge: key 1 changed to 'B' at t2 — commit 2 closes
    // the 'A' interval
    val delta = Seq((1L, "B", "2021-06-01", 2L))
      .toDF("o_custkey", "attr", "ts", "seq")
      .withColumn("ts", col("ts").cast("timestamp"))
    val v2 = Scd.scd2Apply(v1, delta, "o_custkey", "attr")
    Snapshots.commit(v2, root)

    val asOf1 = Snapshots.readVersion(spark, root, 1)
    val asOf2 = Snapshots.readVersion(spark, root, 2)

    // a valid instant AFTER the (later-learned) change: commit 1
    // still believes 'A' holds — that IS what last year's report
    // printed; commit 2 knows better
    assert(pitAt(asOf1, 1L, "2021-07-01") === Some("A"))
    assert(pitAt(asOf2, 1L, "2021-07-01") === Some("B"))
    // a valid instant BEFORE the change: both knowledge states agree
    assert(pitAt(asOf1, 1L, "2020-06-01") === Some("A"))
    assert(pitAt(asOf2, 1L, "2020-06-01") === Some("A"))
    // before the key existed: both agree on null
    assert(pitAt(asOf1, 1L, "2019-01-01") === None)
    assert(pitAt(asOf2, 1L, "2019-01-01") === None)
  }

  test("E35 entry: knowledge is monotone — a covered probe never uncovers") {
    val out = Bitemporal.asOf(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // later batches only ADD change points: the earliest version can
    // only move earlier, so non-null beliefs never become null
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("attr_tx0")))
        assert(!r.isNullAt(r.fieldIndex("attr_tx1")),
          s"tx1 dropped coverage for ${r.getLong(0)}")
      if (!r.isNullAt(r.fieldIndex("attr_tx1")))
        assert(!r.isNullAt(r.fieldIndex("attr_tx2")),
          s"tx2 dropped coverage for ${r.getLong(0)}")
    }
    // the revised flag is exactly the cross-batch disagreement
    rows.foreach { r =>
      def a(c: String) = Option(r.getAs[String](c))
      assert(r.getAs[Boolean]("revised") ===
        (a("attr_tx0") != a("attr_tx1") || a("attr_tx1") != a("attr_tx2")))
    }
    out.unpersist()
  }

  test("E35 entry: the final batch's belief equals the plain E13b read") {
    import spark.implicits._
    val f = graft.Tables.orders(spark, sf).select(
      col("o_custkey"), col("o_orderpriority").as("attr"),
      col("o_orderdate").as("ts"), col("o_orderkey").as("seq"))
    val dim = Scd.scd2(f, "o_custkey", "attr")
    val probe = lit(java.sql.Date.valueOf("1995-06-01"))
    val direct = graft.Tables.customer(spark, sf)
      .filter(col("c_custkey") % 20 === 0).select(col("c_custkey"))
      .join(dim,
        col("c_custkey") === col("o_custkey") &&
          col("valid_from") <= probe &&
          (col("valid_to").isNull || probe < col("valid_to")), "left")
      .select(col("c_custkey"), col("attr").as("attr_direct"))
    val viaEntry = Bitemporal.asOf(spark, sf)
      .select(col("c_custkey"), col("attr_tx2"))
    val mismatches = viaEntry.join(direct, "c_custkey")
      .filter(!(col("attr_tx2") <=> col("attr_direct"))).count()
    assert(mismatches === 0,
      "with all batches loaded the bitemporal read must collapse to E13b")
  }
}
