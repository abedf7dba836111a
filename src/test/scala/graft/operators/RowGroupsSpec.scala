package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** IO16 — row-group footer stats: span disjointness under a sorted
  * write, the smear an unsorted write produces, and row conservation. */
class RowGroupsSpec extends SparkSpec {

  test("IO16: sorted write yields pairwise-disjoint row-group key spans") {
    val dir = RowGroups.sortedDir(spark, sf)
    val rows = RowGroups.stats(spark, dir, RowGroups.KeyCol)
      .orderBy("file", "row_group_id").collect()
    assert(rows.length >= 3, s"need several row groups, got ${rows.length}")
    rows.groupBy(_.getString(0)).foreach { case (_, groups) =>
      groups.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("max_key") <= b.getAs[Long]("min_key"),
            "sorted write must produce non-overlapping, ordered spans")
        case _ =>
      }
    }
    val total = rows.map(_.getAs[Long]("n_values")).sum
    assert(total === Tables.lineitem(spark, sf).count(),
      "footer value counts must conserve the row count")
  }

  test("IO16: an unsorted write smears spans — the skipping contrast") {
    val out = "/tmp/graft_warehouse/rgstats_unsorted_" +
      ProcessHandle.current().pid()
    Tables.lineitem(spark, sf)
      // hash-scramble the key order, then the same small row groups
      .repartition(1, pmod(xxhash64(col("l_orderkey")), lit(97)))
      .sortWithinPartitions(pmod(xxhash64(col("l_orderkey")), lit(97)))
      .write.mode("overwrite")
      .option("parquet.block.size", 128 * 1024)
      .parquet(out)
    val rows = RowGroups.stats(spark, out, RowGroups.KeyCol).collect()
    assert(rows.length >= 2)
    val overlaps = rows.groupBy(_.getString(0)).exists { case (_, gs) =>
      gs.sortBy(_.getAs[Long]("row_group_id")).sliding(2).exists {
        case Array(a, b) => a.getAs[Long]("max_key") > b.getAs[Long]("min_key")
        case _ => false
      }
    }
    assert(overlaps,
      "hash-ordered data must produce overlapping spans — else the " +
        "sorted-write disjointness test proves nothing")
  }

  test("IO19: the encoding audit shows dictionaries where they belong") {
    val rows = RowGroups.encodingAudit(spark,
      RowGroups.sortedDir(spark, sf)).collect()
    assert(rows.nonEmpty)
    // low-cardinality columns must actually dictionary-encode
    val flags = rows.filter(_.getAs[String]("column") == "l_returnflag")
    assert(flags.nonEmpty &&
      flags.forall(_.getAs[String]("encodings").contains("DICTIONARY")),
      "a 3-value string column must dictionary-encode")
    rows.foreach { r =>
      assert(r.getAs[Long]("compressed_bytes") > 0)
      assert(r.getAs[Long]("n_values") > 0)
    }
    // per row group, every column chunk carries the same value count
    rows.groupBy(r => (r.getAs[String]("file"),
      r.getAs[Long]("row_group_id"))).foreach { case (_, cs) =>
      assert(cs.map(_.getAs[Long]("n_values")).toSet.size === 1)
    }
  }

  test("IO22: page spans tile ascending within every group and conserve rows") {
    val rows = RowGroups.pageIndexAudit(spark,
      RowGroups.pagedDir(spark, sf), RowGroups.KeyCol).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[String]("boundary_order") === "ASCENDING",
      "the sorted layout must declare ascending page boundaries"))
    val byGroup = rows.groupBy(r =>
      (r.getAs[String]("file"), r.getAs[Long]("row_group_id")))
    assert(byGroup.exists(_._2.length >= 2),
      "the 8 KB page fixture must produce several pages per group")
    byGroup.values.foreach { pages =>
      val ordered = pages.sortBy(_.getAs[Long]("page_id"))
      ordered.foreach { r =>
        assert(r.getAs[Long]("min_key") <= r.getAs[Long]("max_key"))
        assert(r.getAs[Long]("n_rows") > 0)
      }
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("min_key") >= a.getAs[Long]("max_key"),
            "sorted pages may touch at a shared key but never overlap")
        case _ =>
      }
    }
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total === graft.Tables.lineitem(spark, sf).count(),
      "page row counts must conserve the table")
  }
}
