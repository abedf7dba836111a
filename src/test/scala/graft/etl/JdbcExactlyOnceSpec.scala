package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S29 — exactly-once JDBC append via the in-transaction batch
  * ledger: commit-once, replay-skip, torn-write-invisible. */
class JdbcExactlyOnceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:s29db;create=true"

  private def readTable(t: String) =
    spark.read.format("jdbc").option("url", url).option("dbtable", t).load()

  test("S29: appends commit once, replays skip, new batches accumulate") {
    import spark.implicits._
    val b0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .repartition(2)
    JdbcSink.appendExactlyOnce(b0, url, "s29_data", "s29_ledger", 0L)
    assert(readTable("s29_data").count() === 3)

    // a full replay of the SAME batch id must be a no-op
    JdbcSink.appendExactlyOnce(b0, url, "s29_data", "s29_ledger", 0L)
    assert(readTable("s29_data").count() === 3,
      "replaying a committed batch must not duplicate rows")

    // the next batch id appends
    val b1 = Seq((4L, "d")).toDF("id", "v")
    JdbcSink.appendExactlyOnce(b1, url, "s29_data", "s29_ledger", 1L)
    assert(readTable("s29_data").count() === 4)
    // ledger carries one row per (batch, partition) with exact counts
    val ledger = readTable("s29_ledger").collect()
      .map(r => (r.getAs[Long]("BATCH_ID"), r.getAs[Long]("N_ROWS")))
    assert(ledger.filter(_._1 == 0L).map(_._2).sum === 3L)
    assert(ledger.filter(_._1 == 1L).map(_._2).sum === 1L)
  }

  test("S29: a mid-partition failure leaves NOTHING — then the retry lands once") {
    import spark.implicits._
    // a row that detonates during evaluation (ANSI division by zero)
    // AFTER some good rows have been batched in the same partition
    val poisoned = Seq((10L, 1L), (11L, 1L), (12L, 0L)).toDF("id", "d")
      .coalesce(1)
      .select(col("id"), (lit(10L) / col("d")).cast("long").as("v"))
    intercept[Throwable] {
      JdbcSink.appendExactlyOnce(poisoned, url, "s29_torn", "s29_tl", 7L)
    }
    assert(readTable("s29_torn").count() === 0,
      "the single transaction must roll the partial batch back")
    assert(readTable("s29_tl").filter(col("BATCH_ID") === 7L).count() === 0,
      "no ledger row may survive a failed partition")
    // the corrected retry under the SAME batch id commits exactly once
    val fixed = Seq((10L, 10L), (11L, 10L), (12L, 0L)).toDF("id", "v")
      .coalesce(1)
    JdbcSink.appendExactlyOnce(fixed, url, "s29_torn", "s29_tl", 7L)
    assert(readTable("s29_torn").count() === 3)
  }
}
