package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IO15 / R52 — bucketed (sort-merge-bucket) co-located join: both
  * fact tables are WRITTEN pre-hashed into the same number of buckets
  * on the join key (`bucketBy` + `sortBy`), so the join reads
  * bucket-aligned files and needs NO shuffle at all — the single
  * biggest exchange a warehouse can delete. At 100 TB this is the
  * difference between a fact⋈fact join that moves both tables over
  * the network every run and one that never moves either: the shuffle
  * is paid ONCE at write time and amortized over every subsequent
  * join, which is why every serious warehouse buckets its largest
  * fact tables on their join spine.
  *
  * The bucketed tables are a stored fixture (pid-scoped names in the
  * /tmp warehouse, built once per process — the D37/D51 convention):
  * Bench times the co-located join, not the one-time bucketing write.
  * BucketedSpec proves the plan property that is the entire point:
  * ZERO exchanges below the join (vs ≥2 for the plain-parquet shape)
  * — and the oracle proves bucketing changed nothing semantically.
  */
object Bucketed {

  val NumBuckets = 8

  private val built =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Bucketed copies of orders/lineitem on the orderkey spine. The
    * memo key carries the SparkContext's applicationId, not just the
    * pid: catalog tables die with their context, and a process that
    * stops one context and starts another (ClusterCheck's sequential
    * local[n] → local-cluster phases) would otherwise skip the rebuild
    * and hit TABLE_OR_VIEW_NOT_FOUND. */
  def ensureTables(s: SparkSession, dir: String): (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    val (ot, lt) = (s"orders_bkt_$tag", s"lineitem_bkt_$tag")
    if (built.add(tag)) {
      Tables.orders(s, dir).write
        .bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(ot)
      Tables.lineitem(s, dir).write
        .bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(lt)
    }
    (ot, lt)
  }

  /** The joined aggregate over the bucketed tables. Exposed for the
    * spec's plan asserts. */
  def joinAgg(s: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = ensureTables(s, dir)
    // MERGE hint: at toy scale AQE would broadcast the dimension-sized
    // side and never exercise the bucket alignment; at 100 TB neither
    // fact side broadcasts and SMJ-over-buckets IS the plan — the hint
    // makes the entry demonstrate that plan at every scale factor
    s.table(lt).hint("merge").join(s.table(ot),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity").cast("decimal(38,6)")), 4)
          .cast("double").as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  val qBucketedJoin = QueryDef(
    "q_bucketed_join",
    (s, d) => joinAgg(s, d),
    Some("""SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,6))), 4)
                     AS DOUBLE) AS sum_qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority"""))

  val all: Seq[QueryDef] = Seq(qBucketedJoin)
}
