package graft.operators

import graft.{SparkSpec, Tables}
import graft.etl.Sink
import org.apache.spark.sql.functions._

/** Scale-mechanics specs (SURVEY.md §5): salted joins equal their
  * plain equivalents, and same-bucketed tables join shuffle-free. */
class ScaleSpec extends SparkSpec {

  test("salted join equals the plain join and spreads hot keys") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(cust, Seq("o_custkey"))
    val salted = Skew.saltedJoin(orders, cust, "o_custkey")
    assert(salted.count() === plain.count())
    val diff = salted.select("o_custkey", "o_orderkey", "c_name")
      .exceptAll(plain.select("o_custkey", "o_orderkey", "c_name")).count()
    assert(diff === 0)
  }

  test("same-bucketed tables join without a shuffle") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Sink.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Sink.writeBucketed(li, "b_lineitem", "o_orderkey", 8)
    // merge hint: at this tiny sf the planner would broadcast (and
    // bypass bucketing entirely); a sort-merge join is what the layout
    // exists for at scale
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_lineitem"), Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() ===
      orders.join(li, Seq("o_orderkey")).count())
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    import spark.implicits._
    // one hot key carrying ~100× the median partition's bytes; dim too
    // big to broadcast (threshold off), thresholds lowered so the
    // runtime skew split triggers at test scale — at 100 TB the same
    // mechanism fires with the default 256 MB threshold. This is the
    // AUTOMATIC complement to Skew.saltedJoin (R24): AQE handles
    // transient skew at runtime, salting handles the keys you KNOW are
    // hot and need deterministic layout for.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(0, 60000).toDF("i")
        .select(when(col("i") % 3 === 0, 7L).otherwise(col("i")).as("k"),
          concat(lit("payload-padding-to-make-rows-wide-"), col("i")).as("pay"))
      val dim = spark.range(0, 2000).toDF("k")
        .withColumn("dv", concat(lit("dim-"), col("k")))
      val joined = fact.join(dim, Seq("k"))
      // collect() (not count()) so THIS dataset's adaptive plan runs to
      // completion — count() plans its own separate query
      val rows = joined.collect()
      // hot key 7: 20000 remapped + the natural i=7 row = 20001;
      // natural keys in dim range: i ∈ [0,2000), i%3≠0, i≠7 = 1332
      assert(rows.length === 20001 + 1332)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-join split in the final plan:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
