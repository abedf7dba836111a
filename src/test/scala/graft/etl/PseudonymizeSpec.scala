package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E33 — the three pseudonymization properties (values are
  * oracle-gated; these gates are the semantic guarantees). */
class PseudonymizeSpec extends SparkSpec {

  test("E33: tokens are deterministic and preserve join/group semantics") {
    val a = Pseudonymize.etlPseudonymize.fn(spark, sf).collect()
    val b = Pseudonymize.etlPseudonymize.fn(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
      "re-running with the same key must emit identical tokens")
    // aggregation over the pseudonym equals aggregation over the clear key
    val clear = graft.Tables.customer(spark, sf)
      .join(graft.Tables.orders(spark, sf),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n"))
      .collect().map(_.getAs[Long]("n")).sorted.toSeq
    val tok = a.map(_.getAs[Long]("n_orders")).sorted.toSeq
    assert(tok === clear,
      "per-token order counts must be the per-customer counts, relabeled")
  }

  test("E33: domain separation — the same value tokenizes differently per column") {
    // c_custkey is tokenized under 'cust_key'; tokenize the same strings
    // under the name domain and assert zero collisions
    val df = graft.Tables.customer(spark, sf)
      .select(
        substring(sha2(concat(lit("cust_key"), lit("|"),
          lit("demo-secret-k1"), lit("|"),
          col("c_custkey").cast("string")), 256), 1, 16).as("t1"),
        substring(sha2(concat(lit("cust_name"), lit("|"),
          lit("demo-secret-k1"), lit("|"),
          col("c_custkey").cast("string")), 256), 1, 16).as("t2"))
    assert(df.filter(col("t1") === col("t2")).count() === 0)
  }

  test("E33: no clear PII value survives into the output") {
    val out = Pseudonymize.etlPseudonymize.fn(spark, sf)
    assert(!out.columns.contains("c_name") && !out.columns.contains("c_custkey"))
    val names = graft.Tables.customer(spark, sf)
      .select("c_name").collect().map(_.getString(0)).toSet
    val cells = out.collect().flatMap(r =>
      Seq(r.getAs[String]("name_token"), r.getAs[String]("key_token")))
    assert(cells.forall(c => !names.contains(c)))
  }
}
