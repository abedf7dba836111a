package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TPC-H-ish star schema
  * plus events/documents/embeddings). All reads are plain parquet scans
  * so Catalyst can push filters/projections into the file source.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    * parquet reader rejects; the session (see [[Sessions.local]]) sets
    * spark.sql.legacy.parquet.nanosAsLong so ts arrives as a long,
    * truncated here to the microsecond precision Spark timestamps
    * carry (integer `div`, no double round-trip — ns epoch values
    * exceed 2^53).
    */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
