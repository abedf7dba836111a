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
  /** events.parquet's `ts` physical type has varied across testdata
    * generations — TIMESTAMP(NANOS) (surfaced as BIGINT nanos via
    * spark.sql.legacy.parquet.nanosAsLong, see [[Sessions.local]]),
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (surfaced as
    * TIMESTAMP_NTZ), or a plain session-zone timestamp. Normalize all
    * three to TimestampType here so every downstream operator sees one
    * schema. The session timezone is pinned to UTC, so the NTZ→LTZ cast
    * is instant-preserving, and the nanos path uses integer `div` (no
    * double round-trip — ns epoch values exceed 2^53).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
