package graft.etl

import org.apache.spark.sql.DataFrame

/** E9/IO4: batched parallel sink. The reference batches rows into
  * PostgreSQL from an ActionBlock (`DataflowProcessor.cs:222-247`,
  * BatchRecordSaveCount=25); in Spark, per-partition batched parallel
  * writes are native to the sink — every partition streams its rows
  * into its own file concurrently. partitionBy gives the directory
  * layout downstream reads prune on (e.g. state_code or a date column),
  * which is the scale-relevant knob.
  */
object Sink {

  /** Partitioned parquet write; maxRecordsPerFile bounds file size the
    * way BatchRecordSaveCount bounds the reference's insert batches. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.write.mode("overwrite")
    val sized = if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile) else w
    (if (partitionCols.nonEmpty) sized.partitionBy(partitionCols: _*) else sized)
      .parquet(path)
  }

  /** Bucketed catalog table: rows hash-partitioned into `buckets` files
    * by `bucketCol` and sorted within each. Two tables bucketed the
    * same way join WITHOUT a shuffle — the co-located-join layout for
    * repeated large joins on a stable key (SURVEY §5); the spec asserts
    * the Exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // the in-memory catalog forgets managed tables across sessions but
    // their warehouse directories persist; a stale location makes
    // saveAsTable fail with LOCATION_ALREADY_EXISTS — clear it when the
    // catalog has no record of the table
    if (!spark.catalog.tableExists(table)) {
      val loc = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(table)).toString))
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }
}
