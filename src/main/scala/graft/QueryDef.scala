package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One coverage-checklist entry from SURVEY.md §2: a named Spark query
  * plus (when SQL-expressible) the equivalent ANSI SQL the driver runs
  * in DuckDB against the same parquet tables.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  /** Collect a module's QueryDefs into the SparkEntry map shapes. */
  def queryMap(defs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap
  def oracleMap(defs: Seq[QueryDef]): Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
