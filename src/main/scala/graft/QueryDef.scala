package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One coverage-checklist entry from SURVEY.md §2: a named Spark query
  * plus (when SQL-expressible) the equivalent ANSI SQL the driver runs
  * in DuckDB against the same parquet tables.
  *
  * `oracle` is BY-NAME (captured as a thunk, re-rendered on every
  * access): fixture-oracle SQL interpolates per-process scratch paths
  * (e.g. PipelineQueries' signature fixtures) that are only known
  * AFTER the entry ran, so the SQL must render at dump time — Verify
  * reads `SparkEntry.oracleSql` after running every query. A cached
  * construction-time string would point a second dataset's oracle at
  * the first dataset's fixtures (r11 ADVICE item 5).
  */
final class QueryDef(
    val name: String,
    val fn: (SparkSession, String) => DataFrame,
    oracleThunk: () => Option[String]) {
  def oracle: Option[String] = oracleThunk()
}

object QueryDef {
  def apply(name: String, fn: (SparkSession, String) => DataFrame,
      oracle: => Option[String] = None): QueryDef =
    new QueryDef(name, fn, () => oracle)

  /** Collect a module's QueryDefs into the SparkEntry map shapes. */
  def queryMap(defs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap
  def oracleMap(defs: Seq[QueryDef]): Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
