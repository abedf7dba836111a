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
  *
  * The thunk receives the dataset dir THIS entry's `fn` last ran on —
  * tracked per entry, not process-globally: a global "last dir" made
  * oracle rendering depend on whichever OTHER entry ran most recently,
  * so a process running entries over dataset A then B and dumping A's
  * oracleSql afterwards pointed A's oracle at B's fixture base (r12
  * ADVICE item 5). Plain (dir-independent) oracles ignore the value.
  */
final class QueryDef(
    val name: String,
    fn0: (SparkSession, String) => DataFrame,
    oracleThunk: String => Option[String]) {
  val fn: (SparkSession, String) => DataFrame =
    (s, d) => { QueryDef.lastDirByName.put(name, d); fn0(s, d) }
  def oracle: Option[String] =
    oracleThunk(QueryDef.lastDirByName.getOrDefault(name, QueryDef.DefaultDir))
}

object QueryDef {
  /** Fallback dataset dir for oracles rendered before their entry ever
    * ran in this process (dev-loop inspection only — Verify always runs
    * every dumped entry first). */
  val DefaultDir = "/root/testdata/sf0.01"

  /** Last dataset dir each ENTRY's fn ran on, keyed by entry name:
    * module `all`s and `SparkEntry.allDefs` are defs, so the QueryDef
    * INSTANCE that ran the query and the one whose oracle is dumped
    * are generally different objects — name-keyed state is what makes
    * "the dir this entry last received" survive re-construction. */
  private val lastDirByName =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def apply(name: String, fn: (SparkSession, String) => DataFrame,
      oracle: => Option[String] = None): QueryDef =
    new QueryDef(name, fn, _ => oracle)

  /** A fixture-oracle entry: the SQL interpolates per-dataset fixture
    * paths, so it renders against the dir the entry's fn last received. */
  def dirOracle(name: String, fn: (SparkSession, String) => DataFrame,
      oracle: String => String): QueryDef =
    new QueryDef(name, fn, dir => Some(oracle(dir)))

  /** Collect a module's QueryDefs into the SparkEntry map shapes. */
  def queryMap(defs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap
  def oracleMap(defs: Seq[QueryDef]): Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
