package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E32 — late-arriving dimension handling (Kimball "inferred
  * members"): facts reference dimension keys the dim feed hasn't
  * delivered yet — dropping the facts loses revenue, stalling the
  * load couples pipelines. The warehouse answer: synthesize a
  * PLACEHOLDER dim row per unknown key (flagged `is_inferred`), load
  * the facts against it, and UPGRADE the placeholder in place when
  * the real row arrives (the E5 key-idempotent upsert — real rows
  * win, so the upgrade is replay-safe and order-free).
  *
  * Shapes: unknown keys come from ONE fact anti join against the dim
  * (key-equi, never a scan per fact); the upgrade is the same keyed
  * merge every dim load already runs — late arrival adds ZERO new
  * operator classes, which is the point of the pattern. */
object LateDim {

  /** Placeholder rows for fact keys absent from the dim. */
  def inferredMembers(facts: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    facts.select(col(key)).distinct()
      .join(dim.select(col(key)), Seq(key), "left_anti")
      .withColumn("c_name", lit("UNKNOWN"))
      .withColumn("is_inferred", lit(true))

  /** The dim with placeholders appended — every fact key resolves. */
  def withInferred(facts: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    dim.withColumn("is_inferred", lit(false))
      .unionByName(inferredMembers(facts, dim, key))

  /** Upgrade: real rows replace placeholders by key (last-wins on the
    * is_inferred flag — real beats inferred deterministically). */
  def upgrade(current: DataFrame, arrivals: DataFrame,
      key: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col("is_inferred").asc, col("c_name"))
    current.unionByName(arrivals.withColumn("is_inferred", lit(false)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Coverage entry: the dim feed is customers with every 7th key held
    * out; the readout is per-flag member counts and the fact coverage
    * each side carries — placeholders must cover EXACTLY the orders of
    * held-out customers, and no order may dangle. */
  val etlLateDim = QueryDef(
    "etl_late_dim",
    (s, d) => {
      val facts = Tables.orders(s, d)
      val dim = Tables.customer(s, d)
        .filter(col("c_custkey") % 7 =!= 0)
        .select("c_custkey", "c_name")
      val full = withInferred(facts.select(col("o_custkey").as("c_custkey")),
        dim, "c_custkey")
      facts.join(full, col("o_custkey") === col("c_custkey"))
        .groupBy("is_inferred")
        .agg(countDistinct(col("c_custkey")).as("n_members"),
          count(lit(1)).as("n_orders"))
        .orderBy("is_inferred")
    },
    Some("""WITH dim AS (SELECT c_custkey, c_name FROM customer
                         WHERE c_custkey % 7 <> 0),
            inferred AS (
              SELECT DISTINCT o_custkey AS c_custkey FROM orders
              WHERE o_custkey NOT IN (SELECT c_custkey FROM dim)),
            dimx AS (
              SELECT c_custkey, FALSE AS is_inferred FROM dim
              UNION ALL
              SELECT c_custkey, TRUE FROM inferred)
            SELECT is_inferred,
                   CAST(count(DISTINCT dimx.c_custkey) AS BIGINT)
                     AS n_members,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders JOIN dimx ON o_custkey = dimx.c_custkey
            GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] = Seq(etlLateDim)
}
