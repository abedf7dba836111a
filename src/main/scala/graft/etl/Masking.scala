package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E42 — POLICY-driven dynamic data masking: a (column → mask-kind)
  * policy table applied mechanically to any frame — the governance
  * layer that serves the SAME table differently per audience, where
  * E33's pseudonymization is one fixed transform of one column. Mask
  * kinds: `last4` (partial reveal — length and tail preserved, the
  * call-center view), `nullify` (typed NULL — the column exists,
  * the value doesn't), `hash8` (deterministic 8-hex token — group-bys
  * and joins keep working, values don't leak), and absent-from-policy
  * columns pass through untouched. Unknown kinds fail LOUDLY at plan
  * build — a silently ignored masking rule is a data breach, not a
  * default.
  *
  * Scale shape: masking is a pure projection (map-side, codegen'd,
  * zero shuffles); the policy is O(schema) driver metadata by
  * construction. */
object Masking {

  /** Build the masked projection for `df` under `policy`
    * (column → kind). */
  def applyPolicy(df: DataFrame, policy: Map[String, String]): DataFrame = {
    val unknown = policy.collect {
      case (c, k) if !Set("last4", "nullify", "hash8").contains(k) => s"$c:$k"
    }
    require(unknown.isEmpty, s"unknown mask kinds: ${unknown.mkString(", ")}")
    val missing = policy.keySet -- df.columns.toSet
    require(missing.isEmpty, s"policy names absent columns: $missing")
    val cols: Seq[Column] = df.schema.fields.toSeq.map { f =>
      policy.get(f.name) match {
        case Some("last4") =>
          expr(s"concat(repeat('*', greatest(length(${f.name}) - 4, 0)), " +
            s"substring(${f.name}, greatest(length(${f.name}) - 3, 1)))")
            .as(f.name)
        case Some("nullify") => lit(null).cast(f.dataType).as(f.name)
        case Some("hash8") => expr(s"substring(md5(${f.name}), 1, 8)")
          .as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols: _*)
  }

  private val CustomerPolicy = Map(
    "c_name" -> "last4",
    "c_acctbal" -> "nullify",
    "c_mktsegment" -> "hash8")

  val qMaskingPolicy = QueryDef(
    "etl_masking_policy",
    (s, d) => applyPolicy(Tables.customer(s, d), CustomerPolicy)
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
                   repeat('*', greatest(strlen(c_name) - 4, 0))
                     || substr(c_name, greatest(strlen(c_name) - 3, 1))
                     AS c_name,
                   c_nationkey,
                   CAST(NULL AS DOUBLE) AS c_acctbal,
                   substr(md5(c_mktsegment), 1, 8) AS c_mktsegment
            FROM customer ORDER BY c_custkey"""))

  val all: Seq[QueryDef] = Seq(qMaskingPolicy)
}
