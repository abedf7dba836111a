package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** R79 — pre-join skew / output-explosion diagnostics: the planning
  * readout an engineer (or an advisor rule) consults BEFORE running a
  * large join, answering "will this key distribution drown a reducer,
  * and how big is the output really". The repo's salting (R24) and
  * AQE skew-split defenses are cures; this is the diagnosis that says
  * where and whether to apply them.
  */
object Diagnose {

  val TopKeys = 10

  /** Per-key multiplicities of the join key, the self-join output
    * estimate Σ n², and each hot key's share of it. Everything after
    * the one key-count aggregation is O(distinct keys); the total
    * rides a 1-row broadcast. At 100 TB this replaces the
    * run-it-and-see OOM with a one-scan estimate — the hot-key list
    * is exactly the salting allowlist R24 wants. */
  val qJoinExplosion = QueryDef(
    "q_join_explosion",
    (s, d) => {
      val per = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey").as("key"))
        .agg(count(lit(1)).as("na"))
      val tot = per.agg(sum(col("na") * col("na")).as("total_est"),
        count(lit(1)).as("n_keys"), max("na").as("max_na"))
      per.crossJoin(broadcast(tot))
        .select(col("key"), col("na"),
          (col("na") * col("na")).as("est_rows"),
          expr("(na * na * 1000000) div total_est").as("pct_q"),
          col("n_keys"), col("max_na"))
        .orderBy(desc("est_rows"), asc("key"))
        .limit(TopKeys)
    },
    Some(s"""WITH per AS (SELECT l_suppkey AS key,
                            CAST(count(*) AS BIGINT) AS na
                          FROM lineitem GROUP BY 1),
             tot AS (SELECT CAST(SUM(na * na) AS BIGINT) AS total_est,
                       CAST(count(*) AS BIGINT) AS n_keys,
                       CAST(MAX(na) AS BIGINT) AS max_na
                     FROM per)
             SELECT key, na, na * na AS est_rows,
                    CAST((na * na * 1000000) // total_est AS BIGINT)
                      AS pct_q,
                    n_keys, max_na
             FROM per CROSS JOIN tot
             ORDER BY est_rows DESC, key LIMIT $TopKeys"""))

  def all: Seq[QueryDef] = Seq(qJoinExplosion)
}
