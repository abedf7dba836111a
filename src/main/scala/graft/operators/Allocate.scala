package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R151 — largest-remainder apportionment (Hamilton's method): divide
  * an integer sampling budget across strata exactly proportionally to
  * their token mass. D14/D29 sample each row INDEPENDENTLY at a target
  * rate, so realized stratum counts are binomial around the quota;
  * when the contract is an exact integer budget ("exactly 1,000,000
  * sequences, mixture-weighted"), the quotas themselves must be
  * computed: base_s = floor(B·n_s/N), and the B − Σbase leftover slots
  * go to the largest fractional remainders (B·n_s mod N), tie-broken
  * on the stratum key. Guarantees: Σ alloc = B exactly, and every
  * stratum gets floor or ceil of its exact real-valued quota (quota
  * property) — all in BIGINT, so the entry is hash-exact.
  *
  * Scale: one corpus aggregation to the O(#strata) frame; every window
  * below runs on that bounded frame (the R128 convention). B·n_s ≤
  * 1e6 · corpus tokens — BIGINT-safe through petabyte corpora.
  */
object Allocate {

  private val Budget = 1000000L

  val qApportion = QueryDef(
    "q_apportion",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"),
          size(graft.functions.Text.words(col("text"))).cast("long").as("n"))
        .groupBy("source").agg(sum("n").as("n_tokens"))
      val wAll = Window.partitionBy(lit(1))
      val wRank = Window.partitionBy(lit(1))
        .orderBy(desc("rem"), asc("source"))
      toks
        .withColumn("tot", sum("n_tokens").over(wAll))
        // `div` is exact BIGINT division — a double round-trip would
        // lose exactness past 2^53 (petabyte token counts)
        .withColumn("base", expr(s"(${Budget}L * n_tokens) div tot"))
        .withColumn("rem", (lit(Budget) * col("n_tokens")) % col("tot"))
        .withColumn("leftover", lit(Budget) - sum("base").over(wAll))
        .withColumn("rk", row_number().over(wRank))
        .withColumn("alloc",
          col("base") + when(col("rk") <= col("leftover"), lit(1L)).otherwise(lit(0L)))
        .select(col("source"), col("n_tokens"), col("base"), col("rem"),
          col("alloc"))
        .orderBy("source")
    },
    Some(s"""WITH toks AS (
               SELECT source,
                      SUM(len(string_split(${graft.dedup.PipelineQueries.oCanon}, ' ')))
                        AS n_tokens
               FROM documents GROUP BY 1),
             q AS (SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
                     CAST(SUM(n_tokens) OVER () AS BIGINT) AS tot
                   FROM toks),
             b AS (SELECT *,
                     (${Budget} * n_tokens) // tot AS base,
                     (${Budget} * n_tokens) % tot AS rem
                   FROM q),
             l AS (SELECT *,
                     ${Budget} - CAST(SUM(base) OVER () AS BIGINT) AS leftover,
                     row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
                   FROM b)
             SELECT source, n_tokens, CAST(base AS BIGINT) AS base,
                    CAST(rem AS BIGINT) AS rem,
                    CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
                      AS alloc
             FROM l ORDER BY source"""))

  val all: Seq[QueryDef] = Seq(qApportion)
}
