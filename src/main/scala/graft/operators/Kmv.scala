package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R82 — KMV (k-minimum-values) set sketches with a TRUE intersection
  * estimator. The R40/R58 HLL entries get unions natively but derive
  * intersections by inclusion–exclusion, inheriting the union's
  * absolute error; the KMV estimator works directly on the merged
  * bottom-k: J ≈ |{h ∈ K(A∪B)} ∩ K(A) ∩ K(B)| / k. Because the
  * "randomness" is md5 (engine-reproducible, the D13 discipline) and
  * the estimate is a ratio of INTEGER counts, the whole entry — the
  * sketch, the estimator, and the exact baseline it self-reports —
  * is hash-exact across engines with no floating point anywhere.
  *
  * Audience overlap between event types: per-type sketches are
  * bottom-k windows over the (type, user-hash) distinct frame (the
  * per-type partition bounds every window), pair frames are joins of
  * O(types)² × k sketch rows — at 100 TB the sketches are the stored
  * artifact and pairwise overlap never re-touches raw events. */
object Kmv {

  val K = 64

  val qKmvJaccard = QueryDef(
    "q_kmv_jaccard",
    (s, d) => {
      // localCheckpoint: the (type, user) distinct frame feeds five
      // consumers (sketch, sizes, types, both exact-intersection
      // aliases) — without pinning each re-runs the events distinct
      // from the scan. Cluster deployments swap a reliable checkpoint
      // dir, as everywhere this pattern appears.
      val users = Tables.events(s, d)
        .select(col("event_type").as("t"), col("user_id")).distinct()
        .withColumn("h",
          substring(md5(col("user_id").cast("string").cast("binary")),
            1, 15))
        .localCheckpoint()
      val sk = users.select("t", "h").distinct()
        .withColumn("rn",
          row_number().over(Window.partitionBy("t").orderBy("h")))
        .filter(col("rn") <= K).select("t", "h")
      val sizes = users.groupBy("t").agg(count(lit(1)).as("sz"))
      val types = users.select("t").distinct()
      val pairs = types.select(col("t").as("t1"))
        .join(types.select(col("t").as("t2")), col("t1") < col("t2"))
      val sa = pairs.join(sk.withColumnRenamed("t", "t1"), "t1")
        .select(col("t1"), col("t2"), col("h"),
          lit(1L).as("ina"), lit(0L).as("inb"))
      val sb = pairs.join(sk.withColumnRenamed("t", "t2"), "t2")
        .select(col("t1"), col("t2"), col("h"),
          lit(0L).as("ina"), lit(1L).as("inb"))
      val merged = sa.union(sb).groupBy("t1", "t2", "h")
        .agg(max("ina").as("ina"), max("inb").as("inb"))
      val est = merged
        .withColumn("rn", row_number().over(
          Window.partitionBy("t1", "t2").orderBy("h")))
        .filter(col("rn") <= K)
        .groupBy("t1", "t2")
        .agg(count(lit(1)).as("k_used"),
          sum(col("ina") * col("inb")).as("matches"))
      val inter = users.select(col("t").as("t1"), col("user_id"))
        .join(users.select(col("t").as("t2"), col("user_id")), "user_id")
        .filter(col("t1") < col("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("exact_inter"))
      est.join(inter, Seq("t1", "t2"))
        .join(sizes.select(col("t").as("t1"), col("sz").as("s1")), "t1")
        .join(sizes.select(col("t").as("t2"), col("sz").as("s2")), "t2")
        .select(col("t1"), col("t2"), col("k_used"), col("matches"),
          expr("(matches * 1000000) div k_used").as("est_q"),
          col("exact_inter"),
          (col("s1") + col("s2") - col("exact_inter")).as("exact_union"),
          expr("(exact_inter * 1000000) div "
            + "(s1 + s2 - exact_inter)").as("exact_q"),
          abs(expr("(matches * 1000000) div k_used")
            - expr("(exact_inter * 1000000) div (s1 + s2 - exact_inter)"))
            .as("err_q"))
        .orderBy("t1", "t2")
    },
    Some(s"""WITH users AS (SELECT DISTINCT event_type AS t, user_id
                            FROM events),
             uh AS (SELECT t, user_id,
                      substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS h
                    FROM users),
             sk AS (SELECT t, h FROM (
                      SELECT t, h, row_number() OVER (PARTITION BY t
                        ORDER BY h) AS rn
                      FROM (SELECT DISTINCT t, h FROM uh))
                    WHERE rn <= $K),
             sizes AS (SELECT t, CAST(count(*) AS BIGINT) AS sz
                       FROM uh GROUP BY 1),
             ty AS (SELECT DISTINCT t FROM uh),
             pairs AS (SELECT a.t AS t1, b.t AS t2 FROM ty a, ty b
                       WHERE a.t < b.t),
             m AS (SELECT p.t1, p.t2, s.h,
                     MAX(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS ina,
                     MAX(CASE WHEN src = 2 THEN 1 ELSE 0 END) AS inb
                   FROM pairs p JOIN (
                     SELECT t, h, 1 AS src FROM sk
                     UNION ALL SELECT t, h, 2 FROM sk) s
                     ON (s.src = 1 AND s.t = p.t1)
                       OR (s.src = 2 AND s.t = p.t2)
                   GROUP BY 1, 2, 3),
             km AS (SELECT * FROM (
                      SELECT *, row_number() OVER (PARTITION BY t1, t2
                        ORDER BY h) AS rn FROM m)
                    WHERE rn <= $K),
             est AS (SELECT t1, t2, CAST(count(*) AS BIGINT) AS k_used,
                       CAST(SUM(ina * inb) AS BIGINT) AS matches
                     FROM km GROUP BY 1, 2),
             inter AS (SELECT a.t AS t1, b.t AS t2,
                         CAST(count(*) AS BIGINT) AS exact_inter
                       FROM uh a JOIN uh b ON a.user_id = b.user_id
                         AND a.t < b.t
                       GROUP BY 1, 2)
             SELECT est.t1, est.t2, k_used, matches,
                    CAST((matches * 1000000) // k_used AS BIGINT) AS est_q,
                    exact_inter,
                    CAST(s1.sz + s2.sz - exact_inter AS BIGINT)
                      AS exact_union,
                    CAST((exact_inter * 1000000)
                      // (s1.sz + s2.sz - exact_inter) AS BIGINT)
                      AS exact_q,
                    abs(CAST((matches * 1000000) // k_used AS BIGINT)
                      - CAST((exact_inter * 1000000)
                        // (s1.sz + s2.sz - exact_inter) AS BIGINT))
                      AS err_q
             FROM est
             JOIN inter ON est.t1 = inter.t1 AND est.t2 = inter.t2
             JOIN sizes s1 ON est.t1 = s1.t
             JOIN sizes s2 ON est.t2 = s2.t
             ORDER BY est.t1, est.t2"""))

  def all: Seq[QueryDef] = Seq(qKmvJaccard)
}
