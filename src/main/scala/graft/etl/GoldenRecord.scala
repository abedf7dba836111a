package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E45 — golden-record survivorship (field-level merge): after E30/D15
  * decide WHICH rows are the same entity, survivorship decides what the
  * single surviving ("golden") row SAYS — per field, by a field-specific
  * rule. E30's linkage and D66's keeper selection pick one whole ROW;
  * real MDM merges FIELD-WISE: the best name may come from source A and
  * the freshest balance from source B. Rules implemented (the standard
  * MDM set):
  *
  *   - `name`    — most frequent value (mode); ties break to the
  *                 lexicographically smallest (min(struct(-n, v)))
  *   - `segment` — most frequent NON-NULL value; all-null → NULL
  *   - `acctbal` — latest non-null by version (recency rule)
  *   - `display` — longest value; ties to the lexicographically largest
  *
  * The multi-version feed derives DETERMINISTICALLY from the customer
  * table (the E30 dirty-feed discipline — the truth is known, so the
  * oracle can verify every field): 3 versions per customer, v2 upcases
  * the name (mode still = the original, 2 votes to 1), segment is NULL
  * on v3 and for custkey≡0 (mod 7) on every version (the all-null
  * path), acctbal gains +v with v3 nulled for custkey≡0 (mod 4)
  * (latest-non-null ≠ latest), display gets a suffix only on v1 (the
  * longest rule must reach back to the oldest version).
  *
  * Scale: mode rules need (key, value) counts — one aggregation each,
  * partial-aggregable (never a per-key window over raw versions);
  * recency/longest rules ride ONE key aggregation via null-safe
  * struct-max. All joins are on the entity key; per-key version counts
  * are bounded by the source count (a data-model constant).
  */
object GoldenRecord {

  /** The deterministic 3-version dirty feed. */
  private def feed(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val versions = Seq(1, 2, 3).map { v =>
      c.select(
        col("c_custkey").as("key"),
        lit(v).as("v"),
        (if (v == 2) upper(col("c_name")) else col("c_name")).as("name"),
        when(col("c_custkey") % 7 === 0 || lit(v) === 3, lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("segment"),
        when(lit(v) === 3 && col("c_custkey") % 4 === 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal") + v).as("bal"),
        (if (v == 1) concat(col("c_name"), lit(" #"), col("c_custkey"))
         else col("c_name")).as("display"))
    }
    versions.reduce(_ unionAll _)
  }

  /** SQL mirror of [[feed]] for the oracle. */
  private val oFeed =
    """SELECT c_custkey AS key, v,
              CASE WHEN v = 2 THEN upper(c_name) ELSE c_name END AS name,
              CASE WHEN c_custkey % 7 = 0 OR v = 3 THEN NULL
                   ELSE c_mktsegment END AS segment,
              CASE WHEN v = 3 AND c_custkey % 4 = 0 THEN NULL
                   ELSE c_acctbal + v END AS bal,
              CASE WHEN v = 1 THEN c_name || ' #' || c_custkey
                   ELSE c_name END AS display
       FROM customer, UNNEST([1, 2, 3]) AS t(v)"""

  val etlGoldenRecord = QueryDef(
    "etl_golden_record",
    (s, d) => {
      val f = feed(s, d)
      // mode(name): (key, value) counts, then argmax by (n desc, value asc)
      val nameMode = f.groupBy("key", "name").agg(count(lit(1)).as("n"))
        .groupBy("key")
        .agg(min(struct((col("n") * -1).as("neg"), col("name").as("v"))).as("m"))
        .select(col("key"), col("m.v").as("golden_name"),
          (col("m.neg") * -1).as("name_votes"))
      // most-frequent NON-NULL segment; keys with no non-null votes drop
      // out of this aggregate and re-enter NULL through the left join
      val segMode = f.filter(col("segment").isNotNull)
        .groupBy("key", "segment").agg(count(lit(1)).as("n"))
        .groupBy("key")
        .agg(min(struct((col("n") * -1).as("neg"), col("segment").as("v"))).as("m"))
        .select(col("key"), col("m.v").as("golden_segment"))
      // recency + longest ride one key aggregation (null-safe struct max)
      val direct = f.groupBy("key").agg(
        max(when(col("bal").isNotNull, struct(col("v"), col("bal").as("b"))))
          .as("latest"),
        max(struct(length(col("display")).as("len"), col("display").as("v")))
          .as("longest"))
        .select(col("key"), col("latest.b").as("golden_bal"),
          col("longest.v").as("golden_display"))
      nameMode
        .join(segMode, Seq("key"), "left")
        .join(direct, Seq("key"))
        .select(col("key"), col("golden_name"), col("name_votes"),
          col("golden_segment"), col("golden_bal"), col("golden_display"))
        .orderBy("key")
    },
    Some(s"""WITH feed AS ($oFeed),
             nm AS (SELECT key, name, CAST(count(*) AS BIGINT) AS n
                    FROM feed GROUP BY 1, 2),
             nr AS (SELECT key, name AS golden_name, n AS name_votes,
                      row_number() OVER (PARTITION BY key
                                         ORDER BY n DESC, name ASC) AS rk
                    FROM nm),
             sm AS (SELECT key, segment, count(*) AS n
                    FROM feed WHERE segment IS NOT NULL GROUP BY 1, 2),
             sr AS (SELECT key, segment AS golden_segment,
                      row_number() OVER (PARTITION BY key
                                         ORDER BY n DESC, segment ASC) AS rk
                    FROM sm),
             balr AS (SELECT key,
                        arg_max(bal, v) FILTER (WHERE bal IS NOT NULL)
                          AS golden_bal
                      FROM feed GROUP BY 1),
             dr AS (SELECT key, display AS golden_display,
                      row_number() OVER (PARTITION BY key
                                         ORDER BY length(display) DESC,
                                                  display DESC) AS rk
                    FROM feed)
             SELECT nr.key, nr.golden_name, nr.name_votes,
                    sr.golden_segment, balr.golden_bal, dr.golden_display
             FROM nr
             LEFT JOIN sr ON nr.key = sr.key AND sr.rk = 1
             JOIN balr ON nr.key = balr.key
             JOIN dr ON nr.key = dr.key AND dr.rk = 1
             WHERE nr.rk = 1
             ORDER BY nr.key"""))

  val all: Seq[QueryDef] = Seq(etlGoldenRecord)
}
