package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R102 — spatial nearest-within-radius join where BOTH point sets are
  * sf-proportional (customers × suppliers): the two-big-sides
  * complement of E27's broadcast-dim nearest. The naive plan is a
  * cartesian with a distance residual; the scale shape is GRID
  * BLOCKING: quantize the plane into cells of side exactly R, explode
  * the one side into its 3×3 cell neighborhood, equi-join on the cell
  * id, filter dist² ≤ R² and reduce with the E27 struct-min argmin.
  * Any point within R of a probe differs by < R per axis, so it lies
  * in the probe's 3×3 neighborhood — the blocking is EXACT for the
  * within-radius semantics (unbounded global-nearest would need
  * iterative ring expansion; "nearest within R, else null" is the
  * bounded contract real matching jobs use).
  *
  * Coordinates are the synthetic deterministic integer grid (key-mod
  * arithmetic like the ZipEtl enrichment stub, kept NON-NEGATIVE so
  * Spark's truncating `div` and DuckDB's flooring `//` can never
  * disagree); distance is exact-BIGINT squared Euclidean, so the
  * argmin and tiebreak are bit-identical cross-engine.
  */
object SpatialJoin {

  /** Radius in grid hundredths; cell side = R. */
  val R = 1000L

  private def cellJoinCond = col("gx") === col("cgx") && col("gy") === col("cgy")

  /** Nearest supplier within R per customer (null when none): the 3×3
    * neighborhood explode rides the supplier side (9× fan-out of the
    * smaller-but-still-scaling side); the join is a plain hash
    * equi-join on the cell id — shuffle-partitionable and
    * AQE-skew-splittable — and the argmin is the partial-aggregable
    * min(struct), never a window over candidate pairs. */
  /** Core grid join over prepared point frames: probes (key, la, lo)
    * get the nearest candidate (ckey, cla, clo) within `r`, or null.
    * Non-negative coordinates required (div-semantics note above). */
  def nearestWithin(probes: DataFrame, candidates: DataFrame,
      r: Long): DataFrame = {
    val c = probes
      .withColumn("gx", expr(s"la div $r"))
      .withColumn("gy", expr(s"lo div $r"))
    val sup = candidates
      .withColumn("n", explode(expr(
        s"transform(sequence(0, 8), i -> struct(" +
          s"cla div $r + i div 3 - 1 AS cgx, clo div $r + i % 3 - 1 AS cgy))")))
      .select(col("ckey"), col("cla"), col("clo"),
        col("n.cgx").as("cgx"), col("n.cgy").as("cgy"))
    val dla = col("la") - col("cla")
    val dlo = col("lo") - col("clo")
    val matched = c.join(sup, cellJoinCond)
      .withColumn("dist2", dla * dla + dlo * dlo)
      .filter(col("dist2") <= r * r)
      .groupBy(col("key").as("k"))
      .agg(min(struct(col("dist2"), col("ckey"))).as("nearest"))
      .select(col("k"), col("nearest.ckey").as("nearest_key"),
        col("nearest.dist2").as("dist2"))
    probes.select("key")
      .join(matched, col("key") === col("k"), "left")
      .select(col("key"), col("nearest_key"), col("dist2"))
      .orderBy("key")
  }

  def nearestWithinRadius(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_custkey").as("key"),
      (col("c_custkey") * 7919L % 18000L).as("la"),
      (col("c_custkey") * 104729L % 36000L).as("lo"))
    val sup = Tables.supplier(s, d).select(col("s_suppkey").as("ckey"),
      (col("s_suppkey") * 6133L % 18000L).as("cla"),
      (col("s_suppkey") * 31393L % 36000L).as("clo"))
    nearestWithin(c, sup, R)
      .select(col("key").as("c_custkey"),
        col("nearest_key").as("nearest_suppkey"), col("dist2"))
  }

  /** The oracle is the DIRECT theta join (an independent formulation —
    * DuckDB evaluates the distance predicate without any blocking), so
    * what the grid join is verified against is exactly the semantics
    * the blocking claims to preserve. */
  val qGeoRadiusJoin = QueryDef(
    "q_geo_radius_join",
    (s, d) => nearestWithinRadius(s, d),
    Some(s"""WITH c AS (SELECT c_custkey,
                    c_custkey * 7919 % 18000 AS la,
                    c_custkey * 104729 % 36000 AS lo
                  FROM customer),
             sup AS (SELECT s_suppkey,
                    s_suppkey * 6133 % 18000 AS sla,
                    s_suppkey * 31393 % 36000 AS slo
                  FROM supplier),
             p AS (SELECT c.c_custkey, sup.s_suppkey,
                     (c.la - sup.sla) * (c.la - sup.sla)
                   + (c.lo - sup.slo) * (c.lo - sup.slo) AS dist2
                   FROM c JOIN sup
                     ON (c.la - sup.sla) * (c.la - sup.sla)
                      + (c.lo - sup.slo) * (c.lo - sup.slo) <= ${R * R}),
             r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                      ORDER BY dist2, s_suppkey) AS rn
                   FROM p)
             SELECT c.c_custkey,
                    r.s_suppkey AS nearest_suppkey,
                    CAST(r.dist2 AS BIGINT) AS dist2
             FROM c LEFT JOIN r ON c.c_custkey = r.c_custkey AND r.rn = 1
             ORDER BY c.c_custkey"""))

  val all: Seq[QueryDef] = Seq(qGeoRadiusJoin)
}
