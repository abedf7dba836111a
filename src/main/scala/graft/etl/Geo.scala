package graft.etl

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E27: spatial nearest-neighbor enrichment — the geometric half of the
  * reference's geocode lookup (`GoogleApiService.cs:66-81` resolves an
  * address to coordinates; the first thing every consumer does with
  * coordinates is "which service center / warehouse / region is this
  * point closest to"). Re-expressed Spark-first:
  *
  *  - centers are a BOUNDED dim (every real deployment's center list
  *    is O(hundreds)) → broadcast; per-point work is a map-side scan
  *    of the center list, the argmin is `min(struct(dist, key))` — a
  *    partial-aggregable one-pass reduction, NOT a per-point window
  *    (a window would shuffle points × centers rows; the struct-min
  *    ships one pre-reduced pair per point per task).
  *  - distance is squared Euclidean on the INTEGER-hundredth
  *    coordinate grid the enrichment stub defines — exact BIGINT
  *    arithmetic, so the argmin (and its tiebreak on center key) is
  *    bit-identical cross-engine where a haversine's sin/cos last-ulp
  *    could fork the hash. The flat metric is documented: at real
  *    scale you swap in haversine and keep the identical plan shape.
  */
object Geo {

  /** Integer-hundredth grid coordinates — the same arithmetic as
    * [[ZipEtl.enrich]]'s latitude/longitude but kept in exact longs
    * (lat·100 + 9000 ∈ [0, 18000), recentered). */
  private def latc = col("zipcode").cast("long") * 7919L % 18000L - 9000L
  private def lonc = col("zipcode").cast("long") * 104729L % 36000L - 18000L

  /** Deterministic bounded center set: zips divisible by 101 (69 rows
    * in the fixture — the O(hundreds) dim-table class). */
  val CenterMod = 101L

  def points(s: SparkSession): DataFrame =
    ZipEtl.dedupeLastWins(ZipEtl.ingest(s))
      .select(
        concat(col("zipcode"), lit("_"), col("state_abbr"))
          .as("composite_key"),
        latc.as("latc"), lonc.as("lonc"),
        (col("zipcode").cast("long") % CenterMod === 0).as("is_center"))

  /** Nearest center per point: broadcast dim scan + one struct-min
    * aggregation. Ties (equal dist2) break on the center key, encoded
    * in the struct ordering itself. */
  def nearestCenter(s: SparkSession): DataFrame = {
    val pts = points(s)
    val centers = pts.filter(col("is_center"))
      .select(col("composite_key").as("center_key"),
        col("latc").as("clatc"), col("lonc").as("clonc"))
    val dla = col("latc") - col("clatc")
    val dlo = col("lonc") - col("clonc")
    pts.crossJoin(broadcast(centers))
      .withColumn("dist2", dla * dla + dlo * dlo)
      .groupBy("composite_key")
      .agg(min(struct(col("dist2"), col("center_key"))).as("nearest"))
      .select(col("composite_key"),
        col("nearest.center_key").as("center_key"),
        col("nearest.dist2").as("dist2"))
  }

  private def oPts =
    s"""pts AS (
       |  SELECT zipcode || '_' || state_abbr AS composite_key,
       |         CAST(zipcode AS BIGINT) * 7919 % 18000 - 9000 AS latc,
       |         CAST(zipcode AS BIGINT) * 104729 % 36000 - 18000 AS lonc,
       |         CAST(zipcode AS BIGINT) % $CenterMod = 0 AS is_center
       |  FROM dedup
       |)""".stripMargin

  /** E27 coverage entry. The oracle derives the argmin independently —
    * a per-point ROW_NUMBER window ordered (dist2, center_key) — so the
    * struct-min reduction is verified against a different formulation
    * of the same semantics. */
  val geoNearest = QueryDef(
    "etl_geo_nearest",
    (s, _) => nearestCenter(s).orderBy("composite_key"),
    Some(s"""WITH ${EtlQueries.oIngest}, ${EtlQueries.oDedup}, $oPts,
             centers AS (
               SELECT composite_key AS center_key, latc AS clatc,
                      lonc AS clonc
               FROM pts WHERE is_center),
             scored AS (
               SELECT p.composite_key, c.center_key,
                      (p.latc - c.clatc) * (p.latc - c.clatc)
                    + (p.lonc - c.clonc) * (p.lonc - c.clonc) AS dist2
               FROM pts p CROSS JOIN centers c),
             r AS (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY composite_key
                        ORDER BY dist2, center_key) AS rn
               FROM scored)
             SELECT composite_key, center_key, CAST(dist2 AS BIGINT) AS dist2
             FROM r WHERE rn = 1 ORDER BY composite_key"""))

  val all: Seq[QueryDef] = Seq(geoNearest)
}
