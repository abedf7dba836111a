package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join without an equi key — "points in intervals" (event time
  * in promo window, reading in IP block, value in histogram bin). The
  * naive plan for a range-only predicate is a BroadcastNestedLoopJoin
  * (all-pairs work, broadcast of a whole side): fine when one side is
  * tiny, an instant non-starter when both sides scale.
  *
  * The scale shape is BUCKETING (the same trick Databricks' range-join
  * hint applies): quantize the range dimension into fixed-width
  * buckets, explode each interval into the buckets it covers, tag each
  * point with its single containing bucket, equi-join on the bucket id
  * and post-filter the exact predicate. Work is linear in points +
  * interval spans, and the join is a plain hash/sort-merge equi-join —
  * shuffle-partitionable, AQE-skew-splittable, no broadcast of a
  * scaling side.
  *
  * A point lives in EXACTLY ONE bucket, so each matching (point,
  * interval) pair meets in exactly one bucket — the join needs no
  * dedup, unlike interval-interval bucketing.
  */
object RangeJoin {

  /** Join `points` (timestamp column `tsCol`) to `intervals`
    * ([`startCol`, `endCol`) half-open, both timestamps, end ≥ start)
    * on containment, bucketed at `bucketSeconds` granularity. Pick the
    * bucket near the typical interval width: buckets-per-interval ≈
    * width/bucket + 1 rows of interval fan-out, while a too-fine
    * bucket multiplies the exploded interval side. */
  def bucketed(points: DataFrame, tsCol: String, intervals: DataFrame,
      startCol: String, endCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val bUs = bucketSeconds * 1000000L
    // integer `div`, not `/` (`/` on longs is double division); the
    // cast tolerates TIMESTAMP_NTZ inputs (parquet timestamps without
    // zone) — exact under the engine's fixed UTC session zone
    def us(c: String) = s"unix_micros(cast($c as timestamp))"
    val p = points.withColumn("__bucket", expr(s"${us(tsCol)} div $bUs"))
    val iv = intervals.withColumn("__bucket",
      explode(expr(s"sequence(${us(startCol)} div $bUs, ${us(endCol)} div $bUs)")))
    p.join(iv, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }

  /** R101: interval×interval overlap join, bucketed AND dedup-free.
    * Two overlapping intervals share every bucket their intersection
    * covers, so a naive bucket equi-join emits the pair once per
    * shared bucket — the dedup shuffle the Scaladoc above warns about.
    * The fix costs nothing: a pair's intersection STARTS at
    * max(a.start, b.start), so its first shared bucket is
    * greatest(startBucket_a, startBucket_b) — keeping only the joined
    * bucket that equals that expression emits each overlapping pair
    * EXACTLY once, as a map-side filter on the equi-join output. Work
    * stays linear in total interval spans; the join is a plain
    * shuffle-partitionable hash join (AQE-skew-splittable), never a
    * cartesian.
    *
    * Inputs carry half-open [s_us, e_us) BIGINT microsecond bounds
    * (caller-named via `aPrefix`/`bPrefix`); empty intervals
    * (e ≤ s) are dropped on both sides — ∅ overlaps nothing, and the
    * strict predicate alone would wrongly match an empty interval
    * sitting strictly inside a non-empty one. */
  def intervalOverlap(a: DataFrame, b: DataFrame, bucketSeconds: Long,
      aPrefix: String = "a_", bPrefix: String = "b_"): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val bUs = bucketSeconds * 1000000L
    def prep(df: DataFrame, p: String) =
      df.filter(col(p + "e") > col(p + "s"))
        .withColumn(s"__${p}sb", expr(s"${p}s div $bUs"))
        .withColumn("__bucket",
          explode(expr(s"sequence(${p}s div $bUs, (${p}e - 1) div $bUs)")))
    prep(a, aPrefix).join(prep(b, bPrefix), Seq("__bucket"))
      .filter(col("__bucket") ===
        greatest(col(s"__${aPrefix}sb"), col(s"__${bPrefix}sb")) &&
        col(aPrefix + "s") < col(bPrefix + "e") &&
        col(bPrefix + "s") < col(aPrefix + "e"))
      .drop("__bucket", s"__${aPrefix}sb", s"__${bPrefix}sb")
  }
}
