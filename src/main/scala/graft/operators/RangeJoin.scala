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
}
