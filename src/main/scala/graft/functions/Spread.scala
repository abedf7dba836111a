package graft.functions

import org.apache.spark.sql.{Column, DataFrame}

/** Spread a skinny input across all cores before CPU-bound per-row
  * work: a small file scans as 1-2 partitions locally, and at scale the
  * scan parallelism tracks bytes, not compute. Explicit partition count
  * so AQE cannot coalesce the tiny shuffle back down; skipped entirely
  * when the source already scans wide enough — re-shuffling a corpus
  * that is already parallel would be pure waste.
  */
object Spread {
  def apply(df: DataFrame, key: Column): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val n = conf.numShufflePartitions
    if (df.isStreaming) return df.repartition(n, key)
    // estimate scan width from optimizer stats (bytes / split size) —
    // no df.rdd touch, which would force physical planning + RDD
    // lineage per invocation and throws outright on streaming frames
    val approxScanParts =
      df.queryExecution.optimizedPlan.stats.sizeInBytes /
        BigInt(math.max(conf.filesMaxPartitionBytes, 1L))
    if (approxScanParts >= n) df else df.repartition(n, key)
  }
}
