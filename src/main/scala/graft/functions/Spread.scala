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
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n, key)
  }
}
