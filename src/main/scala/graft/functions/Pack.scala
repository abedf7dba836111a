package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D16: training-sequence packing — assign every document a position
  * in a fixed-token-budget training sequence, the concat-then-chunk
  * prep step LLM training runs over the whole corpus (docs are
  * concatenated in a deterministic order and cut into budget-sized
  * sequences; a doc can straddle a cut).
  *
  * Exactly-sequential global packing cannot scale, so the corpus is
  * sharded by an md5-prefix of the key (engine-independent, like
  * [[Splits]]) and packed within each shard: offset = running token
  * prefix-sum before the doc (one windowed cumsum per shard —
  * map-side-combinable, spillable), seq_id = offset / budget. Shards
  * pack in parallel and independently, which is how a 1000-executor
  * job would lay out 100 TB of tokenized text; 256 shards here, widen
  * the prefix for more.
  */
object Pack {

  /** (key, tokens) → (key, shard, offset, seq_id): the doc's shard,
    * its token offset within the shard's concatenation, and the
    * budget-sized sequence its first token lands in. */
  def packSequences(df: DataFrame, key: Column, tokens: Column,
      budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    // prefixed internal name so a user column can never collide
    val tk = "graft_pack_tokens"
    val sharded = df
      .withColumn("shard", substring(md5(key.cast("string").cast("binary")), 1, 2))
      .withColumn(tk, tokens.cast("long"))
    val w = Window.partitionBy(col("shard")).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("offset", sum(col(tk)).over(w) - col(tk))
      .withColumn("seq_id", floor(col("offset") / budget).cast("long"))
      .drop(tk)
  }
}
