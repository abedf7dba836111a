package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S8: stream-stream interval join — the attribution shape (match each
  * click to the impression at most `windowMinutes` before it, per
  * user). Both sides carry watermarks and the join condition bounds
  * event time on BOTH ends, which is what lets Spark evict join state:
  * an impression older than watermark - window can never match a
  * future click and is dropped. Without the interval bound the state
  * store grows with the full history of both streams — the
  * scale-killer this operator exists to avoid.
  *
  * Works identically on batch frames (the interval join is plain SQL),
  * which is how the spec asserts streaming/batch parity.
  */
object StreamJoin {

  /** impressions(user_id, imp_id, imp_ts) ⋈ clicks(user_id, click_id,
    * click_ts) within [imp_ts, imp_ts + windowMinutes]. Streaming
    * inputs must already carry watermarks on their ts columns. */
  def impressionClickJoin(impressions: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 10): DataFrame =
    impressions.alias("i")
      .join(clicks.alias("c"),
        col("i.user_id") === col("c.user_id") &&
          col("c.click_ts") >= col("i.imp_ts") &&
          col("c.click_ts") <= col("i.imp_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("i.user_id"), col("i.imp_id"), col("c.click_id"),
        col("i.imp_ts"), col("c.click_ts"))
}
