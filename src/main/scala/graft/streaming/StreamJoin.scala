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

  /** S13: LEFT OUTER stream-stream interval join — S8's attribution
    * shape, keeping UNMATCHED impressions: the "did this impression
    * convert?" question needs the no-click rows too. Outer
    * stream-stream joins only work with the same two ingredients as
    * S8 (watermarks on both sides + both-ends time bound), and add the
    * semantics the spec pins down: an unmatched impression is emitted
    * with null click columns only when the watermark passes
    * imp_ts + window — before that a matching click could still
    * arrive, so the row sits in (bounded, evictable) state. */
  def impressionClickJoinOuter(impressions: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 10): DataFrame =
    impressions.alias("i")
      .join(clicks.alias("c"),
        col("i.user_id") === col("c.user_id") &&
          col("c.click_ts") >= col("i.imp_ts") &&
          col("c.click_ts") <= col("i.imp_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
        "left_outer")
      .select(col("i.user_id"), col("i.imp_id"), col("c.click_id"),
        col("i.imp_ts"), col("c.click_ts"))

  /** S21: FULL OUTER stream-stream interval join — completes the S8 /
    * S13 join matrix: unmatched rows from BOTH sides survive. The
    * click side's null-padded rows are the attribution-fraud /
    * data-loss signal (a click with no impression should not exist —
    * when it does, you want the row, not silence). Emission semantics
    * are symmetric: an unmatched impression emits when the watermark
    * closes [imp_ts, imp_ts + window]; an unmatched click emits when
    * the watermark proves no in-window impression can still arrive.
    * State on both sides stays watermark-evictable for exactly the
    * S8 reason — the join condition bounds event time on both ends. */
  def impressionClickJoinFull(impressions: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 10): DataFrame =
    impressions.alias("i")
      .join(clicks.alias("c"),
        col("i.user_id") === col("c.user_id") &&
          col("c.click_ts") >= col("i.imp_ts") &&
          col("c.click_ts") <= col("i.imp_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
        "full_outer")
      .select(col("i.user_id").as("imp_user"), col("c.user_id").as("click_user"),
        col("i.imp_id"), col("c.click_id"),
        col("i.imp_ts"), col("c.click_ts"))

  /** S9: stream–static enrichment join — every micro-batch of the
    * stream joins a STATIC dimension (inner, broadcast-hinted). The
    * standard "enrich events with reference data" shape: stateless (no
    * watermark needed for the join itself — the static side never
    * changes mid-query, so there is no join state to evict), and the
    * broadcast keeps the stream's partitions map-side at any corpus
    * scale, exactly like the batch R5 dim join. The static side must be
    * dimension-sized (broadcastable); a corpus-scale static side
    * belongs in a shuffle join without the hint. */
  /** S24 — LEFT SEMI stream-stream interval join: emit each
    * impression AT MOST ONCE as soon as any in-window click exists —
    * the "converted impressions" feed without click-side duplication
    * (an inner join emits one row per matching click; dedup after the
    * fact re-introduces a stateful operator the semi join avoids).
    * Same two ingredients as S8: watermarks on both sides + a
    * both-ends time bound, so state stays watermark-evictable. */
  def impressionClickJoinSemi(impressions: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 10): DataFrame =
    impressions.alias("i")
      .join(clicks.alias("c"),
        col("i.user_id") === col("c.user_id") &&
          col("c.click_ts") >= col("i.imp_ts") &&
          col("c.click_ts") <= col("i.imp_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
        "left_semi")
      .select(col("i.user_id"), col("i.imp_id"), col("i.imp_ts"))

  def streamStaticEnrich(stream: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key))
}
