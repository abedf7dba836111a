package graft.streaming

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S27 — watermark-delay planning: for candidate watermark delays,
  * what fraction of the historical stream would have been dropped as
  * too-late? The sizing read every `withWatermark` call needs BEFORE
  * deployment (S3/S7/S13's delay parameters are exactly this choice):
  * too tight drops real data, too loose holds state — this entry turns
  * the trade-off into data.
  *
  * An event's lateness is measured against the high-water mark at its
  * ARRIVAL: max event-time seen over all STRICTLY EARLIER arrivals
  * (arrival order = the monotone ingest id), which is precisely the
  * quantity Structured Streaming's watermark tracks. The global
  * prefix-max over arrival order is the R53 two-pass shape applied to
  * MAX — range exchange on the ingest id, O(#partitions) per-range
  * maxima to the driver, broadcast exclusive prefix-maxima, pid-local
  * window — never an `Exchange SinglePartition` over the stream
  * history. All arithmetic is integer microseconds; the drop
  * fractions are ppm integer division — hash-exact.
  */
object WatermarkPlan {

  /** Candidate delays, seconds. */
  val Delays: Seq[Long] = Seq(60L, 300L, 900L, 3600L)

  /** Per-event lateness vs the strictly-before high-water mark, via
    * the two-pass global prefix max (no single-partition exchange). */
  private[streaming] def lateness(df: DataFrame, npart: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val ranged = df.repartitionByRange(npart, col("event_id"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // pin sampled range boundaries (Ranks.scala)
    // O(#partitions) driver rows: per-range maxima → exclusive prefix max
    val maxima = ranged.groupBy("_pid").agg(max(col("ts_us")).as("_m"))
      .orderBy("_pid").collect()
    var acc = Long.MinValue
    val offsets = maxima.map { r =>
      val o = (r.getInt(0), acc); acc = math.max(acc, r.getLong(1)); o
    }.toSeq
    val offs = broadcast(offsets.toDF("_pid", "_off"))
    val wPrev = Window.partitionBy("_pid").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(offs, "_pid")
      .withColumn("seen_us",
        greatest(coalesce(max(col("ts_us")).over(wPrev),
          lit(Long.MinValue)), col("_off")))
      .withColumn("late_us",
        when(col("seen_us") > col("ts_us"),
          col("seen_us") - col("ts_us")).otherwise(0L))
      .drop("_pid", "_off")
  }

  val qWatermarkPlan = QueryDef(
    "q_watermark_plan",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
      val late = lateness(ev, 32)
      val aggCols = Seq(max(col("late_us")).as("max_late_us")) ++
        Delays.map(dl =>
          sum(when(col("late_us") > dl * 1000000L, 1L).otherwise(0L))
            .as(s"n_$dl"))
      val agg = late.agg(count(lit(1)).as("n"), aggCols: _*)
      agg.select(col("n"), col("max_late_us"),
          expr(s"stack(${Delays.size}, " +
            Delays.map(dl => s"${dl}L, n_$dl").mkString(", ") +
            ") as (delay_s, n_dropped)"))
        .select(col("delay_s"), col("n_dropped"),
          expr("n_dropped * 1000000 div n").as("drop_ppm"),
          col("n"), col("max_late_us"))
        .orderBy("delay_s")
    },
    Some(s"""WITH l AS (
              SELECT epoch_us(ts) AS ts_us,
                     MAX(epoch_us(ts)) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS seen_us
              FROM events),
            lt AS (SELECT CASE WHEN seen_us > ts_us
                     THEN seen_us - ts_us ELSE 0 END AS late_us
                   FROM l),
            a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(MAX(late_us) AS BIGINT) AS max_late_us,
                    ${Delays.map(dl =>
                      s"""CAST(SUM(CASE WHEN late_us > CAST($dl AS BIGINT)
                         * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_$dl""")
                      .mkString(",\n                    ")}
                  FROM lt)
            ${Delays.map(dl =>
              s"""SELECT CAST($dl AS BIGINT) AS delay_s,
                     n_$dl AS n_dropped,
                     n_$dl * 1000000 // n AS drop_ppm, n, max_late_us
              FROM a""").mkString("\n            UNION ALL\n            ")}
            ORDER BY delay_s"""))

  val all: Seq[QueryDef] = Seq(qWatermarkPlan)
}
