package graft.dedup

import graft.{QueryDef, Tables}
import graft.functions.Text
import org.apache.spark.sql.functions._

/** D87 — curation waterfall: the survivor count after each gate of a
  * filter chain, cumulatively — THE report a data-curation run ships
  * with ("600B raw → 480B after language ID → 390B after quality →
  * ..."), because a pipeline that only reports its final count hides
  * WHICH gate ate the corpus. Gates here are the repo's own curation
  * signals (language, length band, D9 quality, token floor), applied
  * in pipeline order; every stage's in/out/dropped and drop-ppm are
  * exact integers from ONE corpus pass — per-doc gate flags are
  * map-side expressions, the cumulative stage counts are conditional
  * sums in a single aggregation, and the waterfall unstacks from that
  * one row. Adding a gate costs one flag column, never a re-scan. */
object Waterfall {

  val pipelineWaterfall = QueryDef(
    "pipeline_waterfall",
    (s, d) => {
      val flagged = graft.functions.Spread(Tables.documents(s, d),
          col("doc_id"))
        .withColumn("canon", Text.canonical(col("text")))
        .withColumn("ws", split(col("canon"), " "))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          Text.qualityScoreOn(Text.qualityComponentsOn(col("text"),
            col("canon"), col("ws")).toMap).as("quality"),
          size(col("ws")).as("n_tokens"))
        .select(
          (col("lang") === "en").as("g1"),
          col("n_chars").between(100, 500).as("g2"),
          (col("quality") > 0.5).as("g3"),
          (col("n_tokens") >= 30).as("g4"))
      val one = flagged.agg(
        count(lit(1)).as("n0"),
        sum(when(col("g1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("g1") && col("g2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("g1") && col("g2") && col("g3"), 1L).otherwise(0L))
          .as("n3"),
        sum(when(col("g1") && col("g2") && col("g3") && col("g4"), 1L)
          .otherwise(0L)).as("n4"))
      one.select(expr(
          """stack(4,
               1, 'lang_en',      n0, n1,
               2, 'len_100_500',  n1, n2,
               3, 'quality_gt_05', n2, n3,
               4, 'tokens_ge_30', n3, n4)
             AS (stage, gate, n_in, n_out)"""))
        .select(col("stage"), col("gate"), col("n_in"), col("n_out"),
          (col("n_in") - col("n_out")).as("dropped"),
          expr("CASE WHEN n_in > 0 THEN (n_in - n_out) * 1000000 div n_in" +
            " ELSE 0 END").as("drop_ppm"))
        .orderBy("stage")
    },
    Some(s"""WITH c AS (SELECT doc_id, lang, n_chars, text,
                    ${PipelineQueries.oCanon} AS canon
                  FROM documents),
            m AS (SELECT doc_id, lang, n_chars, text, canon,
                    len(string_split(canon, ' ')) AS n_words,
                    greatest(length(text), 1) AS text_len
                  FROM c),
            f AS (SELECT
                    lang = 'en' AS g1,
                    n_chars BETWEEN 100 AND 500 AS g2,
                    (${PipelineQueries.oQualityExpr}) > 0.5 AS g3,
                    n_words >= 30 AS g4
                  FROM m),
            a AS (SELECT CAST(count(*) AS BIGINT) AS n0,
                    CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT)
                      AS n1,
                    CAST(SUM(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n2,
                    CAST(SUM(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n3,
                    CAST(SUM(CASE WHEN g1 AND g2 AND g3 AND g4
                      THEN 1 ELSE 0 END) AS BIGINT) AS n4
                  FROM f),
            st AS (
              SELECT 1 AS stage, 'lang_en' AS gate, n0 AS n_in, n1 AS n_out
              FROM a
              UNION ALL SELECT 2, 'len_100_500', n1, n2 FROM a
              UNION ALL SELECT 3, 'quality_gt_05', n2, n3 FROM a
              UNION ALL SELECT 4, 'tokens_ge_30', n3, n4 FROM a)
            SELECT stage, gate, n_in, n_out, n_in - n_out AS dropped,
                   CASE WHEN n_in > 0 THEN (n_in - n_out) * 1000000 // n_in
                        ELSE 0 END AS drop_ppm
            FROM st ORDER BY stage"""))

  val all: Seq[QueryDef] = Seq(pipelineWaterfall)
}
