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

  /** D88 — cross-source syndication matrix: which sources carry the
    * SAME content — D47's exact near-dup pairs attributed to their
    * (source, source) cell, the catalog read behind "these two feeds
    * are mirrors; ingest one" (D56 compares sources' aggregate shingle
    * SETS — overlap in vocabulary; this counts actual duplicated
    * DOCUMENTS, the licensing/dedup-budget signal). A planted mirror
    * feed (verbatim copies under a different source) makes the truth
    * known: every planted pair must land in its (source, mirror)
    * cell. Pair costs are D47's prefix-filtered join — never
    * all-pairs; the matrix aggregation is O(pairs) → O(source²). */
  val dedupSourceMatrix = QueryDef(
    "dedup_source_matrix",
    (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("source"))
      val mirrored = base.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" via mirror")).as("text"),
          lit("mirror_feed").as("source"))
      val corpus = base.unionByName(mirrored)
      val pairs = AllPairs.similarPairs(
        corpus.select("doc_id", "text"), k = 3, tau = 0.75,
        hashed = false)
      val src = corpus.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("doc_a"),
          col("source").as("sa")), "doc_a")
        .join(src.select(col("doc_id").as("doc_b"),
          col("source").as("sb")), "doc_b")
        .select(least(col("sa"), col("sb")).as("source_1"),
          greatest(col("sa"), col("sb")).as("source_2"),
          floor(col("jaccard") * 1e6 + 0.5).cast("long").as("j_ppm"))
        .groupBy("source_1", "source_2")
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(j_ppm) div count(1)").as("mean_j_ppm"))
        .orderBy("source_1", "source_2")
    },
    Some(s"""WITH c AS (SELECT doc_id, text, source FROM documents
               UNION ALL
               SELECT doc_id + 1000000, text || ' via mirror',
                      'mirror_feed'
               FROM documents WHERE doc_id % 25 = 0),
             w AS (SELECT doc_id, string_split(${PipelineQueries.oCanon},
                     ' ') AS ws
                   FROM c),
             t AS (SELECT doc_id, list_distinct(list_transform(
                     generate_series(0, greatest(len(ws) - 3, 0)),
                     i -> array_to_string(list_slice(ws, i + 1, i + 3),
                       ' '))) AS sh
                   FROM w),
             ${PipelineQueries.oPairIdx},
             f AS (SELECT doc_a, doc_b, jaccard FROM p
                   WHERE jaccard >= 0.75),
             m AS (SELECT least(ca.source, cb.source) AS source_1,
                     greatest(ca.source, cb.source) AS source_2,
                     CAST(floor(jaccard * 1e6 + 0.5) AS BIGINT) AS j_ppm
                   FROM f
                   JOIN c ca ON f.doc_a = ca.doc_id
                   JOIN c cb ON f.doc_b = cb.doc_id)
             SELECT source_1, source_2,
                    CAST(count(*) AS BIGINT) AS n_pairs,
                    CAST(SUM(j_ppm) AS BIGINT) // CAST(count(*) AS BIGINT)
                      AS mean_j_ppm
             FROM m GROUP BY 1, 2
             ORDER BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(pipelineWaterfall, dedupSourceMatrix)
}
