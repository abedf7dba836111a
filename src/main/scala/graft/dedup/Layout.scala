package graft.dedup

import graft.{QueryDef, Tables}
import graft.functions.Text
import graft.operators.Ranks
import org.apache.spark.sql.functions._

/** D82 — similarity-clustered storage layout, measured: does ordering
  * a text corpus by a content-locality key put near-duplicate
  * documents NEXT TO each other on disk? Adjacency is what makes
  * general-purpose compression (zstd dictionaries span neighboring
  * rows in a parquet page) and windowed dedup passes effective — the
  * text complement of R37's Z-order claim, quantified the same way
  * (R86 measures zone maps; this measures neighbor similarity).
  *
  * Locality key = each document's MINIMUM md5-hashed 3-shingle — the
  * bottom-1 minhash. Two near-duplicates share their min shingle with
  * probability ≈ their Jaccard similarity (the minhash identity), so
  * sorting on it lands them adjacent with the same probability —
  * no pairwise work, no index, just a sort key. The entry builds the
  * corpus plus planted near-dup variants (far away in doc_id order,
  * so insertion order provably scatters them), evaluates BOTH
  * layouts' mean adjacent-pair Jaccard, and emits the comparison as
  * oracle-verified data.
  *
  * Scale: the layout itself is a sort — at 100 TB a
  * `repartitionByRange(min_shingle_md5) + sortWithinPartitions` write
  * (the IO12/R37 machinery, deliberately not re-proven here). The
  * adjacent-pair evaluation avoids the global-window trap: ranks come
  * from the R53 two-pass global row_number, and "adjacent" is a
  * rank-equi self-join — no SinglePartition exchange anywhere.
  */
object Layout {

  val textSimLayout = QueryDef(
    "text_sim_layout",
    (s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      // planted near-dups: every 25th doc, one appended token, pushed
      // far away in doc_id order so the id layout provably scatters them
      val planted = base.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" zzz")).as("text"))
      // shingles carried as 60-bit md5-prefix LONGS end to end: the
      // arrays ride one localCheckpoint, two rank passes and two
      // rank-equi self-joins — 8 bytes/element instead of a shingle
      // string cut the entry 12.5 → ~3 s at sf0.1. The same md5 prefix
      // parses in DuckDB via the D69 '0x' || substr(...) route, so the
      // whole pipeline stays oracle-mirrorable (collisions at 60 bits
      // are negligible AND identical in both engines).
      val sh = base.unionByName(planted)
        // materialize the words column BEFORE shingling — the inline
        // convenience form re-evaluates canonical+split per element
        // (the documented quadratic trap, Text.shinglesOnWords)
        .select(col("doc_id"), Text.words(col("text")).as("ws"))
        .select(col("doc_id"),
          array_distinct(transform(Text.shinglesOnWords(col("ws"), 3),
            x => conv(substring(md5(x), 1, 15), 16, 10).cast("long")))
            .as("sh"))
        .withColumn("minsh", array_min(col("sh")))
        .localCheckpoint() // evaluated under two orderings below
      def adjacentMean(sorted: org.apache.spark.sql.DataFrame,
          name: String) = {
        val a = sorted.select(col("rnk"), col("sh"))
        val b = sorted.select((col("rnk") - 1).as("rnk2"),
          col("sh").as("sh2"))
        a.join(b, col("rnk") === col("rnk2"))
          .select(size(array_intersect(col("sh"), col("sh2")))
            .cast("long").as("ni"),
            (size(col("sh")) + size(col("sh2"))).cast("long").as("ns"))
          // integer division on BOTH sides: a double divide + cast
          // truncates on Spark but ROUNDS on DuckDB's CAST
          .select(when(col("ns") - col("ni") > 0,
            expr("ni * 1000000 div (ns - ni)")).as("j_ppm"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("j_ppm")).as("sum_ppm"))
          .select(lit(name).as("layout"), col("n_pairs"),
            expr("sum_ppm div n_pairs").as("mean_adj_jaccard_ppm"))
      }
      val byId = adjacentMean(
        Ranks.globalRowNumber(sh, Seq(col("doc_id")), 8, "rnk"), "id_order")
      val bySim = adjacentMean(
        Ranks.globalRowNumber(sh, Seq(col("minsh"), col("doc_id")), 8,
          "rnk"), "sim_order")
      byId.unionByName(bySim).orderBy("layout")
    },
    Some(s"""WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text || ' zzz' AS text
              FROM documents WHERE doc_id % 25 = 0),
            w AS (SELECT doc_id,
                    string_split(${PipelineQueries.oCanon}, ' ') AS ws
                  FROM corpus),
            t AS (SELECT doc_id, list_distinct(list_transform(
                    list_distinct(list_transform(
                      generate_series(0, greatest(len(ws) - 3, 0)),
                      i -> array_to_string(list_slice(ws, i + 1, i + 3),
                        ' '))),
                    g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)))
                    AS sh
                  FROM w),
            k AS (SELECT doc_id, sh, list_min(sh) AS minsh FROM t),
            rid AS (SELECT sh,
                      row_number() OVER (ORDER BY doc_id) AS rnk
                    FROM k),
            rsim AS (SELECT sh,
                       row_number() OVER (ORDER BY minsh, doc_id) AS rnk
                     FROM k),
            pid AS (SELECT CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT)
                      AS ni,
                      CAST(len(a.sh) + len(b.sh) AS BIGINT) AS ns
                    FROM rid a JOIN rid b ON a.rnk = b.rnk - 1),
            psim AS (SELECT CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT)
                       AS ni,
                       CAST(len(a.sh) + len(b.sh) AS BIGINT) AS ns
                     FROM rsim a JOIN rsim b ON a.rnk = b.rnk - 1),
            s1 AS (SELECT 'id_order' AS layout,
                     CAST(count(*) AS BIGINT) AS n_pairs,
                     CAST(SUM(CASE WHEN ns - ni > 0 THEN
                       ni * 1000000 // (ns - ni) END) AS BIGINT) AS sp
                   FROM pid),
            s2 AS (SELECT 'sim_order' AS layout,
                     CAST(count(*) AS BIGINT) AS n_pairs,
                     CAST(SUM(CASE WHEN ns - ni > 0 THEN
                       ni * 1000000 // (ns - ni) END) AS BIGINT) AS sp
                   FROM psim)
            SELECT layout, n_pairs, sp // n_pairs AS mean_adj_jaccard_ppm
            FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
            ORDER BY layout"""))

  val all: Seq[QueryDef] = Seq(textSimLayout)
}
