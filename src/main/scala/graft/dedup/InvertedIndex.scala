package graft.dedup

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D52 — inverted-index build: term → (document frequency, total term
  * frequency, capped positional posting list). The retrieval-side
  * complement of D18's vocabulary and D25's BM25 scoring: BM25 ranks
  * docs GIVEN a candidate set; the inverted index is what produces
  * candidate sets without scanning the corpus per query.
  *
  * Scale design — everything is keyed on `term`, so the whole operator
  * is ONE logical exchange:
  *
  *   - posting positions get `row_number` over (term → doc_id, pos)
  *     and the CAP is applied before `collect_list` ever aggregates
  *     (`when(rn <= cap)` — collect_list skips nulls), so a stopword's
  *     millions of postings never materialize into one array; df and
  *     tf_total still count every occurrence;
  *   - df (distinct docs per term) is `max(dense_rank over (term →
  *     doc_id))` — the window rides the SAME term clustering as the
  *     groupBy, avoiding the two-pass expand a `countDistinct` beside
  *     a `collect_list` would plan;
  *   - postings encode (doc_id, position) into one bigint
  *     (`doc_id * PosBase + pos`) — sortable, range-scannable, half
  *     the bytes of a struct, and exactly how production indexes pack
  *     doc+pos into fixed-width keys. Encoding requires
  *     pos < PosBase, guarded loudly at build time.
  *
  * The entry emits the top-[[TopTerms]] terms by df (term tiebreak) —
  * deterministic and small; the full index is the pre-limit frame.
  */
object InvertedIndex {

  val PosBase  = 1000000L
  val Cap      = 50
  val TopTerms = 100

  /** Full inverted index over canonicalized whitespace terms. */
  def build(docs: DataFrame, cap: Int = Cap): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
        posexplode(graft.functions.Text.words(col("text"))).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
    val wOrd = Window.partitionBy("term").orderBy("doc_id", "pos")
    val wDoc = Window.partitionBy("term").orderBy("doc_id")
    toks
      .withColumn("enc",
        // loud overflow guard: a doc longer than PosBase tokens cannot
        // silently alias another doc's postings
        when(col("pos") < PosBase, col("doc_id") * PosBase + col("pos"))
          .otherwise(raise_error(
            concat(lit(s"token position >= $PosBase in doc "), col("doc_id")))))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("dr", dense_rank().over(wDoc))
      .groupBy("term")
      .agg(
        max("dr").cast("long").as("df"),
        count(lit(1)).as("tf_total"),
        sort_array(collect_list(when(col("rn") <= cap, col("enc"))))
          .as("postings"),
        (max("rn") > cap).as("truncated"))
  }

  private val oCanon =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"

  /** The coverage entry serializes the posting array to a CSV string —
    * the driver's row-hash harness can't hash raw array cells (same
    * convention as emb_quantize_int8 / text_winnow). [[build]] keeps
    * the typed array for library callers. */
  val textInvertedIndex = QueryDef(
    "text_inverted_index",
    (s, d) => build(Tables.documents(s, d))
      .orderBy(desc("df"), asc("term")).limit(TopTerms)
      .withColumn("postings", array_join(col("postings"), ",")),
    Some(s"""WITH w AS (SELECT doc_id, string_split($oCanon, ' ') AS ws
                        FROM documents),
             t AS (SELECT doc_id, i AS pos, ws[i + 1] AS term
                   FROM w, UNNEST(generate_series(0, len(ws) - 1)) AS u(i)
                   WHERE ws[i + 1] != ''),
             r AS (SELECT term, doc_id * $PosBase + pos AS enc,
                     row_number() OVER (PARTITION BY term
                                        ORDER BY doc_id, pos) AS rn,
                     dense_rank() OVER (PARTITION BY term
                                        ORDER BY doc_id) AS dr
                   FROM t)
             SELECT term, CAST(max(dr) AS BIGINT) AS df,
                    CAST(count(*) AS BIGINT) AS tf_total,
                    array_to_string(
                      list(enc ORDER BY enc) FILTER (WHERE rn <= $Cap), ',')
                      AS postings,
                    max(rn) > $Cap AS truncated
             FROM r GROUP BY term
             ORDER BY df DESC, term LIMIT $TopTerms"""))

  /** D59 — index-only retrieval: top-k documents per query scored
    * ENTIRELY from the inverted index — the read path that justifies
    * building D52 at all. The corpus is never scanned at query time:
    * the (broadcast) query term table equi-joins the term-keyed index
    * (at 100 TB a term-partitioned stored index makes this a pruned
    * lookup of |query terms| keys), capped postings decode back to
    * (doc, tf), and tf·idf contributions aggregate per (query, doc).
    *
    * Scoring is over the index AS BUILT — the cap is part of the
    * artifact's contract (production indexes store impact-ordered
    * truncated postings the same way; here cap order is the build's
    * deterministic (doc_id, pos)). idf = ln((N+1)/(df+1)) with df from
    * the UNcapped count the index stores; per-term contributions are
    * floor-quantized to 1e-6 (the D46/D25 convention) so the per-doc
    * sum is an exact integer both engines collate identically. N rides
    * a 1-row stats broadcast (the sanctioned crossJoin class). Top-k
    * per query is a rank window — WindowGroupLimit prunes map-side
    * (the D54 plan property), so shuffle traffic is O(queries × k). */
  val TopK = 10

  def retrieve(docs: DataFrame, queries: DataFrame,
      k: Int = TopK): DataFrame = {
    val idx = build(docs)
    val nRow = docs.agg(count(lit(1)).as("n_docs"))
    val hits = idx.join(broadcast(queries), "term")
      .select(col("q_id"), col("term"), col("df"),
        explode(col("postings")).as("enc"))
      .withColumn("doc_id", expr(s"enc div ${PosBase}"))
      .groupBy("q_id", "term", "df", "doc_id")
      .agg(count(lit(1)).as("tf"))
    val scored = hits.crossJoin(broadcast(nRow))
      .withColumn("contrib",
        floor(col("tf") *
          log((col("n_docs") + lit(1)).cast("double") / (col("df") + lit(1)))
          * 1e6).cast("long"))
      .groupBy("q_id", "doc_id")
      .agg(sum("contrib").as("score_q"), count(lit(1)).as("n_terms_hit"))
    val byQ = Window.partitionBy("q_id")
      .orderBy(desc("score_q"), asc("doc_id"))
    scored.withColumn("rank", row_number().over(byQ))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("doc_id"),
        col("score_q"), col("n_terms_hit"))
  }

  /** Deterministic literal query workload over the synthetic vocab. */
  private val QueryTerms: Seq[(Int, String)] = Seq(
    1 -> "data", 1 -> "spark", 1 -> "merge",
    2 -> "window", 2 -> "join", 2 -> "fast",
    3 -> "stream", 3 -> "table", 3 -> "slow")

  val textIndexRetrieve = QueryDef(
    "text_index_retrieve",
    (s, d) => {
      import s.implicits._
      retrieve(Tables.documents(s, d), QueryTerms.toDF("q_id", "term"))
        .orderBy("q_id", "rank")
    },
    Some(s"""WITH w AS (SELECT doc_id, string_split($oCanon, ' ') AS ws
                        FROM documents),
             t AS (SELECT doc_id, i AS pos, ws[i + 1] AS term
                   FROM w, UNNEST(generate_series(0, len(ws) - 1)) AS u(i)
                   WHERE ws[i + 1] != ''),
             r AS (SELECT term, doc_id,
                     row_number() OVER (PARTITION BY term
                                        ORDER BY doc_id, pos) AS rn
                   FROM t),
             dfs AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                     FROM t GROUP BY term),
             q(q_id, term) AS (VALUES ${QueryTerms
               .map { case (q, t) => s"($q, '$t')" }.mkString(", ")}),
             hits AS (
               SELECT q.q_id, r.term, dfs.df, r.doc_id,
                      CAST(count(*) AS BIGINT) AS tf
               FROM q JOIN r ON r.term = q.term AND r.rn <= $Cap
               JOIN dfs ON dfs.term = q.term
               GROUP BY q.q_id, r.term, dfs.df, r.doc_id),
             scored AS (
               SELECT q_id, doc_id,
                      CAST(SUM(CAST(floor(tf *
                        ln(CAST((SELECT count(*) + 1 FROM documents) AS DOUBLE)
                           / (df + 1)) * 1e6) AS BIGINT)) AS BIGINT) AS score_q,
                      CAST(count(*) AS BIGINT) AS n_terms_hit
               FROM hits GROUP BY q_id, doc_id)
             SELECT q_id,
                    CAST(row_number() OVER (PARTITION BY q_id
                      ORDER BY score_q DESC, doc_id) AS INT) AS rank,
                    doc_id, score_q, n_terms_hit
             FROM scored
             QUALIFY rank <= $TopK
             ORDER BY q_id, rank"""))

  val all: Seq[QueryDef] = Seq(textInvertedIndex, textIndexRetrieve)
}
