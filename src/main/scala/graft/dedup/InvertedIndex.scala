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
      k: Int = TopK): DataFrame =
    score(build(docs), docs.agg(count(lit(1)).as("n_docs")), queries, k)

  /** The D52 index as a STORED, term-SHARDED artifact: postings
    * partitioned by the first md5 hex char of the term (16 balanced
    * shards — at 100 TB the same layout with 2-3 chars gives 256-4096
    * directories), plus a 1-row meta table carrying the corpus size
    * the idf needs. A query then PRUNES to its terms' shards at the
    * scan — the property that makes index-only retrieval cheaper than
    * the corpus it indexes. */
  def writeIndex(docs: DataFrame, path: String): Unit = {
    build(docs)
      .withColumn("term_shard", substring(md5(col("term")), 1, 1))
      .write.partitionBy("term_shard").mode("overwrite")
      .parquet(s"$path/postings")
    docs.agg(count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Driver-side mirror of the shard function — query terms are a
    * bounded literal set, so their shard list is computed before the
    * plan is built and becomes a partition filter. */
  def shardOf(term: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8")).take(1)
      .map("%02x".format(_)).mkString.take(1)

  /** D59 retrieval against the STORED index: reads ONLY the query
    * terms' shards (partition pruning on `term_shard` — spec-asserted)
    * and the 1-row meta; the corpus is never touched at query time.
    * Identical scoring to [[retrieve]] over the same index contract,
    * so results are equal by construction (spec-asserted too). */
  def retrieveStored(s: org.apache.spark.sql.SparkSession, path: String,
      queries: Seq[(Long, String)], k: Int = TopK): DataFrame = {
    import s.implicits._
    val shards = queries.map(q => shardOf(q._2)).distinct
    val idx = s.read.parquet(s"$path/postings")
      .filter(col("term_shard").isin(shards: _*))
      .drop("term_shard")
    score(idx, s.read.parquet(s"$path/meta"), queries.toDF("q_id", "term"), k)
  }

  /** tf·idf scoring over an index frame — shared by the in-query and
    * stored-index read paths. */
  private def score(idx: DataFrame, nRow: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
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

  /** D90 — exact PHRASE search over positional postings: the query
    * class D52's positional lists exist for — term lookups (D59) can't
    * distinguish "batch table" from "table … batch". A phrase matches
    * where the two terms' positions are ADJACENT (pos₂ = pos₁ + 1),
    * which here is one doc-keyed `lead` window (the bigram stream) and
    * a broadcast equi-join of the O(1) query set — at index scale the
    * same adjacency join runs on the stored (doc, pos)-encoded
    * postings of just the query's terms, never a corpus scan.
    *
    * The gate is deliberately CROSS-FORMULATION: the output carries
    * both the positional-index doc count and `n_docs_scan`, the same
    * phrase counted by raw substring containment over the canonical
    * text (a bounded 4-query broadcast scan) — adjacency in token
    * space must equal space-bounded substring presence in string
    * space, in both engines, and the two columns must agree row by
    * row. Queries are data-derived and deterministic: the 3 most and
    * 1 least frequent bigrams (count, then lexicographic tiebreak). */
  val textPhraseSearch = QueryDef(
    "text_phrase_search",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val canon = Tables.documents(s, d)
        .select(col("doc_id"), graft.functions.Text.canonical(col("text")).as("canon"))
        .localCheckpoint() // feeds the bigram stream AND the scan side
      val tok = canon.select(col("doc_id"),
        posexplode(split(col("canon"), " ")).as(Seq("pos", "w1")))
      val bg = tok
        .withColumn("w2", lead(col("w1"), 1).over(
          Window.partitionBy("doc_id").orderBy("pos")))
        .filter(col("w2").isNotNull)
      val bgc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      // bounded-vocab frame: two tiny sorts instead of a global window
      val queries = bgc.orderBy(col("cnt").desc, col("w1"), col("w2"))
        .limit(3).select("w1", "w2")
        .unionByName(bgc.orderBy(col("cnt").asc, col("w1"), col("w2"))
          .limit(1).select("w1", "w2"))
        .distinct()
      val idx = bg.join(broadcast(queries), Seq("w1", "w2"))
        .groupBy("w1", "w2")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"))
      val scan = canon.join(broadcast(queries),
          expr("concat(' ', canon, ' ') LIKE concat('% ', w1, ' ', w2, ' %')"))
        .groupBy("w1", "w2")
        .agg(count(lit(1)).as("n_docs_scan"))
      idx.join(scan, Seq("w1", "w2"))
        .select(concat(col("w1"), lit(" "), col("w2")).as("phrase"),
          col("n_docs"), col("n_occ"), col("n_docs_scan"))
        .orderBy("phrase")
    },
    Some(s"""WITH c AS (SELECT doc_id, $oCanon AS canon FROM documents),
             w AS (SELECT doc_id, string_split(canon, ' ') AS ws FROM c),
             tok AS (SELECT doc_id, i AS pos, ws[i + 1] AS w1
                     FROM w, UNNEST(generate_series(0, len(ws) - 1)) AS t(i)),
             bg AS (SELECT doc_id, pos, w1,
                      lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
                    FROM tok),
             bgc AS (SELECT w1, w2, count(*) AS cnt FROM bg
                     WHERE w2 IS NOT NULL GROUP BY w1, w2),
             q AS (SELECT DISTINCT w1, w2 FROM (
                     (SELECT w1, w2 FROM bgc
                      ORDER BY cnt DESC, w1, w2 LIMIT 3)
                     UNION ALL
                     (SELECT w1, w2 FROM bgc
                      ORDER BY cnt ASC, w1, w2 LIMIT 1))),
             agg AS (SELECT q.w1, q.w2,
                       CAST(count(DISTINCT bg.doc_id) AS BIGINT) AS n_docs,
                       CAST(count(*) AS BIGINT) AS n_occ
                     FROM bg JOIN q ON bg.w1 = q.w1 AND bg.w2 = q.w2
                     GROUP BY q.w1, q.w2)
             SELECT w1 || ' ' || w2 AS phrase, n_docs, n_occ,
                    CAST((SELECT count(*) FROM c
                          WHERE (' ' || c.canon || ' ')
                            LIKE ('% ' || agg.w1 || ' ' || agg.w2 || ' %'))
                      AS BIGINT) AS n_docs_scan
             FROM agg ORDER BY phrase"""))

  val all: Seq[QueryDef] =
    Seq(textInvertedIndex, textIndexRetrieve, textPhraseSearch)
}
