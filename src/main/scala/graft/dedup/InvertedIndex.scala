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

  val all: Seq[QueryDef] = Seq(textInvertedIndex)
}
