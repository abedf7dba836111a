package graft.dedup

import graft.{QueryDef, Tables}
import graft.functions.Text
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D72/D73 — corpus-level distribution statistics for curation:
  * per-source token-distribution entropy + Jensen-Shannon divergence
  * against the corpus, and per-document TF-IDF keyword extraction.
  *
  * Both reduce to (key, token) counts before any divergence/window
  * arithmetic, so raw document volume only touches the first
  * aggregation. Every divergence/entropy term is quantized to a long
  * PER TOKEN and then integer-summed — a vocabulary-sized float sum
  * is accumulation-order-sensitive and Spark's merge order differs
  * from DuckDB's; the quantize-then-sum form is order-free (the same
  * discipline as R68's PSI total).
  */
object CorpusStats {

  /** D72 — per-source unigram entropy and JS divergence vs the corpus
    * distribution: the "which source is distributionally weird" read
    * that decides mixture weights and flags contaminated or
    * boilerplate-heavy sources before training. JSD(P‖C) with
    * M = (P+C)/2, both KL halves summed per token in 1e-9-quantized
    * units (bounded: JSD ≤ ln 2). Counts join word-keyed — the corpus
    * side is already word-aggregated so the join is
    * bounded-by-vocabulary, never by document count. */
  val textEntropyJsd = QueryDef(
    "text_entropy_jsd",
    (s, d) => {
      val words = graft.functions.Spread(Tables.documents(s, d), col("doc_id"))
        .select(col("source"), explode(Text.words(col("text"))).as("word"))
      val sw = words.groupBy("source", "word").agg(count(lit(1)).as("n"))
      val corpus = sw.groupBy("word").agg(sum("n").as("nc"))
      val totS = sw.groupBy("source").agg(sum("n").as("tot"))
      val nAll = corpus.agg(sum("nc").as("nn"))
      val joined = sw.join(corpus, "word")
        .join(totS, "source")
        .crossJoin(broadcast(nAll))
        .withColumn("p", col("n").cast("double") / col("tot"))
        .withColumn("q", col("nc").cast("double") / col("nn"))
        .withColumn("m", (col("p") + col("q")) / 2)
      // per-token quantized contributions, integer-summed:
      //   entropy term  −p·ln p          (≥ 0)
      //   jsd terms     ½·p·ln(p/m) summed over the source's tokens
      //                 + ½·q·ln(q/m) over ALL tokens (the corpus-side
      //                 KL half needs every word, including those the
      //                 source lacks, where p=0 ⇒ m=q/2 ⇒ term = ½q·ln2)
      val perSource = joined.groupBy("source").agg(
        sum(floor((col("p") * -log(col("p"))) * 1e9).cast("long"))
          .as("entropy_q9"),
        sum(floor(col("p") * log(col("p") / col("m")) * lit(0.5) * 1e9)
          .cast("long")).as("kl_pm_q9"),
        sum(floor(col("q") * log(col("q") / col("m")) * lit(0.5) * 1e9)
          .cast("long")).as("kl_qm_present_q9"),
        sum(floor(col("q") * lit(0.5 * math.log(2.0)) * 1e9).cast("long"))
          .as("absent_base_q9"))
      // corpus-side KL half over ABSENT tokens = Σ_all ½q·ln2 − Σ_present
      // (½q·ln2 − ½q·ln(q/m) is not the identity — instead compute the
      // absent mass directly: Σ_absent ½q·ln2 = ½ln2 − Σ_present ½q·ln2,
      // all in the same 1e-9 quantized units so the subtraction is exact
      // in the quantized algebra)
      val halfLn2Q9 = math.floor(0.5 * math.log(2.0) * 1e9).toLong
      perSource
        .join(totS, "source")
        .select(col("source"), col("tot").as("n_tokens"),
          col("entropy_q9"),
          (col("kl_pm_q9") + col("kl_qm_present_q9")
            + (lit(halfLn2Q9) - col("absent_base_q9"))).as("jsd_q9"))
        .orderBy("source")
    },
    Some(s"""WITH w AS (SELECT source,
                          unnest(string_split(${PipelineQueries.oCanon}, ' '))
                            AS word
                        FROM documents),
             sw AS (SELECT source, word, CAST(count(*) AS BIGINT) AS n
                    FROM w GROUP BY 1, 2),
             corpus AS (SELECT word, SUM(n) AS nc FROM sw GROUP BY 1),
             tots AS (SELECT source, SUM(n) AS tot FROM sw GROUP BY 1),
             nall AS (SELECT SUM(nc) AS nn FROM corpus),
             j AS (SELECT sw.source, sw.n, tots.tot, corpus.nc, nall.nn,
                     CAST(sw.n AS DOUBLE) / tots.tot AS p,
                     CAST(corpus.nc AS DOUBLE) / nall.nn AS q
                   FROM sw JOIN corpus ON sw.word = corpus.word
                   JOIN tots ON sw.source = tots.source
                   CROSS JOIN nall),
             jm AS (SELECT *, (p + q) / 2 AS m FROM j),
             per AS (SELECT source,
                       SUM(CAST(floor(p * -ln(p) * 1e9) AS BIGINT))
                         AS entropy_q9,
                       SUM(CAST(floor(p * ln(p / m) * 0.5 * 1e9) AS BIGINT))
                         AS kl_pm_q9,
                       SUM(CAST(floor(q * ln(q / m) * 0.5 * 1e9) AS BIGINT))
                         AS kl_qm_present_q9,
                       SUM(CAST(floor(q * 0.5 * ln(2.0) * 1e9) AS BIGINT))
                         AS absent_base_q9
                     FROM jm GROUP BY 1)
             SELECT per.source, CAST(tots.tot AS BIGINT) AS n_tokens,
                    CAST(entropy_q9 AS BIGINT) AS entropy_q9,
                    CAST(kl_pm_q9 + kl_qm_present_q9
                      + (CAST(floor(0.5 * ln(2.0) * 1e9) AS BIGINT)
                         - absent_base_q9) AS BIGINT) AS jsd_q9
             FROM per JOIN tots ON per.source = tots.source
             ORDER BY per.source"""))

  val KeywordsPerDoc = 3

  /** D73 — TF-IDF keyword extraction: top-3 distinguishing terms per
    * document, the metadata tag a retrieval/curation pipeline stores
    * beside each doc. tf from the per-(doc, word) count, idf from the
    * word-keyed document frequency, corpus size as a 1-row broadcast.
    * The per-doc rank window carries a WindowGroupLimit (rank ≤ 3
    * prunes map-side before the exchange) and orders by the QUANTIZED
    * score so the word tiebreak is identical cross-engine. */
  val textTfidfKeywords = QueryDef(
    "text_tfidf_keywords",
    (s, d) => {
      val words = graft.functions.Spread(Tables.documents(s, d), col("doc_id"))
        .select(col("doc_id"), explode(Text.words(col("text"))).as("word"))
      val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("nd"))
      val scored = tf.join(df, "word").crossJoin(broadcast(nDocs))
        .withColumn("tfidf_q",
          floor(col("tf") * log(col("nd").cast("double") / col("df")) * 1e6)
            .cast("long"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf_q").desc, col("word"))
      scored
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= KeywordsPerDoc)
        .select(col("doc_id"), col("rnk"), col("word"), col("tfidf_q"))
        .orderBy("doc_id", "rnk")
    },
    Some(s"""WITH w AS (SELECT doc_id,
                          unnest(string_split(${PipelineQueries.oCanon}, ' '))
                            AS word
                        FROM documents),
             tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
                    FROM w GROUP BY 1, 2),
             df AS (SELECT word, CAST(count(*) AS BIGINT) AS df
                    FROM tf GROUP BY 1),
             nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
             sc AS (SELECT tf.doc_id, tf.word,
                      CAST(floor(tf.tf * ln(CAST(nd.nd AS DOUBLE) / df.df)
                        * 1e6) AS BIGINT) AS tfidf_q
                    FROM tf JOIN df ON tf.word = df.word CROSS JOIN nd),
             r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                     ORDER BY tfidf_q DESC, word) AS rnk
                   FROM sc)
             SELECT doc_id, CAST(rnk AS INT) AS rnk, word, tfidf_q
             FROM r WHERE rnk <= $KeywordsPerDoc
             ORDER BY doc_id, rnk"""))

  /** D74 — readability scoring (Flesch reading ease + Flesch-Kincaid
    * grade): the classic curation signal separating prose from lists,
    * code and boilerplate. Sentence count from terminator-run counts,
    * syllables approximated by vowel-group runs over the canonical
    * text — the standard heuristic; every count is a codegen'd
    * regexp_count, the whole operator is one map-side scan. Scores
    * floor-quantized at 1e4 from one fixed double sequence. */
  val textReadability = QueryDef(
    "text_readability",
    (s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"),
        col("text"), Text.canonical(col("text")).as("canon"))
      val withCounts = base.select(col("doc_id"),
        greatest(size(split(col("canon"), " ")), lit(1)).cast("long")
          .as("n_words"),
        greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
          .cast("long").as("n_sents"),
        greatest(regexp_count(col("canon"), lit("[aeiou]+")), lit(1))
          .cast("long").as("n_syll"))
      withCounts.select(col("doc_id"), col("n_words"), col("n_sents"),
        col("n_syll"),
        floor((lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sents"))
          - lit(84.6) * (col("n_syll").cast("double") / col("n_words")))
          * 1e4).cast("long").as("flesch_q"),
        floor((lit(0.39) * (col("n_words").cast("double") / col("n_sents"))
          + lit(11.8) * (col("n_syll").cast("double") / col("n_words"))
          - lit(15.59)) * 1e4).cast("long").as("fk_grade_q"))
        .orderBy("doc_id")
    },
    Some(s"""WITH c AS (SELECT doc_id, text,
                          ${PipelineQueries.oCanon} AS canon
                        FROM documents),
             k AS (SELECT doc_id,
                     CAST(greatest(len(string_split(canon, ' ')), 1)
                       AS BIGINT) AS n_words,
                     CAST(greatest(len(regexp_extract_all(text,
                       '[.!?]+')), 1) AS BIGINT) AS n_sents,
                     CAST(greatest(len(regexp_extract_all(canon,
                       '[aeiou]+')), 1) AS BIGINT) AS n_syll
                   FROM c)
             SELECT doc_id, n_words, n_sents, n_syll,
                    CAST(floor((206.835
                      - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                      - 84.6 * (CAST(n_syll AS DOUBLE) / n_words))
                      * 1e4) AS BIGINT) AS flesch_q,
                    CAST(floor((0.39 * (CAST(n_words AS DOUBLE) / n_sents)
                      + 11.8 * (CAST(n_syll AS DOUBLE) / n_words)
                      - 15.59) * 1e4) AS BIGINT) AS fk_grade_q
             FROM k ORDER BY doc_id"""))

  /** D75 — corpus-internal novelty: per document, the fraction of its
    * distinct word 3-shingles shared with NO other document — the
    * inverse duplication signal that ranks boilerplate (novelty → 0)
    * against unique prose (novelty → 1) without any pairwise work:
    * one shingle explode, one document-frequency aggregation, one
    * join-back. The same gram→df table the decontaminators build,
    * read for a per-doc score instead of a cross-corpus flag.
    *
    * The gram frame feeds TWO consumers (the df aggregate and the
    * join-back); the explicit `repartition(g)` pins both to one
    * identical exchange subtree that ReuseExchange collapses, so the
    * expensive explode executes ONCE — the Decontaminate lesson
    * (`Decontaminate.scala:73-79`), spec-asserted here the same way. */
  def noveltyOn(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val sh = docs
      .withColumn("ws", Text.words(col("text")))
      .select(col("doc_id"),
        explode(Text.shinglesOnWords(col("ws"), 3)).as("g"))
      .repartition(col("g"))
    // the aggregate ALSO computes min(doc_id), and the uniqueness test
    // downstream references it — a genuine doc_id dependency that
    // column pruning cannot remove (count(doc_id) alone gets rewritten
    // to count(1) and pruned), so BOTH exchange consumers keep the
    // identical (doc_id, g) schema and ReuseExchange collapses them
    // (the Decontaminate.scala:82-86 rule). For df==1 grams
    // min_doc === doc_id is tautological, so semantics are unchanged.
    val df = sh.groupBy("g").agg(count(lit(1)).as("df"),
      min(col("doc_id")).as("min_doc"))
    sh.join(df, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1 && col("min_doc") === col("doc_id"),
          1L).otherwise(0L)).as("unique_grams"))
      .select(col("doc_id"), col("n_grams"), col("unique_grams"),
        expr("(unique_grams * 1000000) div n_grams").as("novelty_q"))
      .orderBy("doc_id")
  }

  /** D84 — vocabulary coverage / OOV curve: for candidate vocabulary
    * sizes V, what fraction of corpus TOKENS would an encoder limited
    * to the top-V word types fail to cover? The sizing read behind
    * every tokenizer budget ("does 32k buy us 99% coverage or 92%?"),
    * answered from ONE word-frequency table: types rank by
    * (count desc, word) via the R53 two-pass global row_number (the
    * type table is corpus-vocabulary-sized — far smaller than the
    * corpus, but NOT driver-bounded, so no single-partition window),
    * then every candidate V is a conditional sum over the ranked
    * types in ONE aggregation — a per-V re-scan would pay the corpus
    * once per curve point. Exact integers; OOV rates in ppm. */
  val textOovCurve = QueryDef(
    "text_oov_curve",
    (s, d) => {
      val vocabSizes = Seq(100L, 1000L, 10000L)
      val counts = graft.functions.Spread(Tables.documents(s, d),
          col("doc_id"))
        .select(explode(graft.functions.Text.words(col("text")))
          .as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("cnt"))
      val ranked = graft.operators.Ranks.globalRowNumber(
        counts, Seq(col("cnt").desc, col("w")), 8, "rnk")
      val aggCols = Seq(count(lit(1)).as("n_types")) ++
        vocabSizes.map(v =>
          sum(when(col("rnk") <= v, col("cnt")).otherwise(0L))
            .as(s"cov_$v"))
      val one = ranked.agg(sum(col("cnt")).as("total"), aggCols: _*)
      one.select(col("total"), col("n_types"),
          expr(s"stack(${vocabSizes.size}, " +
            vocabSizes.map(v => s"${v}L, cov_$v").mkString(", ") +
            ") as (vocab_size, covered)"))
        .select(col("vocab_size"), col("covered"), col("total"),
          col("n_types"),
          expr("(total - covered) * 1000000 div total").as("oov_ppm"))
        .orderBy("vocab_size")
    },
    Some(s"""WITH w AS (
              SELECT unnest(string_split(${PipelineQueries.oCanon}, ' '))
                AS w
              FROM documents),
            c AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
                  FROM w WHERE w <> '' GROUP BY 1),
            r AS (SELECT cnt,
                    row_number() OVER (ORDER BY cnt DESC, w) AS rnk
                  FROM c),
            a AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                    CAST(count(*) AS BIGINT) AS n_types,
                    ${Seq(100, 1000, 10000).map(v =>
                      s"""CAST(SUM(CASE WHEN rnk <= $v THEN cnt ELSE 0
                         END) AS BIGINT) AS cov_$v""")
                      .mkString(",\n                    ")}
                  FROM r)
            ${Seq(100, 1000, 10000).map(v =>
              s"""SELECT CAST($v AS BIGINT) AS vocab_size,
                     cov_$v AS covered, total, n_types,
                     (total - cov_$v) * 1000000 // total AS oov_ppm
              FROM a""").mkString("\n            UNION ALL\n            ")}
            ORDER BY vocab_size"""))

  val textNovelty = QueryDef(
    "text_novelty",
    (s, d) => noveltyOn(
      graft.functions.Spread(Tables.documents(s, d), col("doc_id"))),
    Some(s"""WITH w AS (SELECT doc_id,
                          string_split(${PipelineQueries.oCanon}, ' ') AS ws
                        FROM documents),
             t AS (SELECT doc_id, list_distinct(list_transform(
                     generate_series(0, greatest(len(ws) - 3, 0)),
                     i -> array_to_string(list_slice(ws, i + 1, i + 3),
                       ' '))) AS sh
                   FROM w),
             e AS (SELECT doc_id, unnest(sh) AS g FROM t),
             df AS (SELECT g, CAST(count(*) AS BIGINT) AS df
                    FROM e GROUP BY 1)
             SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                    CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS unique_grams,
                    CAST((SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END)
                      * 1000000) // count(*) AS BIGINT) AS novelty_q
             FROM e JOIN df ON e.g = df.g
             GROUP BY 1 ORDER BY 1"""))

  /** D80 — heavy-tail exponent of document lengths per source (Hill
    * estimator over the top decile of order statistics): web corpora
    * are length-power-laws, and the tail exponent α is the number
    * behind truncation policy and packing efficiency — α near 1 means
    * a few giant docs dominate token mass, α ≥ 2 means truncation is
    * cosmetic. Hill: α = k / Σ_{i≤k} ln(x_i / x_{k+1}) over the k
    * largest lengths; the rank window is source-partitioned (the R14
    * family), every ln term is floor-quantized to 1e9 BEFORE the
    * integer sum (the D46/JSD convention — no float accumulation can
    * fork the hash), and the single division emits α·1e6. */
  val textLengthTail = QueryDef(
    "text_length_tail",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("n_tok").desc, col("doc_id"))
      val lens = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(Text.words(col("text"))).cast("long").as("n_tok"))
        .withColumn("r", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("source")))
        .withColumn("k", expr("greatest(n div 10, 2L)"))
      val kth = lens.filter(col("r") === col("k") + 1)
        .select(col("source").as("ks"), col("n_tok").as("xk"))
      lens.filter(col("r") <= col("k"))
        .join(kth, col("source") === col("ks"))
        .withColumn("lnq",
          floor(log(col("n_tok").cast("double") / col("xk")) * 1e9)
            .cast("long"))
        .groupBy("source")
        .agg(first(col("k")).as("k"), first(col("xk")).as("xk_tokens"),
          sum(col("lnq")).as("ln_sum_q"))
        .select(col("source"), col("k"), col("xk_tokens"),
          expr("(k * 1000000000000000) div greatest(ln_sum_q, 1)")
            .as("alpha_q"))
        .orderBy("source")
    },
    Some(s"""WITH lens AS (
               SELECT doc_id, source,
                      CAST(len(string_split(${PipelineQueries.oCanon}, ' ')) AS BIGINT)
                        AS n_tok
               FROM documents),
             r AS (SELECT *,
                     row_number() OVER (PARTITION BY source
                       ORDER BY n_tok DESC, doc_id) AS r,
                     count(*) OVER (PARTITION BY source) AS n
                   FROM lens),
             kk AS (SELECT *, greatest(n // 10, 2) AS k FROM r),
             kth AS (SELECT source AS ks, n_tok AS xk FROM kk
                     WHERE r = k + 1),
             terms AS (
               SELECT kk.source, kk.k, kth.xk,
                      CAST(floor(ln(CAST(kk.n_tok AS DOUBLE) / kth.xk) * 1e9)
                        AS BIGINT) AS lnq
               FROM kk JOIN kth ON kk.source = kth.ks
               WHERE kk.r <= kk.k)
             SELECT source, CAST(ANY_VALUE(k) AS BIGINT) AS k,
                    CAST(ANY_VALUE(xk) AS BIGINT) AS xk_tokens,
                    CAST((ANY_VALUE(k) * 1000000000000000)
                      // greatest(SUM(lnq), 1) AS BIGINT) AS alpha_q
             FROM terms GROUP BY source ORDER BY source"""))

  def all: Seq[QueryDef] = Seq(textEntropyJsd, textTfidfKeywords,
    textReadability, textNovelty, textLengthTail, textOovCurve)
}
