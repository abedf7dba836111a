package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D28: bigram language-model scoring — per-document mean negative
  * log-likelihood under a Laplace-smoothed bigram model trained on the
  * corpus itself (the perplexity-filtering signal; CCNet-style, Wenzek
  * et al. 2020).
  *
  * Scale shape: the bigram explode IS the inherent LM-training shuffle
  * (counts are corpus-wide aggregates); the context (`c1`) and bigram
  * (`c2`) count tables shuffle on their keys; the per-TYPE probability
  * table (O(types)) is assembled from them with O(types) joins and the
  * corpus-sized occurrence stream then joins that ONE table on g2 —
  * r13 reshape: the previous form joined the occurrence stream to each
  * count table separately (2–4 corpus-sized exchanges where one
  * suffices), and evaluated the `ln` once PER OCCURRENCE instead of
  * once per type. Same doubles — the lp expression is unchanged, only
  * computed at type granularity — so every memoized oracle value
  * carries over.
  *
  * `hashKeys = true` (the production default — r5 verdict item 6)
  * keys every one of those shuffles on 8-byte xxhash64 values instead
  * of the raw strings: a bigram string is ~2 words of bytes carried
  * through the count-table groupBys and the join-back, a multi-×
  * bandwidth amplifier at 100 TB. Counting hashes instead of strings
  * leaves every count — and therefore the NLL — identical unless two
  * distinct grams collide in 64 bits (~n²/2⁶⁵; irrelevant at any
  * corpus size that fits a cluster), the same trade
  * [[graft.dedup.Decontaminate]] documents for `hashGrams`. String
  * mode is kept because it is what DuckDB can mirror — the oracle
  * entries gate it — and the spec asserts both modes emit the
  * identical (doc_id, n_bigrams, nll) table.
  *
  * Determinism: counts are exact ints; each log term is
  * double-from-ints quantized to DECIMAL(38,6) before the per-doc sum
  * (order-independent), divided once by the exact bigram count. The
  * lambdas below reference only the MATERIALIZED `ws` attribute (cheap
  * per-element re-read), never an unmaterialized expression — the HOF
  * free-reference rule.
  */
object LmScore {

  /** The (doc_id, w1, w2, g2) bigram-occurrence stream. */
  private def bigrams(docs: DataFrame, hashKeys: Boolean): DataFrame = {
    val withWs = Spread(docs, col("doc_id"))
      .withColumn("ws", Text.words(col("text")))
    val bigramExpr =
      if (hashKeys)
        """CASE WHEN size(ws) >= 2 THEN
             transform(sequence(1, size(ws) - 1),
               i -> struct(xxhash64(element_at(ws, i)) AS w1,
                           xxhash64(element_at(ws, i + 1)) AS w2,
                           xxhash64(element_at(ws, i), element_at(ws, i + 1)) AS g2))
           ELSE CAST(array() AS array<struct<w1:bigint,w2:bigint,g2:bigint>>) END"""
      else
        """CASE WHEN size(ws) >= 2 THEN
             transform(sequence(1, size(ws) - 1),
               i -> struct(element_at(ws, i) AS w1,
                           element_at(ws, i + 1) AS w2,
                           concat(element_at(ws, i), ' ', element_at(ws, i + 1)) AS g2))
           ELSE CAST(array() AS array<struct<w1:string,w2:string,g2:string>>) END"""
    withWs
      .select(col("doc_id"), explode(expr(bigramExpr)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"),
        col("b.g2").as("g2"))
  }

  /** Per-doc mean NLL from an occurrence stream and a per-type lp
    * table — the one corpus-sized exchange (join on g2) plus the doc
    * aggregation; the DECIMAL(38,6) quantization before the sum is the
    * order-independence convention. */
  private def docScores(bi: DataFrame, typeLp: DataFrame,
      nllCol: String): DataFrame =
    bi.select("doc_id", "g2")
      .join(typeLp.select("g2", "lp"), "g2")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round((-sum(col("lp").cast("decimal(38,6)"))).cast("double") /
          count(lit(1)), 4).as(nllCol))
      .orderBy("doc_id")

  /** Laplace per-type table: (g2, c2, c1, v, lp). The context totals
    * DERIVE from the type table (Σ c(w1·) over types) — an O(types)
    * aggregation instead of a second full corpus shuffle keyed on
    * w1 — and |V| is a 1-row broadcast. */
  private def laplaceTypeLp(docs: DataFrame, hashKeys: Boolean): DataFrame = {
    val bi = bigrams(docs, hashKeys)
    val c2t = bi.groupBy("g2").agg(count(lit(1)).as("c2"), min("w1").as("tw1"))
    val c1 = c2t.groupBy("tw1").agg(sum("c2").as("c1"))
      .withColumnRenamed("tw1", "w1")
    // |V| over hashes equals |V| over words modulo the same negligible
    // collision bound, and the distinct then shuffles longs, not words
    val withWs = Spread(docs, col("doc_id"))
      .withColumn("ws", Text.words(col("text")))
    val wordCol =
      if (hashKeys) xxhash64(col("word")) else col("word")
    val vocab = withWs.select(explode(col("ws")).as("word"))
      .agg(countDistinct(wordCol).as("v"))
    c2t.withColumnRenamed("tw1", "w1")
      .join(c1, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("g2"), col("c2"), col("c1"), col("v"),
        log((col("c2") + lit(1.0)) / (col("c1") + col("v"))).as("lp"))
  }

  def score(docs: DataFrame, hashKeys: Boolean = true): DataFrame =
    docScores(bigrams(docs, hashKeys), laplaceTypeLp(docs, hashKeys), "nll")

  /** D105: interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995;
    * Chen & Goodman 1999 §3) — the smoothing real n-gram filters used
    * where D28's Laplace is the teaching baseline. KN's insight is
    * COUNT-OF-CONTEXTS: the backoff weight of a word is how many
    * DISTINCT left contexts it follows ("francisco" is frequent but
    * only ever follows "san" — KN backs it off to near zero; Laplace
    * can't tell). P(w2|w1) = (c(w1w2) − δ)/c(w1) +
    * δ·N1+(w1,·)/c(w1) · N1+(·,w2)/N1+(·,·), δ = 0.75.
    *
    * Scale shape = D28's plus one table: the bigram TYPE table
    * (O(types), derived from the c2 aggregate at no extra shuffle over
    * the corpus) yields the three continuation counts as bounded
    * aggregations, all joined at TYPE granularity (`hashKeys = true`
    * → 8-byte keys, the D28 production trade). Self-scoring means
    * every scored bigram was seen (c ≥ 1 > δ), so both interpolation
    * terms are positive and the ln argument never degenerates.
    *
    * Determinism: all counts exact; the per-type probability is ONE
    * fixed double expression (identical parenthesization in the SQL
    * mirror), each ln term DECIMAL(38,6)-quantized before the per-doc
    * sum (the D28 convention). The per-type table — counts AND the lp
    * double, the model's ONE transcendental stage — is what the
    * fixture oracle dumps ([[knTypeLp]]): DuckDB re-derives every
    * count exactly, bounds the fixture lp against its own ln, and
    * replays the doc aggregation from the FIXTURE doubles, so no ln is
    * ever evaluated independently by two libms on the gated path (the
    * r12 sf1 knife-edge: one bigram's Math.log-vs-ln ulp landed on a
    * DECIMAL(38,6) quantization boundary in 1 doc of 50,000). */
  def knTypeLp(docs: DataFrame, hashKeys: Boolean = true): DataFrame = {
    val bi = bigrams(docs, hashKeys)
    // bigram types with occurrence counts; min() over the constant
    // per-group w1/w2 is deterministic (first() is not)
    val types = bi.groupBy("g2").agg(
      count(lit(1)).as("c2"), min("w1").as("tw1"), min("w2").as("tw2"))
    // context total AND forward continuation count share the key (w1)
    // — ONE aggregation over the types table feeds both (r13: the
    // split form paid a second O(types) shuffle and a second join)
    val c1n1f = types.groupBy("tw1")
      .agg(sum("c2").as("c1"), count(lit(1)).as("n1f"))
      .withColumnRenamed("tw1", "w1")
    val n1b = types.groupBy("tw2").agg(count(lit(1)).as("n1b"))
      .withColumnRenamed("tw2", "w2")
    val tTot = types.agg(count(lit(1)).as("t_types"))
    val lp = log(
      (col("c2").cast("double") - lit(0.75)) / col("c1") +
        lit(0.75) * col("n1f") / col("c1") *
          (col("n1b").cast("double") / col("t_types")))
    types.withColumnRenamed("tw1", "w1").withColumnRenamed("tw2", "w2")
      .join(c1n1f, "w1")
      .join(n1b, "w2")
      .crossJoin(broadcast(tTot))
      .select(col("g2"), col("c2"), col("c1"), col("n1f"), col("n1b"),
        col("t_types"), lp.as("lp"))
  }

  def scoreKn(docs: DataFrame, hashKeys: Boolean = true): DataFrame =
    docScores(bigrams(docs, hashKeys), knTypeLp(docs, hashKeys), "nll_kn")
}
