package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D25: BM25 relevance scoring of a corpus against a small query term
  * set (Robertson & Zaragoza, "The Probabilistic Relevance Framework:
  * BM25 and Beyond", FnTIR 2009) — the standard retrieval/quality
  * signal a training-data pipeline uses to rank or filter documents
  * against a topic seed list.
  *
  * Scale shape: per-document term frequencies come from CLOSED
  * array-filter lambdas over the token array — no token explode, so no
  * rows × tokens blow-up and no shuffle of the token stream (the
  * explode formulation shuffles every token of 100 TB of text; this one
  * shuffles nothing). Corpus statistics (N, Σdl, per-term document
  * frequencies) reduce to ONE single-row aggregate that broadcasts
  * back; scoring is then embarrassingly parallel map-side arithmetic.
  * The query term set is small by contract (a seed list, not a corpus —
  * the per-term tf/df columns are plan-width-bounded by it).
  *
  * Determinism: tf/dl/df/N are exact integers; each per-term
  * contribution is double arithmetic from exact ints (bit-stable for a
  * fixed expression tree); contributions are quantized to DECIMAL(38,6)
  * before the fixed-order sum so the oracle's sum matches bit-for-bit.
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  /** `docsWithToks` must carry `doc_id` and a `toks` array<string>
    * column. Emits (doc_id, dl, n_terms_hit, bm25) for EVERY document
    * (zero-hit docs score 0 — keeping them makes the output a total
    * function of the corpus, which downstream mixture sampling wants).
    */
  def scores(docsWithToks: DataFrame, terms: Seq[String],
      k1: Double = K1, b: Double = B): DataFrame = {
    require(terms.nonEmpty && terms.size <= 64,
      s"Bm25: query term set must be 1..64 terms, got ${terms.size}")
    val sized = docsWithToks.select(
      col("doc_id") +: size(col("toks")).cast("long").as("dl") +:
        terms.map(t =>
          size(filter(col("toks"), x => x === lit(t))).cast("long").as(s"tf_$t")): _*)
    // ONE row of corpus stats: N, Σdl, df per term
    val statCols = count(lit(1)).as("n") +: sum(col("dl")).as("sumdl") +:
      terms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = sized.agg(statCols.head, statCols.tail: _*)
    val withStats = sized.crossJoin(broadcast(stats))
    val avgdl = col("sumdl").cast("double") / col("n")
    def contrib(t: String): Column = {
      val tf = col(s"tf_$t")
      val df = col(s"df_$t")
      val idf = log((col("n") - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    }
    withStats.select(
      col("doc_id"),
      col("dl"),
      terms.map(t => when(col(s"tf_$t") > 0, 1L).otherwise(0L))
        .reduce(_ + _).as("n_terms_hit"),
      round(terms.map(t => contrib(t).cast("decimal(38,6)")).reduce(_ + _), 4)
        .cast("double").as("bm25"))
  }
}
