package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D38 — BPE merge-rule training (the tokenizer-training loop) as
  * distributed DataFrame ops.
  *
  * Byte-pair-encoding training is THE corpus-scale tokenizer job: count
  * adjacent symbol pairs (weighted by word frequency), merge the most
  * frequent pair everywhere, repeat. The classic scale trick makes this
  * tractable on 100 TB: the corpus collapses to a (word-type, freq)
  * table FIRST — one groupBy over the token stream — and the merge loop
  * runs over vocabulary-scale state (one row per distinct word, its
  * symbols as an array column), never touching the corpus again.
  *
  * Per iteration:
  *   1. pair counts: zip_with over two aligned slices of the symbol
  *      array → explode → one shuffle keyed on (left, right);
  *   2. rule selection: global top-1 by (count desc, pair asc) — a
  *      single-row driver materialization, the only one in the loop
  *      (same O(1) class as PageRank's node count);
  *   3. merge application: a map-side higher-order `aggregate` fold
  *      over each symbol array — greedy left-to-right non-overlapping,
  *      exactly the sequential BPE semantics ("aaa" + rule (a,a) →
  *      ["aa","a"], not ["aa","aa"]) — no shuffle, no UDF.
  * Each round's state is localCheckpoint'ed so loop lineage stays O(1)
  * deep (the [[graft.dedup.Clusters]] / Graph.pageRank convention).
  *
  * Reference analogue: the reference has no tokenizer, but its
  * dictionary-build-then-apply shape (ZipCodeHelpers.cs:12-15) is the
  * same train-artifact-then-broadcast pattern as D32's vocab encode;
  * BPE training supplies the artifact end of that pair for subword
  * tokenization.
  */
object Bpe {

  /** One learned merge rule. `pairCount` is the weighted pair frequency
    * AT SELECTION TIME (i.e. after all earlier merges applied). */
  final case class Rule(iter: Int, left_sym: String, right_sym: String,
      merged: String, pair_count: Long)

  /** Corpus → (word-type, freq). The single corpus-scale pass. */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(Text.words(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Train up to `iters` merge rules over a (w, freq) word-type table.
    * Returns the rules in training order — the model artifact is
    * O(iters), everything else stays distributed. Stops early if the
    * corpus runs out of adjacent pairs. */
  def train(wordFreq: DataFrame, iters: Int): Seq[Rule] = {
    // initial symbols: one single-character symbol per char
    var state = wordFreq.select(col("freq"),
      transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("syms"))
      .localCheckpoint()

    val rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var exhausted = false
    for (it <- 1 to iters if !exhausted) {
      val n1 = greatest(size(col("syms")) - 1, lit(0))
      val top = state.select(col("freq"),
          explode(zip_with(
            slice(col("syms"), lit(1), n1),
            slice(col("syms"), lit(2), n1),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        // deterministic rule order: count desc, then lexicographic pair
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      top.headOption match {
        case None => exhausted = true
        case Some(r) =>
          val (a, b) = (r.getString(0), r.getString(1))
          val m = a + b
          rules += Rule(it, a, b, m, r.getLong(2))
          // greedy left-to-right fold; try_element_at (NOT element_at,
          // which throws under ANSI) is NULL on the empty accumulator →
          // `when` falls through to append
          val merge = aggregate(
            col("syms"),
            lit(Array.empty[String]),
            (acc, s) =>
              when(try_element_at(acc, lit(-1)) === lit(a) && s === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
              .otherwise(concat(acc, array(s))))
          state = state.select(col("freq"), merge.as("syms"))
            .localCheckpoint()
      }
    }
    rules.toSeq
  }

  /** The D38 entry body: rules as a DataFrame, ordered by iteration. */
  def trainedRules(spark: SparkSession, docs: DataFrame,
      iters: Int): DataFrame = {
    import spark.implicits._
    train(wordFreqs(docs), iters).toDF().orderBy("iter")
  }

  /** Greedy left-to-right application of one merge rule to a symbol
    * array — the same fold [[train]] uses for its state update, so
    * encode and train share one semantics by construction. */
  def applyRule(syms: org.apache.spark.sql.Column, a: String,
      b: String): org.apache.spark.sql.Column =
    aggregate(
      syms,
      lit(Array.empty[String]),
      (acc, s) =>
        when(try_element_at(acc, lit(-1)) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** D48 — tokenizer APPLICATION (the other half of the train/apply
    * pair): encode a corpus with an ordered rule list. The scale shape
    * is dictionary encoding: rules fold over the distinct WORD-TYPE
    * table (Zipf: word types ≪ corpus tokens), and the corpus token
    * stream joins the tiny word→symbols dictionary — at 100 TB that
    * join broadcasts a vocabulary, it never re-tokenizes per
    * occurrence. Per doc: word count, subword count, and the first
    * `prefixLen` subword tokens in document order (deterministic via
    * sort_array over (pos, syms) structs).
    */
  def encode(docs: DataFrame, rules: Seq[Rule],
      prefixLen: Int = 12): DataFrame = {
    val docWords = docs
      .select(col("doc_id"), posexplode(Text.words(col("text"))).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
    val initial = docWords.select("w").distinct()
      .select(col("w"), transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("syms"))
    // unrolled rule folds — all map-side, one projection per rule
    val dict = rules.foldLeft(initial) { (st, r) =>
      st.select(col("w"), applyRule(col("syms"), r.left_sym, r.right_sym).as("syms"))
    }
    docWords.join(dict, "w")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(size(col("syms"))).as("n_subtokens"),
        array_join(
          slice(flatten(transform(
            sort_array(collect_list(struct(col("pos"), col("syms")))),
            p => p.getField("syms"))), 1, prefixLen), " ").as("tok_prefix"))
  }
}
