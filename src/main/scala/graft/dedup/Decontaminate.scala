package graft.dedup

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D20: benchmark decontamination — flag training documents that share
  * a verbatim word k-gram with any document of a benchmark/eval set
  * (the standard guard against test-set leakage into training data;
  * cf. the 13-gram overlap rule popularized by GPT-3's appendix and
  * the open reproductions of it).
  *
  * Shape: per-doc DISTINCT k-grams (explode, one row per (doc, gram)),
  * a document-frequency valve dropping grams shared by more than
  * `maxDocsPerGram` docs (a boilerplate gram — license headers, common
  * phrases — would otherwise create a quadratic bucket AND flag half
  * the corpus as "contaminated" on noise), then an equi-join
  * gram-to-gram against the benchmark side. Work is linear in total
  * grams plus bucket-bounded join output; never all-pairs.
  *
  * `hashGrams = true` (the production default) keys every shuffle on
  * the 8-byte combined word-hash of the gram ([[Text.shingleHashes]])
  * instead of the gram STRING — at k = 5 a string gram is ~5 words of
  * bytes through two shuffles, a ~5× bandwidth amplifier at 100 TB.
  * `false` keeps string grams so the whole operator (valve included)
  * is SQL-mirrorable — that is what the oracle entry gates; both modes
  * flag identical doc sets (spec-asserted). One edge differs by
  * design: a document SHORTER than k words contributes one whole-doc
  * shingle in hashed mode ([[Text.shingleHashes]] floors at one) and
  * none in string mode — i.e. hashed mode additionally catches
  * verbatim short-doc matches.
  */
object Decontaminate {

  /** (doc_id, gram) — distinct word k-grams per document, NO df valve. */
  private def rawGrams(docs: DataFrame, k: Int,
      hashGrams: Boolean): DataFrame = {
    val spread = graft.functions.Spread(docs, col("doc_id"))
      .select(col("doc_id"), Text.words(col("text")).as("ws"))
    val gramCol =
      if (hashGrams) explode(Text.shingleHashes(col("ws"), k))
      // sequence(1, n) DESCENDS when n < 1 — guard short docs explicitly
      else explode(expr(
        s"CASE WHEN size(ws) >= $k THEN " +
          s"transform(sequence(1, size(ws) - ${k - 1}), i -> array_join(slice(ws, i, $k), ' ')) " +
          "ELSE CAST(array() AS array<string>) END"))
    spread
      .select(col("doc_id"), gramCol.as("gram"))
      .distinct()
  }

  /** (doc_id, gram) — distinct word k-grams per document, df-valved. */
  def docGrams(docs: DataFrame, k: Int, maxDocsPerGram: Int,
      hashGrams: Boolean = true): DataFrame = {
    val grams = rawGrams(docs, k, hashGrams)
    // df == docs-per-gram because grams are per-doc distinct
    val ok = grams.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocsPerGram)
      .select("gram")
    grams.join(ok, Seq("gram")).select("doc_id", "gram")
  }

  /** Training doc_ids sharing any k-gram with a DIFFERENT benchmark
    * document. `isBench` marks the benchmark subset by doc_id. */
  def flagged(docs: DataFrame, isBench: Column => Column, k: Int = 5,
      maxDocsPerGram: Int = 100, hashGrams: Boolean = true): DataFrame = {
    val grams = docGrams(docs, k, maxDocsPerGram, hashGrams)
    val bench = grams.filter(isBench(col("doc_id")))
      .withColumnRenamed("doc_id", "bench_doc")
    grams.join(bench, Seq("gram"))
      .filter(col("doc_id") =!= col("bench_doc"))
      .select("doc_id")
      .distinct()
  }

  /** The eval-set-shaped variant of [[flagged]]: real decontamination
    * joins a TINY benchmark (thousands of docs) against a huge corpus,
    * so the bench gram set fits in a broadcast and the corpus gram side
    * must NOT shuffle corpus-wide beyond its per-doc distinct.
    *
    * Same flag set as [[flagged]] (spec-asserted), different plan: the
    * corpus-wide df-valve groupBy — a full shuffle of every gram in the
    * corpus — is replaced by a broadcast semi-join down to `touched`
    * (docs carrying any bench gram) FIRST. For a bench gram, df over
    * `touched` EQUALS corpus-wide df (every doc carrying that gram is
    * in `touched` by construction), so valving after the cut preserves
    * the exact valve semantics while the df aggregation shuffles only
    * the contamination candidates, not the corpus. */
  def flaggedBroadcastBench(docs: DataFrame, isBench: Column => Column,
      k: Int = 5, maxDocsPerGram: Int = 100,
      hashGrams: Boolean = true): DataFrame = {
    val grams = rawGrams(docs, k, hashGrams)
    // (gram, bench_doc): tiny by the eval-set contract; computed from
    // the bench docs only, so the filter prunes before gram explosion
    val benchGrams = grams.filter(isBench(col("doc_id")))
      .withColumnRenamed("doc_id", "bench_doc")
    val touched = grams
      .join(broadcast(benchGrams.select("gram").distinct()), Seq("gram"))
    // df valve on the matched subset == corpus-wide df for bench grams
    val ok = touched.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocsPerGram)
      .select("gram")
    touched
      .join(broadcast(ok), Seq("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .filter(col("doc_id") =!= col("bench_doc"))
      .select("doc_id")
      .distinct()
  }
}
