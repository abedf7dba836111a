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
    * document. `isBench` marks the benchmark subset by doc_id.
    *
    * Plan shape (r5 verdict fix): the df valve and the bench occupancy
    * of each gram are computed in ONE aggregation over the gram set —
    * `n_bench` (bench docs carrying the gram) and `bench_doc` (the one
    * bench carrier when n_bench == 1) — and a single join-back decides
    * "shares with a DIFFERENT bench doc" per (doc, gram): either two
    * bench docs carry the gram, or its sole bench carrier is another
    * doc. This replaces the former valve-join + bench self-join, and
    * the explicit repartition on `gram` pins BOTH consumers (the
    * aggregate and the join-back) to one identical exchange subtree
    * that Spark's ReuseExchange collapses — the expensive
    * explode→distinct executes once (spec-asserted: one Generate in
    * the final adaptive plan). Without it the per-doc distinct rides
    * the Spread's doc_id partitioning and each consumer re-derives the
    * grams from that exchange instead. */
  def flagged(docs: DataFrame, isBench: Column => Column, k: Int = 5,
      maxDocsPerGram: Int = 100, hashGrams: Boolean = true): DataFrame = {
    // the bench flag is computed INSIDE the aggregate (not as a column
    // before the exchange) so both exchange consumers prune to the
    // identical (doc_id, gram) schema — a pre-computed is_b column
    // would be pruned from the join-back branch only, breaking
    // sameResult and with it the exchange reuse
    val grams = rawGrams(docs, k, hashGrams).repartition(col("gram"))
    val isB = isBench(col("doc_id"))
    val perGram = grams.groupBy("gram").agg(
        count(lit(1)).as("df"),
        sum(when(isB, lit(1L)).otherwise(lit(0L))).as("n_bench"),
        min(when(isB, col("doc_id"))).as("bench_doc"))
      .filter(col("df") <= maxDocsPerGram && col("n_bench") >= 1)
    grams.join(perGram, Seq("gram"))
      .filter(col("n_bench") >= 2 || col("bench_doc") =!= col("doc_id"))
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

  /** D107 — contaminated-span EXCISION: instead of dropping a flagged
    * document (D20 family), cut out exactly the tokens covered by a
    * bench k-gram and keep the rest — the surgical option real
    * pipelines prefer when contamination is a quoted benchmark item
    * inside an otherwise-good document (Lee et al.'s span semantics
    * from D50, with the bad-gram set being the BENCHMARK's grams
    * instead of corpus-repeated grams). Returns per train doc: token
    * count, excised count, md5 of the rebuilt text, changed flag.
    *
    * Shape: positional k-grams explode map-side over TRAIN docs only;
    * the bench gram set is an eval-set-sized broadcast (the D20b
    * contract); covered positions expand k-fold and collapse in one
    * (doc, tok) distinct; reassembly is one doc-keyed aggregation over
    * the surviving tokens (the D93 rebuild). Nothing shuffles
    * corpus-wide except the final per-doc aggregation.
    */
  def excised(docs: DataFrame, isBench: Column => Column,
      k: Int = 5): DataFrame = {
    val withWs = graft.functions.Spread(docs, col("doc_id"))
      .select(col("doc_id"), graft.functions.Text.words(col("text")).as("ws"))
      .withColumn("n_tokens", size(col("ws")))
    val train = withWs.filter(!isBench(col("doc_id")))
    val grams = train.filter(col("n_tokens") >= k)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("ws")) - k),
          i => array_join(slice(col("ws"), i + lit(1), lit(k)), " ")))
          .as(Seq("pos", "gram")))
    val benchGrams = withWs.filter(isBench(col("doc_id")))
      .filter(col("n_tokens") >= k)
      .select(explode(transform(
        sequence(lit(0), size(col("ws")) - k),
        i => array_join(slice(col("ws"), i + lit(1), lit(k)), " ")))
        .as("gram"))
      .distinct()
    val covered = grams.join(broadcast(benchGrams), Seq("gram"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tok"))
      .distinct()
      .withColumn("cut", lit(true))
    val tokens = train
      .select(col("doc_id"), col("n_tokens"),
        posexplode(col("ws")).as(Seq("tok", "word")))
    tokens.join(covered, Seq("doc_id", "tok"), "left")
      .groupBy("doc_id")
      .agg(
        min(col("n_tokens")).as("n_tokens"), // constant per group; min is the deterministic pick
        sum(when(col("cut"), lit(1L)).otherwise(lit(0L))).as("n_excised"),
        md5(coalesce(
          array_join(
            transform(
              array_sort(collect_list(when(col("cut").isNull,
                struct(col("tok"), col("word"))))),
              x => x("word")),
            " "),
          lit("")).cast("binary")).as("rebuilt_hash"))
      .withColumn("changed", col("n_excised") > 0)
      .orderBy("doc_id")
  }

  /** D45: [[flaggedBroadcastBench]] with the R31 runtime-filter
    * primitive as the cut: corpus grams probe a BLOOM of the bench
    * gram set map-side (`graft_might_contain`, codegen'd below any
    * shuffle) instead of broadcast-semi-joining it. Same exact flag
    * set: the bloom has no false negatives, so every true bench-gram
    * carrier survives to the exact join-back (which also kills the
    * ≤ fpp false positives), and for bench grams the df over probe
    * survivors still equals corpus-wide df. Why it matters at scale:
    * the bloom is O(bits) per task regardless of bench-gram
    * cardinality — a 1M-gram eval suite probes from a ~1.1 MB plan
    * constant where the broadcast hash relation costs two orders of
    * magnitude more per executor — and the probe prunes ~(1 − sel −
    * fpp) of corpus grams before ANY join machinery. */
  def flaggedBloomBench(docs: DataFrame, isBench: Column => Column,
      k: Int = 5, maxDocsPerGram: Int = 100, hashGrams: Boolean = true,
      fpp: Double = 0.01): DataFrame = {
    val grams = rawGrams(docs, k, hashGrams)
    val benchGrams = grams.filter(isBench(col("doc_id")))
      .withColumnRenamed("doc_id", "bench_doc")
    def probeKey(c: Column): Column =
      if (hashGrams) c else xxhash64(c)
    val bytes = graft.operators.Bloom.keyFilterBytes(
      benchGrams.select(probeKey(col("gram")).as("bk")), "bk", fpp)
    val touched = grams.filter(call_function("graft_might_contain",
      probeKey(col("gram")).cast("long"), lit(bytes)))
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
