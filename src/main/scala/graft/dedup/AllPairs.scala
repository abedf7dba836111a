package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Spread, Text}

/** D47 — EXACT all-pairs set-similarity self-join via prefix filtering
  * (the AllPairs/PPJoin family: Bayardo et al., WWW'07; Chaudhuri et
  * al., ICDE'06 — public literature). Complements the probabilistic
  * candidate generators (D2 MinHash-LSH, D3 SimHash): those trade
  * recall for speed; this one returns EXACTLY the pairs with
  * Jaccard ≥ τ — no recall loss — while still never materializing the
  * quadratic pair space.
  *
  * The trick: impose one global total order on the shingle universe —
  * ascending document frequency, ties by value — and keep only each
  * set's first `n − ⌈τ·n⌉ + 1` shingles (its "prefix"). Any pair with
  * J ≥ τ has overlap ≥ ⌈τ·max(nₐ,n_b)⌉, and by pigeonhole the FIRST
  * common shingle in the global order sits inside both prefixes, so an
  * equi-join on prefix shingles loses no qualifying pair. Because the
  * order is df-ASCENDING, prefixes are built from the RAREST shingles:
  * the join key distribution is anti-skewed by construction (the
  * boilerplate shingle every doc shares is the one shingle prefixes
  * avoid), which is the property that keeps the candidate join linear
  * at 100 TB where a naive token join would square on hot keys.
  *
  * Shuffle budget: one df aggregation (map-side combinable), one
  * df join-back + per-doc window, one candidate equi-join on rare
  * shingles, one distinct, two set join-backs for verification — all
  * keyed joins, never a cross product.
  *
  * `hashed = true` (production) runs the identical pipeline over
  * 64-bit xxhash shingle hashes — ~an order of magnitude less shuffle
  * bandwidth than shingle strings; `hashed = false` keeps string
  * shingles so DuckDB can mirror every step (the oracle entry). The
  * spec proves both modes emit the identical pair set.
  *
  * Reference analogue: the reference dedups only by exact key
  * (Net7-ETL-Bus `ZipCodeCacheService.cs` keyed upsert); exact
  * similarity join is part of the LLM-curation surface this engine
  * adds on top.
  */
object AllPairs {

  /** (doc_id, sh, n): distinct shingle set per doc + its cardinality. */
  def shingleSets(docs: DataFrame, k: Int, hashed: Boolean): DataFrame = {
    val withWs = Spread(docs, col("doc_id"))
      .select(col("doc_id"), Text.words(col("text")).as("ws"))
    val sh =
      if (hashed) array_distinct(Text.shingleHashes(col("ws"), k))
      else array_distinct(transform(
        sequence(lit(0), greatest(size(col("ws")) - k, lit(0))),
        i => array_join(slice(col("ws"), i + lit(1), lit(k)), " ")))
    withWs.select(col("doc_id"), sh.as("sh"))
      .withColumn("n", size(col("sh")))
  }

  /** The verifier keeps pairs by ROUNDED similarity (`round(J, 6) ≥ τ`
    * / `floor(c·1e6) ≥ ⌊τ·1e6⌋`), so a pair with true similarity a
    * hair under τ can still qualify. Every pruning bound therefore
    * uses this RELAXED threshold: strictly below τ − 5e-7, so no
    * boundary pair is ever pruned, while costing no measurable
    * selectivity. Relaxing τ only LENGTHENS prefixes (⌈τ'·n⌉ ≤ ⌈τ·n⌉)
    * and LOOSENS the length/positional bounds — always the safe
    * direction, including against double-rounding of τ'·n itself. */
  private def tauLow(tau: Double): Double = tau - 1e-6

  /** Prefix tokens: each doc's first n − ⌈τ'·n⌉ + 1 shingles in global
    * (df asc, value asc) order (τ' the round-slackened τ). Carries the
    * set size `n`, the token's global-order position `rn` (1-based,
    * over the FULL sorted set) and the token's corpus df — the inputs
    * the PPJoin-style length/positional filters in [[candidatePairs]]
    * need. Exposed for the spec's pruning assert. */
  def prefixTokens(sets: DataFrame, tau: Double): DataFrame = {
    val toks = sets.select(col("doc_id"), col("n"), explode(col("sh")).as("tok"))
    val dfTab = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    toks.join(dfTab, "tok")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("tok"))))
      .filter(col("rn") <= col("n") - ceil(lit(tauLow(tau)) * col("n")) + lit(1))
      .select("doc_id", "tok", "n", "rn", "df")
  }

  /** Candidate (doc_a < doc_b) pairs sharing ≥1 prefix shingle,
    * pruned by the exactness-preserving AllPairs/PPJoin filters
    * (Bayardo et al. WWW'07; Xiao et al. WWW'08 — public literature):
    *
    *  - df ≥ 2: a prefix shingle occurring in ONE doc corpus-wide can
    *    only self-join; dropping it before the join loses no pair and
    *    removes the (rarest-first, hence df-1-heavy) bulk of the
    *    prefix stream.
    *  - length filter: J ≥ τ forces min(nₐ,n_b) ≥ τ·max(nₐ,n_b), so
    *    size-mismatched candidates never verify — prune them before
    *    the distinct + set join-backs.
    *  - positional filter: sort both shingle lists by the global
    *    order; for the pair's FIRST common shingle (positions i, j —
    *    everything before it on either side is non-shared), overlap
    *    ≤ 1 + min(nₐ−i, n_b−j), while J ≥ τ needs overlap ≥
    *    τ/(1+τ)·(nₐ+n_b). Rows failing the bound can be dropped: the
    *    first-common-shingle row of every qualifying pair passes, and
    *    one surviving row per pair is all the distinct needs.
    *
    * All bounds use the round-slackened τ' ([[tauLow]]) with a 1e-9
    * float-guard, so no `round(J,6) ≥ τ` pair is ever lost. */
  def candidatePairs(sets: DataFrame, tau: Double): DataFrame = {
    val t = tauLow(tau)
    val pref = prefixTokens(sets, tau).filter(col("df") >= 2)
    pref.as("pa").join(pref.as("pb"),
        col("pa.tok") === col("pb.tok") && col("pa.doc_id") < col("pb.doc_id")
          && col("pa.n") >= lit(t) * col("pb.n")
          && col("pb.n") >= lit(t) * col("pa.n")
          && (lit(1) + least(col("pa.n") - col("pa.rn"),
                col("pb.n") - col("pb.rn"))).cast("double")
             >= lit(t / (1.0 + t)) * (col("pa.n") + col("pb.n")) - lit(1e-9))
      .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"))
      .distinct()
  }

  /** D68 — EXACT containment join: ordered pairs (A, B) with
    * |A∩B| / |A| ≥ τ, A the smaller set ((n, id) order). The
    * asymmetric relation symmetric Jaccard cannot see: an excerpt
    * quoted inside a long document has containment ≈ 1 but Jaccard
    * ≈ n_a/n_b ≈ 0 — the quote/excerpt/syndication detector.
    *
    * Exactness via one-sided prefix filtering: containment ≥ τ forces
    * overlap ≥ ⌈τ·n_a⌉, so A∖B has at most n_a − ⌈τ·n_a⌉ shingles and
    * A's (df-asc) prefix of n_a − ⌈τ·n_a⌉ + 1 must hit B — only the
    * CONTAINED side prunes (no useful lower bound exists on the
    * container side; indexing the full big side is how published
    * containment joins work too). The join stays anti-skewed because
    * the pruned side's keys are its RAREST shingles; per-key work is
    * prefix-occurrences × df, both small for rare keys. Verification
    * is the exact array_intersect on candidate pairs only. */
  def containedPairs(docs: DataFrame, k: Int = 3, tau: Double = 0.8,
      hashed: Boolean = true): DataFrame = {
    val sets = shingleSets(docs, k, hashed).cache()
    // df ≥ 2 prune (see candidatePairs): a shingle occurring in one
    // doc corpus-wide cannot hit a DIFFERENT doc's full set
    val prefA = prefixTokens(sets, tau).filter(col("df") >= 2)
    val fullB = sets.select(col("doc_id").as("doc_b"), col("n").as("n_b"),
      explode(col("sh")).as("tok"))
    val cand = prefA.join(fullB,
        prefA("tok") === fullB("tok") &&
          (col("n") < col("n_b") ||
            (col("n") === col("n_b") && col("doc_id") < col("doc_b"))))
      .select(col("doc_id").as("doc_a"), col("doc_b"))
      .distinct()
    val thr = math.floor(tau * 1e6).toLong
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("n").as("n_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .withColumn("n_shared",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("containment_q",
        floor(col("n_shared") * lit(1e6) / col("n_a")).cast("long"))
      .filter(col("containment_q") >= thr)
      .select(col("doc_a"), col("doc_b"), col("n_a").cast("long").as("n_a"),
        col("n_shared"), col("containment_q"))
  }

  /** All pairs with round(Jaccard, 6) ≥ τ over word-k-shingle sets.
    * τ should be exactly representable in binary (0.75, 0.5, 0.625…)
    * so ⌈τ·n⌉ computes identically in every engine.
    */
  def similarPairs(docs: DataFrame, k: Int = 3, tau: Double = 0.75,
      hashed: Boolean = true): DataFrame = {
    // one set build feeds df-count, prefix, and both verify sides
    val sets = shingleSets(docs, k, hashed).cache()
    val cand = candidatePairs(sets, tau)
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .filter(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "jaccard")
  }
}
