package graft.dedup

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators over a (doc_id, text) corpus
  * (SURVEY.md §2.4 D1-D4). Every shape is a declarative plan with one
  * keyed shuffle per stage and NO all-pairs comparison anywhere: the
  * quadratic step is always confined to hash buckets (LSH bands /
  * simhash chunks), which is what makes near-dup detection feasible on
  * 100 TB — candidate generation is linear, verification touches only
  * candidate pairs.
  */
object Dedup {

  // ---------------------------------------------------------------- D1

  /** Exact dedup: group by md5 of the canonical text, keep the lowest
    * doc_id per group. One hash-partitioned aggregation. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Text.fingerprintMd5(col("text")).as("content_hash"))
      .groupBy("content_hash")
      .agg(min("doc_id").as("keeper_doc_id"), count(lit(1)).as("n_docs"))

  // ---------------------------------------------------------------- D2

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand = NumHashes / Bands // 4
  /** Buckets above this size are dropped from candidate generation —
    * a degenerate shingle (e.g. empty text) would otherwise create a
    * quadratic bucket. The skew-safety valve SURVEY §5 calls for. */
  val MaxBucket = 100

  /** D2b — LSH parameter auto-tuning: choose (bands, rowsPerBand) with
    * b·r = numPerm minimizing the integrated deviation of the banding
    * S-curve P(candidate | s) = 1 − (1 − s^r)^b from the ideal step at
    * the target Jaccard threshold τ — ∫₀^τ P (false-positive mass) +
    * ∫τ^1 (1 − P) (false-negative mass), trapezoid-integrated. This is
    * the standard MinHashLSH calibration (Leskovec/Rajaraman/Ullman,
    * Mining of Massive Datasets §3.4.3); `fnWeight` skews the
    * integral when misses cost more than extra verify work (dedup
    * usually wants fnWeight > 1: a missed near-dup stays in the
    * corpus, a false candidate just costs one D4 verification).
    * Driver-side O(divisors × steps) arithmetic — a planning call, no
    * data touched. */
  def lshParams(numPerm: Int, tau: Double,
      fnWeight: Double = 1.0): (Int, Int) = {
    require(numPerm > 0 && tau > 0 && tau < 1)
    val configs = (1 to numPerm).filter(numPerm % _ == 0)
      .map(b => (b, numPerm / b))
    def err(b: Int, r: Int): Double = {
      val n = 500
      var fp, fn = 0.0
      var i = 0
      while (i < n) {
        val s = (i + 0.5) / n
        val p = 1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble)
        if (s < tau) fp += p / n else fn += (1.0 - p) / n
        i += 1
      }
      fp + fnWeight * fn
    }
    configs.minBy { case (b, r) => err(b, r) }
  }

  /** The s where the S-curve crosses 1/2 — the config's effective
    * threshold, ≈ (1/b)^(1/r). */
  def lshThreshold(bands: Int, rowsPerBand: Int): Double =
    math.pow(1.0 / bands, 1.0 / rowsPerBand)

  private def spread(docs: DataFrame): DataFrame =
    graft.functions.Spread(docs, col("doc_id"))

  /** (doc_id, exploded hashed shingle) — words split once per row,
    * shingles as combined word hashes (no string building). */
  private def explodedShingles(docs: DataFrame, k: Int): DataFrame =
    spread(docs)
      .select(col("doc_id"), Text.words(col("text")).as("ws"))
      .select(col("doc_id"), explode(Text.shingleHashes(col("ws"), k)).as("h"))

  /** MinHash signatures: sig[i] = min over shingles of h_i(shingle),
    * where h_i = xxhash64(i, base) re-hashes the ONE hash of the
    * shingle with seed i — 64 fixed-width 8-byte hashes instead of 64
    * string traversals (and no wrapping multiplies, which ANSI mode
    * rejects). Shaped as explode → 64 parallel MIN aggregates: a hash
    * aggregation with map-side partials (one doc_id-keyed shuffle of
    * 64-long rows), rather than nested interpreted array lambdas that
    * re-evaluate the shingle chain per hash function. */
  def minhashSignatures(docs: DataFrame, shingleK: Int = 3): DataFrame = {
    val mins = (0 until NumHashes).map(i =>
      min(xxhash64(lit(i), col("h"))).as(s"h$i"))
    explodedShingles(docs, shingleK).groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH band keys: band j hashes rows [j*r, (j+1)*r) of the signature
    * together with j, so equal band keys ⇒ equal sub-signature. */
  def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)),
      j => xxhash64(
        j +: (1 to RowsPerBand).map(r => element_at(sig, j * RowsPerBand + r)): _*))

  /** D2: MinHash+LSH candidate pairs: shingle → signature → explode
    * band keys → bucket self-join (a.doc_id < b.doc_id) → distinct.
    * Work is linear in corpus size plus sum of bucket-size² with
    * buckets capped at MaxBucket; never an all-pairs product. */
  /** The exploded (doc_id, band_key) table of a corpus — the shared
    * upstream of candidate generation and index probing. Callers that
    * need BOTH over the same docs (D92's delta batch) compute it once
    * and pass it to [[minhashLshCandidatesFromBands]] /
    * [[probeBandIndexWithBands]] instead of paying the signature
    * aggregation twice. */
  def bandedKeys(docs: DataFrame, shingleK: Int = 3): DataFrame =
    minhashSignatures(docs, shingleK)
      .select(col("doc_id"), explode(bandKeys(col("sig"))).as("band_key"))

  def minhashLshCandidates(docs: DataFrame, shingleK: Int = 3): DataFrame =
    // banded is referenced three times (count filter + both self-join
    // sides); cache the tiny (doc_id, band_key) table so the signature
    // lineage — the expensive part — is computed exactly once.
    minhashLshCandidatesFromBands(bandedKeys(docs, shingleK).cache())

  /** Candidate pairs over a pre-computed (and ideally cached/pinned)
    * band table. */
  def minhashLshCandidatesFromBands(banded: DataFrame): DataFrame = {
    val bucketed = banded
      .join(banded.groupBy("band_key").count().filter(col("count") <= MaxBucket),
        Seq("band_key"))
      .select("band_key", "doc_id")
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  // ---------------------------------------------------------------- D34

  /** D34: the corpus band index as a STORED artifact — continuous
    * ingest dedups each NEW batch against it without touching the
    * corpus again. `bucket_n` (band-bucket size) is frozen at build
    * time, so the boilerplate valve on the probe is a map-side filter
    * over the index scan instead of a corpus-wide re-count per batch.
    * The window count is the one index-build shuffle — the amortized
    * one-time cost. */
  def writeBandIndex(docs: DataFrame, path: String,
      shingleK: Int = 3): Unit = {
    val banded = minhashSignatures(docs, shingleK)
      .select(col("doc_id"), explode(bandKeys(col("sig"))).as("band_key"))
    banded.withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band_key")))
      .write.mode("overwrite").parquet(path)
  }

  /** Probe the stored index with a new batch: the batch's band keys
    * are BROADCAST, so the corpus-scale index is never reshuffled —
    * ingest cost scales with the batch, not the corpus (spec asserts
    * the broadcast plan). Emits (new_doc, dup_of) candidate pairs. */
  def probeBandIndex(s: org.apache.spark.sql.SparkSession, path: String,
      newBatch: DataFrame, shingleK: Int = 3): DataFrame =
    probeBandIndexWithBands(s, path, bandedKeys(newBatch, shingleK))

  /** Probe with a pre-computed batch band table (see [[bandedKeys]]). */
  def probeBandIndexWithBands(s: org.apache.spark.sql.SparkSession,
      path: String, newBands: DataFrame): DataFrame =
    s.read.parquet(path)
      .filter(col("bucket_n") <= MaxBucket)
      .join(broadcast(newBands.select(col("doc_id").as("new_doc"),
        col("band_key"))), Seq("band_key"))
      .select(col("new_doc"), col("doc_id").as("dup_of"))
      .distinct()

  // ---------------------------------------------------------------- D3

  /** SimHash (Charikar, STOC'02): 64-bit sketch where bit j is the
    * sign of Σ over shingle hashes of ±1 on that hash's bit j —
    * computed by the native fused vote aggregate
    * ([[graft.plans.SimhashAgg]], `graft_simhash64`): one imperative
    * 64-vote loop with a compact long[64] partial through the shuffle,
    * instead of 64 separate SUM aggregate expressions + a 64-term
    * bit-pack projection. Bit-identical to the composed formulation
    * ([[simhashSignaturesComposed]], spec-asserted). */
  def simhashSignatures(docs: DataFrame, shingleK: Int = 2): DataFrame =
    explodedShingles(docs, shingleK)
      .groupBy("doc_id")
      .agg(call_function("graft_simhash64", col("h")).as("simhash"))

  /** The 64-column reference formulation of [[simhashSignatures]] —
    * kept as the parity oracle for the fused aggregate. */
  private[graft] def simhashSignaturesComposed(docs: DataFrame,
      shingleK: Int = 2): DataFrame = {
    val exploded = explodedShingles(docs, shingleK)
    val sums = (0 until 64).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(1L) * 2L - 1L).as(s"b$j"))
    val packed = (0 until 64).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    exploded.groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
  }

  /** D3: simhash near-dup candidates by the pigeonhole principle:
    * hamming(a,b) ≤ 3 ⇒ at least one of the four 16-bit chunks is
    * equal, so bucket on (chunk_idx, chunk_value) and verify the full
    * hamming distance only inside buckets. */
  def simhashCandidates(docs: DataFrame, maxHamming: Int = 3,
      shingleK: Int = 2): DataFrame = {
    val sh = simhashSignatures(docs, shingleK)
    // cached: referenced by the bucket-count filter and both self-join
    // sides — the signature aggregation runs once
    val raw = sh.select(col("doc_id"), col("simhash"),
      explode(transform(sequence(lit(0), lit(3)),
        j => struct(j.as("chunk_idx"),
          call_function("shiftright", col("simhash"), j * 16)
            .bitwiseAND(0xFFFFL).as("chunk_val"))))
        .as("c"))
      .select(col("doc_id"), col("simhash"),
        col("c.chunk_idx"), col("c.chunk_val"))
      .cache()
    // same skew valve as the minhash bands: a degenerate corpus (many
    // identical sketches) would otherwise make one chunk bucket
    // quadratic
    val chunked = raw
      .join(raw.groupBy("chunk_idx", "chunk_val").count()
        .filter(col("count") <= MaxBucket), Seq("chunk_idx", "chunk_val"))
      .select("doc_id", "simhash", "chunk_idx", "chunk_val")
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ---------------------------------------------------------------- D4

  /** D4: n-gram Jaccard verification — exact similarity computed ONLY
    * on candidate pairs (from D2/D3), never all pairs. Joining the
    * shingle sets back in is two hash joins on doc_id. */
  def jaccardVerify(candidates: DataFrame, docs: DataFrame,
      shingleK: Int = 3, threshold: Double = 0.5): DataFrame = {
    // hashed shingle SETS (distinct) — intersect/union over longs;
    // cached because both join sides reference the same lineage
    val sets = spread(docs)
      .select(col("doc_id"), Text.words(col("text")).as("ws"))
      .select(col("doc_id"),
        array_distinct(Text.shingleHashes(col("ws"), shingleK)).as("sh"))
      .cache()
    candidates
      .join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  // ------------------------------------------------------------- D50

  /** D50 — cross-document repeated-SPAN masking (the exact-substring
    * dedup of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL'22 — public literature; the suffix-array
    * pass re-expressed as keyed relational ops): a token is masked
    * when ANY K-gram covering it also occurs in at least `minDf`
    * OTHER documents. Unlike D1 (whole-doc) and D2-D4 (pair-level),
    * this is the operator that removes boilerplate passages — headers,
    * licenses, navigation chrome — that repeat across otherwise
    * distinct documents.
    *
    * Shape: positional K-grams explode map-side; one gram-keyed
    * aggregation counts distinct docs per gram; the join-back touches
    * only duplicated grams (in a deduplicated web corpus the vast
    * minority); covered token positions expand K-fold and collapse in
    * one (doc, pos) distinct — every stage keyed, never quadratic.
    * String grams so DuckDB mirrors exactly (at scale the same
    * pipeline keys on xxhash64 grams — the Decontaminate.hashGrams
    * pattern).
    *
    * Output per doc: token count, masked-token count, quantized ratio.
    */
  def spanMask(docs: DataFrame, k: Int = 8, minDf: Int = 2): DataFrame = {
    val withWs = spread(docs)
      .select(col("doc_id"), Text.words(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"), size(col("ws")).as("n_tokens"))
      .cache() // three consumers: gram build, df count side, final stats
    // positional grams: docs shorter than k contribute none. Cached —
    // consumed by BOTH the df aggregation and the join-back; uncached,
    // the canonicalize+split+gram-build chain ran twice per run
    val grams = withWs.filter(col("n_tokens") >= k)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("ws")) - k),
          i => array_join(slice(col("ws"), i + lit(1), lit(k)), " ")))
          .as(Seq("pos", "gram")))
      .cache()
    val dupGrams = grams.groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select("gram")
    val covered = grams.join(dupGrams, "gram")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tok"))
      .distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_masked"))
    withWs.select("doc_id", "n_tokens")
      .join(covered, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_masked"))
      .select(col("doc_id"), col("n_tokens"), col("n_masked"),
        (floor(col("n_masked").cast("double") / col("n_tokens") * 1e6) / 1e6)
          .as("mask_ratio_q"))
  }

  // ------------------------------------------------- composed pipeline

  /** The shipping shape of the whole dedup block as ONE plan:
    * candidates (D2) → n-gram Jaccard verify (D4) → connected
    * components (D15) → keeper filter. Each stage consumes the
    * previous exactly once — the expensive candidate subtree (signature
    * aggregation) is materialized a single time when connected
    * components cuts lineage on the verified pairs, instead of being
    * recomputed per downstream consumer as the standalone coverage
    * entries do. */
  def dedupPipeline(docs: DataFrame, shingleK: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val candidates = minhashLshCandidates(docs, shingleK)
    val verified = jaccardVerify(candidates, docs, shingleK, threshold)
    Clusters.dedupByCluster(docs, verified)
  }

  // ------------------------------------------------------- test harness

  /** Deterministic planted near-duplicates: docs with id % 50 == 0 are
    * copied (id + 1,000,000) with a 4-word suffix — Jaccard vs the
    * original ≈ 0.85 on 3-shingles. The synthetic corpus makes the
    * rows-only LSH entries non-trivially non-empty at every sf and
    * gives the specs known-positive pairs to assert recall on. */
  def withPlantedDups(docs: DataFrame): DataFrame = {
    val planted = docs.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" planted near duplicate suffix")).as("text"))
    docs.select("doc_id", "text").unionByName(planted)
  }

  /** Exact planted copies (doc_id + 2,000,000): the positives for the
    * simhash entry. On short word-salad documents a 4-word suffix
    * legitimately moves more than 3 of 64 simhash bits (per-bit sums
    * hover near zero with ~50 features), so simhash's planted positives
    * are verbatim copies — hamming 0 — while MinHash keeps the
    * suffix-mutated ones (Jaccard ≈ 0.85). */
  def withPlantedExactDups(docs: DataFrame): DataFrame = {
    val planted = docs.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    docs.select("doc_id", "text").unionByName(planted)
  }

  /** Self-verification harness for the rows-only candidate entries:
    * flags each candidate pair that is a planted positive ((id,
    * id+offset) for id % 50 == 0 — the pairs [[withPlantedDups]] /
    * [[withPlantedExactDups]] guarantee exist) and appends 1-row
    * corpus-level found/expected/recall stats via a broadcast cross
    * join, so the entry output itself carries the recall evidence the
    * specs assert. `originals` is the un-planted corpus. The candidate
    * frame feeds both the stats aggregation and the output, so it is
    * cached — candidate pairs, not corpus rows. */
  def withPlantedEvidence(candidates: DataFrame, originals: DataFrame,
      offset: Long): DataFrame = {
    val flagged = candidates.withColumn("is_planted_pair",
      col("doc_a") % 50 === 0 && col("doc_b") === col("doc_a") + offset)
      .cache()
    val stats = flagged
      .agg(sum(when(col("is_planted_pair"), 1L).otherwise(0L)).as("planted_found"))
      .crossJoin(originals.filter(col("doc_id") % 50 === 0)
        .agg(count(lit(1)).as("planted_expected")))
      .withColumn("planted_recall",
        round(col("planted_found") / col("planted_expected"), 4))
    flagged.crossJoin(broadcast(stats))
  }
}
