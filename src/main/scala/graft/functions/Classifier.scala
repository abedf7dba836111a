package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D39 — quality-classifier INFERENCE via the hashing trick (the
  * fasttext-filter shape every web-scale curation pipeline runs: a
  * linear model over hashed bag-of-words features scores each
  * document, and a threshold keeps/drops it).
  *
  * Scale shape: pure map-side column arithmetic — hash each token to a
  * 16-bit feature bucket (first 4 hex chars of md5, the engine-portable
  * [[Splits]] convention), look up the bucket weight, sum, divide,
  * threshold. No explode, no shuffle, no UDF: the whole classifier is
  * one whole-stage-codegen projection, so inference costs exactly one
  * corpus scan at 100 TB.
  *
  * Determinism: weights are INTEGERS and the per-document sum is an
  * integer left-fold (order-free, exact); the single final division is
  * quantized floor(x·1e6 + 0.5)/1e6 — the repo-wide convention — so
  * DuckDB lands on bit-identical doubles. The weight of bucket b is a
  * fixed mixing function ((b · 2654435761) mod 1001 − 500 ∈
  * [−500, 500]) rather than a trained artifact, which keeps the gate
  * model-free; a production deployment swaps [[weightOf]] for an
  * `element_at` on a broadcast weight array (the artifact is ~256 KiB
  * for 2^16 buckets — broadcast-trivial) and nothing else changes.
  */
object Classifier {

  private val HexAlphabet = "0123456789abcdef"

  /** 0-based value of the i-th (1-based) hex char of `h` —
    * `call_function` reaches the builtin two-column `instr`, which the
    * Scala `functions.instr` signature (String-literal substring)
    * cannot express. */
  private def nib(h: Column, i: Int): Column =
    call_function("instr", lit(HexAlphabet), substring(h, i, 1)) - 1

  /** 16-bit feature bucket from a 4-hex-char hash prefix. Callers must
    * pass a BOUND hash value (a lambda variable or materialized
    * column), not an md5 expression: the four nibble extractions each
    * reference `h`, and an expression argument would re-evaluate the
    * md5 four times per token (the Text.shingles lesson). */
  def bucketOfHex(h: Column): Column =
    ((nib(h, 1) * 4096) + (nib(h, 2) * 256) + (nib(h, 3) * 16) + nib(h, 4))
      .cast("long")

  /** 8-bit feature bucket from a 2-hex-char hash prefix — D46's DSIR
    * feature space: 256 coarse buckets keep the two count tables
    * broadcast-trivial and Laplace smoothing meaningful on small
    * target corpora. Same bound-hash contract as [[bucketOfHex]]. */
  def bucketOfHex2(h: Column): Column =
    ((nib(h, 1) * 16) + nib(h, 2)).cast("long")

  /** Integer weight of a feature bucket, in [-500, 500]. */
  def weightOf(bucket: Column): Column =
    (bucket * lit(2654435761L)) % 1001 - 500

  /** Score documents: (doc columns) + n_tokens + score + keep. The
    * score is the mean token weight scaled to [-0.5, 0.5]; `keep` is
    * score > threshold (quantized compare). Token-less documents score
    * 0.0 and never pass a threshold ≥ 0. */
  def scored(docs: DataFrame, text: Column, threshold: Double = 0.0): DataFrame = {
    val ws = filter(Text.words(text), w => length(w) > 0)
    // two-step: hash once per token, THEN decode nibbles over the
    // bound element — one md5 per token instead of four
    val hs = transform(ws, w => substring(md5(w.cast("binary")), 1, 4))
    val tokW = transform(hs, h => weightOf(bucketOfHex(h)))
    val scoreInt = aggregate(tokW, lit(0L), (acc, x) => acc + x)
    val n = size(ws)
    val score = when(n === 0, lit(0.0)).otherwise(
      floor(scoreInt.cast("double") / (n.cast("double") * 1000.0)
        * 1e6 + 0.5) / 1e6)
    docs
      .withColumn("n_tokens", n)
      .withColumn("score", score)
      .withColumn("keep", col("score") > threshold)
  }
}
