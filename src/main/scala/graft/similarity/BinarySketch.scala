package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D77: binary sign-sketch ANN — each vector compresses to dim/64
  * longs of sign bits (dim-64 float: 256 B → 8 B, a 32× reduction);
  * candidate ranking is XOR+popcount Hamming distance (for sign codes
  * E[hamming]/dim = θ/π, the Charikar bound, so Hamming order tracks
  * cosine order), and only the top `rerankDepth` candidates per query
  * are re-scored with exact cosine. This is the binary-quantization
  * fast path production vector stores run before float rerank — it
  * differs from D7's LSH in kind: LSH *buckets* (candidates = exact
  * bucket collisions, missing near-misses), the sketch *ranks the
  * whole corpus* by a cheap distance, trading a linear-but-tiny scan
  * for recall that cannot miss a close vector by bucketing luck.
  *
  * Scale shape: the corpus streams ONCE against the broadcast query
  * codes (bounded per [[Ann.MaxBroadcastQueries]]); the Hamming
  * window's input is (q_id, vec_id, ham) — one long per candidate,
  * never an embedding array — and row_number's WindowGroupLimit prunes
  * each map task to its local top-R before the exchange, so shuffle
  * traffic is O(queries × R) per task. The float rerank re-reads ONLY
  * the ≤ queries×R surviving ids via a corpus join-back: locally
  * that's one corpus shuffle; at 100 TB the corpus is a table bucketed
  * by vec_id (IO-layout note in SURVEY §5), so the join-back
  * co-locates and reads just the probed buckets. All math is native
  * expressions (fold/zip_with/bit_count) — codegen'd, no UDF.
  */
object BinarySketch {

  /** Pack a vector's sign bits into dim/64 longs via a bitwise-OR fold
    * of shifted single bits (a Horner acc·2 fold would trip ANSI-mode
    * long-overflow the moment bit 63 sets; OR over disjoint bits can't
    * overflow). Bit order is deterministic: word w holds dims
    * [64w, 64w+64), MSB first. */
  def signWords(emb: Column, dim: Int): Column = {
    require(dim % 64 == 0, s"dim $dim must pack whole 64-bit words")
    transform(sequence(lit(0), lit(dim / 64 - 1)), w =>
      aggregate(sequence(lit(0), lit(63)), lit(0L),
        (acc, i) =>
          when(element_at(emb, w * 64 + i + 1) > 0,
            acc.bitwiseOR(
              call_function("shiftleft", lit(1L), (lit(63) - i).cast("int"))))
            .otherwise(acc)))
  }

  /** Hamming distance between two packed sign codes: XOR + popcount
    * per word, summed — dim/64 native ops per pair. */
  def hamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Default float-rerank depth multiplier: top 8·k Hamming candidates
    * get exact cosine. */
  val RerankFactor = 8

  /** Binary-sketch ANN top-k: Hamming-rank the corpus per query, exact
    * cosine over the top `rerankDepth` survivors. Output matches the
    * D6/D7 shape (q_id, vec_id, cos_sim, rnk) plus the sketch's own
    * hamming column for inspection. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      rerankDepth: Int = -1): DataFrame = {
    val depth = if (rerankDepth > 0) rerankDepth else RerankFactor * k
    val c = corpus.select(col("vec_id"),
      signWords(col("embedding").cast("array<double>"), dim).as("words"))
    val q = broadcast(queries.select(col("vec_id").as("q_id"),
      signWords(col("embedding").cast("array<double>"), dim).as("q_words")))
    // map-side: one long distance per (query, corpus row); the window
    // input never carries embeddings (the D7 dedup-shuffle discipline)
    val hamScored = c.join(q, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        hamming(col("words"), col("q_words")).as("ham"))
    val wH = Window.partitionBy(col("q_id"))
      .orderBy(col("ham").asc, col("vec_id"))
    val cands = hamScored.withColumn("hrnk", row_number().over(wH))
      .filter(col("hrnk") <= depth)
      .select("q_id", "vec_id", "ham")
    // float rerank: fetch ONLY the survivors' embeddings back from the
    // corpus (bucketed-table lookup at scale), queries re-broadcast
    val rer = cands
      .join(corpus.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"))), Seq("q_id"))
      .select(col("q_id"), col("vec_id"), col("ham"),
        round(Ann.cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val wC = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    rer.withColumn("rnk", row_number().over(wC))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "ham", "cos_sim", "rnk")
  }
}
