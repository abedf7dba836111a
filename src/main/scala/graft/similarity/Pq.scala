package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D49 — product quantization (PQ) ANN: the compressed-index path
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011 — public literature; same family faiss implements).
  *
  * The 100 TB story is STORAGE and scan bandwidth, not candidate
  * pruning (that's IVF's job, and the two compose): each dim-d float
  * vector compresses to `m` one-byte codes (64-dim float = 256 B →
  * 8 B, 32×), so a billion-vector index fits where raw vectors
  * cannot, and an exhaustive scored scan reads 32× fewer bytes.
  * Scoring is asymmetric (ADC): the query stays exact; each corpus
  * vector is represented by its per-subspace codeword. This module
  * scores via reconstruction — decode(codes) is a map-side O(d)
  * projection from the broadcast codebook, and the fused
  * `graft_cosine` then scores exactly the same sum ADC's per-subspace
  * lookup tables would produce (the dot over a concatenation is the
  * sum of subspace dots) — one expression pipeline, no extra shuffle,
  * codegen-friendly.
  *
  * Codebook training follows standard PQ practice (faiss trains on a
  * bounded sample, not the corpus): per-subspace L2 k-means over an
  * absolutely-bounded deterministic sample (first [[MaxTrainSample]]
  * rows by xxhash64(vec_id)) runs on the driver — the one driver
  * materialization, O(MaxTrainSample × d) ≈ 2 MB, same budget class
  * as the Ivf codebook, and memoized per dataset like Ivf's index.
  * Everything corpus-scale (encode, decode, score, top-k) is
  * distributed and map-side.
  */
object Pq {

  /** Subspace count: dim must divide evenly (64 = 8 × 8 here). */
  val M = 8
  /** Centroids per subspace — 16 keeps a code in half a byte; real
    * deployments use 256 (one byte). Both are O(1) plan constants. */
  val Ksub = 16
  val TrainIters = 5
  /** Absolute bound on the driver-side training sample. */
  val MaxTrainSample = 4096

  /** Plain L2 Lloyd on the driver over the bounded sample: seeds are
    * the first k distinct points in sample (hash) order, ties in
    * assignment break to the lowest centroid index, empty cells keep
    * their centroid — all deterministic. */
  private def kmeansL2(xs: Array[Array[Double]], k: Int,
      iters: Int): Seq[Seq[Double]] = {
    val seeds = xs.distinct.take(k)
    var cent: Array[Array[Double]] = seeds.map(_.clone)
    val d = xs.head.length
    for (_ <- 1 to iters) {
      val sums = Array.fill(cent.length, d)(0.0)
      val counts = Array.fill(cent.length)(0L)
      xs.foreach { x =>
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < cent.length) {
          var dist = 0.0; var i = 0
          while (i < d) { val t = x(i) - cent(j)(i); dist += t * t; i += 1 }
          if (dist < bestD) { bestD = dist; best = j }
          j += 1
        }
        counts(best) += 1
        var i = 0
        while (i < d) { sums(best)(i) += x(i); i += 1 }
      }
      cent = cent.indices.map { j =>
        if (counts(j) == 0) cent(j)
        else sums(j).map(_ / counts(j))
      }.toArray
    }
    cent.map(_.toSeq).toSeq
  }

  /** m × ksub × dsub codebooks from a bounded driver-side sample. */
  def trainCodebooks(emb: DataFrame, m: Int = M, ksub: Int = Ksub): Seq[Seq[Seq[Double]]] = {
    val sample = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h").limit(MaxTrainSample)
      .select("e").collect().map(_.getSeq[Double](0).toArray)
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val dsub = d / m
    (0 until m).map { s =>
      kmeansL2(sample.map(_.slice(s * dsub, (s + 1) * dsub)), ksub, TrainIters)
    }
  }

  /** Memoized per-dataset codebooks (the Ivf cacheKey pattern: a fixed
    * corpus trains once per process, Bench reps time encode+score, not
    * training). */
  private val trained =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Seq[Double]]]]()
  def codebooks(emb: DataFrame, cacheKey: String): Seq[Seq[Seq[Double]]] =
    trained.computeIfAbsent(cacheKey, _ => trainCodebooks(emb))

  /** Map-side encoder: per subspace, the index of the L2-nearest
    * codeword (first-match tie-break = lowest index, mirrored by
    * kmeansL2's `<`). Pure higher-order expressions over the codebook
    * plan constant — no UDF, no shuffle. */
  def codesCol(emb: Column, cb: Seq[Seq[Seq[Double]]]): Column = {
    val m = cb.length
    val dsub = cb.head.head.length
    val cbLit = typedlit(cb)
    transform(sequence(lit(0), lit(m - 1)), s => {
      val sub = slice(emb, s * dsub + lit(1), lit(dsub))
      val dists = transform(element_at(cbLit, s + lit(1)), c =>
        aggregate(zip_with(sub, c, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })
  }

  /** Map-side decoder: concatenated codewords — the PQ reconstruction. */
  def decodeCol(codes: Column, cb: Seq[Seq[Seq[Double]]]): Column = {
    val cbLit = typedlit(cb)
    flatten(transform(sequence(lit(0), lit(cb.length - 1)), s =>
      element_at(element_at(cbLit, s + lit(1)),
        element_at(codes, s + lit(1)) + lit(1))))
  }

  /** (vec_id, codes): the stored index — m small ints per vector. */
  def encode(corpus: DataFrame, cb: Seq[Seq[Seq[Double]]]): DataFrame =
    corpus.select(col("vec_id"),
      codesCol(col("embedding").cast("array<double>"), cb).as("codes"))

  /** The codes are a STORED index artifact (that is the whole point of
    * PQ — the compressed representation lives on disk and the raw
    * vectors are never scanned at query time). Memoized per (process,
    * dataset) like the Ivf index; Bench reps time the ADC probe over
    * stored codes, not the one-time index build. Materializing also
    * guarantees the (interpreted, per-row) encoder runs ONCE per
    * corpus row — left inline, ProjectCollapse would fold it into the
    * post-join projection and re-run it per (query × corpus) pair. */
  private val builtCodes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def encodedStored(corpus: DataFrame, cb: Seq[Seq[Seq[Double]]],
      cacheKey: String): DataFrame = {
    val s = corpus.sparkSession
    val path = "/tmp/graft_warehouse/pq_codes_" +
      cacheKey.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      ProcessHandle.current().pid()
    if (builtCodes.add(path))
      encode(corpus, cb).write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }

  /** ADC top-k — the real asymmetric-distance shape: each (bounded,
    * broadcast) query row precomputes its per-(subspace, codeword)
    * dot-product table ONCE (m × ksub doubles); the corpus side then
    * scores a row with m table lookups + the codeword-norm lookup —
    * never touching raw vectors, never decoding. The code scan reads
    * m small ints per row: at 256-dim float, 32× less I/O than the
    * exact scan. Scores are cosine(q, decode(codes)) algebraically
    * (dot and norm both decompose over subspaces). */
  /** The per-query dot-product lookup table: m × ksub doubles —
    * ⟨q_sub, codeword⟩ for every (subspace, codeword). Built ONCE per
    * query row; corpus rows then score with m lookups. */
  def dotLut(qEmb: Column, cb: Seq[Seq[Seq[Double]]]): Column = {
    val m = cb.length
    val dsub = cb.head.head.length
    val cbLit = typedlit(cb)
    transform(sequence(lit(0), lit(m - 1)), s =>
      transform(element_at(cbLit, s + lit(1)), c =>
        aggregate(zip_with(slice(qEmb, s * dsub + lit(1), lit(dsub)), c,
          (a, b) => a * b), lit(0.0), (acc, x) => acc + x)))
  }

  def vecNorm(qEmb: Column): Column =
    sqrt(aggregate(transform(qEmb, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** ||codeword||² per (subspace, code) — a plan constant. */
  def norm2Table(cb: Seq[Seq[Seq[Double]]]): Column =
    typedlit(cb.map(_.map(c => c.map(x => x * x).sum)))

  /** ADC cosine of a coded corpus row against a query's LUT: m table
    * lookups for the dot, m for ||x̂||² — algebraically
    * cosine(q, decode(codes)), never decoding. 6dp-rounded (the repo's
    * similarity-score convention). */
  def adcScore(codes: Column, lut: Column, qNorm: Column,
      norm2Lit: Column): Column = {
    val dot = aggregate(
      zip_with(codes, lut, (code, tab) => element_at(tab, code + lit(1))),
      lit(0.0), (acc, x) => acc + x)
    val xNorm2 = aggregate(
      zip_with(codes, norm2Lit, (code, tab) => element_at(tab, code + lit(1))),
      lit(0.0), (acc, x) => acc + x)
    round(dot / (qNorm * sqrt(xNorm2)), 6)
  }

  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      cb: Seq[Seq[Seq[Double]]], cacheKey: String): DataFrame = {
    val codes = encodedStored(corpus, cb, cacheKey)
    val qEmb = col("embedding").cast("array<double>")
    val qSide = queries.select(col("vec_id").as("q_id"),
      dotLut(qEmb, cb).as("lut"), vecNorm(qEmb).as("q_norm"))
    val scored = codes
      .join(broadcast(qSide), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        adcScore(col("codes"), col("lut"), col("q_norm"),
          norm2Table(cb)).as("adc_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "adc_sim", "rnk")
  }
}
