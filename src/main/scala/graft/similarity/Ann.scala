package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md §2.4 D5-D7).
  * Vector math runs through the native codegen'd graft_cosine
  * expression (no UDF), with summation order identical to the oracle;
  * the composable dot/norm helpers below remain for callers that need
  * the building blocks.
  *
  * Scale shapes:
  *  - D5 exact near-dup pairs are label-blocked (never a full cross
  *    product): blocking is what real exact-verification passes do.
  *  - D6 brute-force top-k broadcasts the (small) query set — a
  *    map-side BroadcastNestedLoop scan of the corpus; the corpus is
  *    never shuffled.
  *  - D7 LSH buckets via random-hyperplane signs, multiple tables;
  *    candidate generation is a bucket join like MinHash.
  */
object Ann {

  /** Contract bound for every broadcast query side in this file: a
    * broadcast that grows with the corpus (e.g. "1% of vectors") is a
    * guaranteed executor OOM at 100× scale, so callers must bound
    * their query set ABSOLUTELY (id-range filter / limit) and
    * corpus-scale query sets must use the `broadcastQueries = false`
    * shuffle-join paths instead. */
  val MaxBroadcastQueries = 4096

  /** Skew valve for D5 label blocks, same role as [[Dedup.MaxBucket]]:
    * a power-law label (half the corpus under one label) would make one
    * block all-pairs. Hash-ordered row_number keeps a deterministic,
    * unbiased sample of at most this many vectors per label. */
  val MaxBlock = 10000

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine in double via the native codegen'd expression
    * ([[graft.plans.CosineSimilarity]], registered by
    * [[graft.plans.GraftExtensions]]); same summation order as the
    * composable dot/norm form and the oracle. */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a.cast("array<double>"), b.cast("array<double>"))

  // ---------------------------------------------------------------- D5

  /** Exact embedding-cosine near-dup pairs within a blocking key
    * (label): vec_id < vec_id, cosine ≥ threshold. The float→double
    * cast happens once per vector before the join; per-pair work is
    * one fused native cosine loop.
    *
    * Blocks are capped at `maxBlock` rows ([[MaxBlock]]): within-block
    * work is quadratic by design (this is the exact verification pass),
    * so one skewed label must not be allowed to go all-pairs. The cap
    * shuffle shares the join's label partitioning — no extra exchange. */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double,
      maxBlock: Int = MaxBlock): DataFrame = {
    val byLabel = Window.partitionBy(col("label"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
    val prepped = emb.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("emb"))
      .withColumn("rn", row_number().over(byLabel))
      .filter(col("rn") <= maxBlock)
      .drop("rn")
    prepped.as("a")
      .join(prepped.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine(col("a.emb"), col("b.emb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  // ---------------------------------------------------------------- D6

  /** Brute-force cosine top-k: every corpus row is scored against each
    * broadcast query (map-side), then per-query top-k with a rank
    * window — WindowGroupLimit keeps only k rows per query per
    * partition before the (tiny) final shuffle.
    *
    * The query side MUST be bounded per [[MaxBroadcastQueries]] — brute
    * force is N×Q work and only makes sense as the small-Q exact
    * baseline; a corpus-scale query set belongs on
    * [[lshTopK]]`(broadcastQueries = false)` or
    * [[Ivf.topK]]`(broadcastQueries = false)`. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.as("c")
      .join(broadcast(queries.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"))),
        col("c.vec_id") =!= col("q_id"))
      .select(col("q_id"), col("c.vec_id").as("vec_id"),
        round(cosine(col("q_emb"), col("c.embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "cos_sim", "rnk")
  }

  /** D36: hard-negative mining for contrastive training — per anchor,
    * the top-k most-similar corpus vectors with a DIFFERENT label
    * (semantically-close-but-wrong examples; the in-batch-negatives
    * upgrade every embedding-model recipe asks for). Identical
    * broadcast/scan shape to [[bruteForceTopK]] — the label inequality
    * is one more residual predicate on the map-side scan, and the same
    * bound applies to the anchor set ([[MaxBroadcastQueries]]); a
    * corpus-scale anchor set mines from ANN candidates instead
    * (compose [[lshTopK]] / [[Ivf.topK]] with a label filter). */
  def hardNegativeTopK(corpus: DataFrame, anchors: DataFrame, k: Int): DataFrame = {
    val scored = corpus.as("c")
      .join(broadcast(anchors.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"), col("label").as("q_label"))),
        col("c.label") =!= col("q_label"))
      .select(col("q_id"), col("c.vec_id").as("vec_id"),
        col("c.label").as("neg_label"),
        round(cosine(col("q_emb"), col("c.embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "neg_label", "cos_sim", "rnk")
  }

  /** D71 — batch-hard triplet mining (Hermans et al. 1703.07737, the
    * re-identification training standard): per anchor, the HARDEST
    * positive (least-similar same-label vector — the stretch the
    * model must close) and the HARDEST negative (most-similar
    * cross-label vector — the confusion it must separate), plus the
    * margin. Same bounded-broadcast map-side scan as D6/D36 — the
    * corpus streams once against the broadcast anchors, one fused
    * cosine per (anchor, row), then two rank windows (per side) whose
    * WindowGroupLimit keeps shuffle at O(anchors); corpus-scale
    * anchor sets mine from the ANN candidate stream instead
    * (the D36 note). */
  def hardTriplets(corpus: DataFrame, anchors: DataFrame): DataFrame = {
    val scored = corpus.as("c")
      .join(broadcast(anchors.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"), col("label").as("q_label"))),
        col("c.vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_label"), col("c.vec_id").as("vec_id"),
        (col("c.label") === col("q_label")).as("same_label"),
        round(cosine(col("q_emb"), col("c.embedding")), 6).as("cos_sim"))
    val wPos = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").asc, col("vec_id"))
    val wNeg = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val pos = scored.filter(col("same_label"))
      .withColumn("r", row_number().over(wPos)).filter(col("r") === 1)
      .select(col("q_id"), col("q_label"), col("vec_id").as("pos_id"),
        col("cos_sim").as("pos_sim"))
    val neg = scored.filter(!col("same_label"))
      .withColumn("r", row_number().over(wNeg)).filter(col("r") === 1)
      .select(col("q_id"), col("vec_id").as("neg_id"),
        col("cos_sim").as("neg_sim"))
    pos.join(neg, Seq("q_id"))
      .withColumn("margin_q",
        floor((col("pos_sim") - col("neg_sim")) * 1e6).cast("long"))
      .select("q_id", "q_label", "pos_id", "pos_sim", "neg_id", "neg_sim",
        "margin_q")
  }

  /** Self-verification harness for the approximate top-k coverage
    * entries: joins the exact [[bruteForceTopK]] baseline into an ANN
    * result and emits per-row exact-set membership, per-query
    * recall@k, and corpus-level min/mean recall — the same evidence
    * the specs assert, carried in the entry output itself so the
    * driver's CORRECTNESS artifact shows it (a production run executes
    * only the ANN side). Both inputs are bounded (≤
    * [[MaxBroadcastQueries]] × k rows), so the corpus-level stats are
    * a 1-row broadcast cross join, never a global window over data. */
  def withRecallVsExact(ann: DataFrame, exact: => DataFrame, k: Int): DataFrame = {
    // r14: the r13 svBaselines bench gate is gone — the recall
    // evidence IS these entries' declared (and fixture-oracled)
    // output, so the bench times the same body the oracle verifies
    // both sides feed two consumers (stats + output / membership +
    // top-1); they are ≤ queries×k rows, so caching stops the ANN and
    // brute-force subtrees from running twice
    val exactTop = exact.select(col("q_id"), col("vec_id"), col("rnk")).cache()
    val flagged = ann
      .join(exactTop.select(col("q_id"), col("vec_id"))
        .withColumn("in_exact_topk", lit(true)),
        Seq("q_id", "vec_id"), "left")
      .na.fill(false, Seq("in_exact_topk"))
      .cache()
    val perQuery = flagged.groupBy("q_id")
      .agg((sum(when(col("in_exact_topk"), 1L).otherwise(0L)) / k.toDouble)
        .as("recall_at_k"))
    // top-1 recall: the fraction of queries whose SINGLE nearest exact
    // neighbor appears in the ANN set — on a near-isotropic corpus the
    // rest of the exact top-k is noise (cos ≈ 0.3) that no sublinear
    // ANN can find, so this is the recall number that measures whether
    // the index finds the neighbors that matter
    val top1 = exactTop.filter(col("rnk") === 1)
      .join(flagged.select(col("q_id"), col("vec_id"), lit(1).as("h")),
        Seq("q_id", "vec_id"), "left")
      .agg(round(avg(when(col("h").isNotNull, 1.0).otherwise(0.0)), 4)
        .as("top1_recall"))
    val corpus = perQuery.agg(
      round(min("recall_at_k"), 4).as("min_recall"),
      round(avg("recall_at_k"), 4).as("mean_recall"))
      .crossJoin(top1)
    flagged.join(perQuery, Seq("q_id")).crossJoin(broadcast(corpus))
  }

  // ---------------------------------------------------------------- D7

  val Tables = 8
  val PlanesPerTable = 8

  /** Random-hyperplane bucket codes, one per hash table (Charikar
    * SimHash for vectors): plane (t,p) has deterministic ±1 Rademacher
    * components derived from xxhash64(t, p, j); each bucket code packs
    * the sign bits. P[same bucket] = (1 - θ/π)^planes per table.
    * Computed by the native [[graft.plans.HyperplaneBuckets]]
    * expression (fused loop + per-partition sign matrix). */
  def hyperplaneBuckets(emb: Column): Column =
    call_function("graft_hyperplane_buckets", emb.cast("array<double>"),
      lit(Tables), lit(PlanesPerTable))

  /** D7: LSH-bucketed ANN — candidates are corpus rows sharing any of
    * the query's (table, bucket) keys; exact cosine re-ranks only the
    * candidates. Recall vs D6 is asserted in the spec.
    *
    * `broadcastQueries = true` (the default) force-broadcasts the
    * bucketed query side and is only valid for query sets bounded per
    * [[MaxBroadcastQueries]]; with `false` the candidate join is a
    * plain equi-join on (tbl, bucket) — both sides shuffle on the
    * bucket keys, which is the corpus-scale-query-set shape (e.g.
    * batch-scoring every document against the corpus). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      broadcastQueries: Boolean = true): DataFrame = {
    def withBuckets(df: DataFrame, idCol: String): DataFrame =
      df.select(col("vec_id").as(idCol), col("embedding"),
        hyperplaneBuckets(col("embedding")).as("buckets"))
        .select(col(idCol), col("embedding"),
          posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val cBuckets = withBuckets(corpus, "vec_id")
    val qBuckets = withBuckets(queries, "q_id")
      .withColumnRenamed("embedding", "q_emb")
    val qSide = if (broadcastQueries) broadcast(qBuckets.as("q")) else qBuckets.as("q")
    val candidates = cBuckets.as("c")
      .join(qSide,
        col("c.tbl") === col("q.tbl") && col("c.bucket") === col("q.bucket") &&
          col("c.vec_id") =!= col("q.q_id"))
    // Score BEFORE the candidate dedup: a pair can match in up to
    // `Tables` tables, and cosine is deterministic, so the duplicate
    // rows carry identical scores and max() collapses them. Scoring
    // map-side means the (q_id, vec_id) dedup shuffle moves one double
    // per candidate instead of two embedding arrays (~12 KB/row at
    // dim 768) — recomputing ≤ Tables cosines map-side (~2 K flops) is
    // far cheaper than shipping the arrays at 100 TB.
    val scored = candidates
      .select(col("q.q_id").as("q_id"), col("c.vec_id").as("vec_id"),
        round(cosine(col("q.q_emb"), col("c.embedding")), 6).as("cos_sim"))
      .groupBy("q_id", "vec_id")
      .agg(max("cos_sim").as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "cos_sim", "rnk")
  }
}
