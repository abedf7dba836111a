package graft.dedup

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D56 — cross-source corpus overlap: the pairwise shingle-set Jaccard
  * matrix between corpus SOURCES (not documents) — the catalog-level
  * audit run before mixing corpora ("how much of source B is already
  * in source A?"), which caps effective epochs and skews mixture
  * weights if ignored.
  *
  * Exact path (the entry): (source, shingle) distinct → shingle-keyed
  * self-join → per-pair intersection counts. Scale shape: the join key
  * is the shingle and each shingle's multiplicity is bounded by
  * #sources (it's a DISTINCT set per source), so the join CANNOT skew
  * regardless of how often a shingle repeats inside documents — the
  * valve is the distinct, not a cap. Two shuffles total (distinct,
  * join+agg); source sizes join back broadcast-tiny.
  *
  * Estimator path ([[minhashSignatures]] / [[estimateOverlap]]): one
  * pass builds a k-permutation MinHash signature PER SOURCE (min of
  * xxhash64(shingle, i) — a mergeable aggregate, so signatures of
  * shards/partitions union for free); pairwise signature agreement
  * estimates the same matrix in O(#sources² · k) driver-side work with
  * NO shingle self-join — the 100 TB path, spec-bounded against the
  * exact matrix (σ = sqrt(J(1−J)/k)).
  */
object SourceOverlap {

  /** Distinct (source, string-shingle) pairs — the exact set base.
    * Words materialize as a column FIRST (the Text.shingles lambda
    * rule: a free reference inside transform re-evaluates per
    * element). */
  private def shingleSets(docs: DataFrame, k: Int): DataFrame =
    docs.withColumn("ws", graft.functions.Text.words(col("text")))
      .select(col("source"),
        explode(graft.functions.Text.shinglesOnWords(col("ws"), k)).as("sh"))
      .distinct()

  /** Exact pairwise Jaccard between sources over k-word shingles. */
  def exactOverlap(docs: DataFrame, k: Int = 3): DataFrame = {
    val sh = shingleSets(docs, k)
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = sh.toDF("src_a", "sh")
      .join(sh.toDF("src_b", "sh"), Seq("sh"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.toDF("src_a", "n_a")), Seq("src_a"))
      .join(broadcast(sizes.toDF("src_b", "n_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        round(col("n_inter").cast("double")
          / (col("n_a") + col("n_b") - col("n_inter")), 6).as("jaccard"))
  }

  /** Per-source k-permutation MinHash signature (array of k mins) —
    * a mergeable one-pass aggregate over hashed shingles. */
  def minhashSignatures(docs: DataFrame, numPerms: Int = 128,
      shingleK: Int = 3): DataFrame = {
    val sh = docs
      .withColumn("ws", graft.functions.Text.words(col("text")))
      .select(col("source"),
        explode(array_distinct(
          graft.functions.Text.shingleHashes(col("ws"), shingleK))).as("h"))
      .distinct()
    val mins = (0 until numPerms).map(i => min(xxhash64(col("h"), lit(i))))
    sh.groupBy("source").agg(array(mins: _*).as("sig"))
  }

  /** Pairwise estimated Jaccard = signature agreement rate. The input
    * is O(#sources) rows; the self-join is driver-trivial. */
  def estimateOverlap(sigs: DataFrame): DataFrame =
    sigs.toDF("src_a", "sig_a")
      .join(sigs.toDF("src_b", "sig_b"))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
            (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double")
          / size(col("sig_a"))).as("est_jaccard"))

  val textSourceOverlap = QueryDef(
    "text_source_overlap",
    (s, d) => exactOverlap(Tables.documents(s, d))
      .orderBy("src_a", "src_b"),
    Some(s"""WITH w AS (SELECT doc_id, source,
                          string_split(${PipelineQueries.oCanon}, ' ') AS ws
                        FROM documents),
             t AS (SELECT DISTINCT source, sh
                   FROM w, UNNEST(list_distinct(list_transform(
                       generate_series(0, greatest(len(ws) - 3, 0)),
                       i -> array_to_string(list_slice(ws, i + 1, i + 3), ' '))))
                     AS u(sh)),
             z AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                   FROM t GROUP BY source),
             p AS (SELECT a.source AS src_a, b.source AS src_b,
                     CAST(count(*) AS BIGINT) AS n_inter
                   FROM t a JOIN t b ON a.sh = b.sh AND a.source < b.source
                   GROUP BY a.source, b.source)
             SELECT src_a, src_b, za.n AS n_a, zb.n AS n_b, n_inter,
                    ROUND(CAST(n_inter AS DOUBLE) / (za.n + zb.n - n_inter), 6)
                      AS jaccard
             FROM p JOIN z za ON p.src_a = za.source
                    JOIN z zb ON p.src_b = zb.source
             ORDER BY src_a, src_b"""))

  val all: Seq[QueryDef] = Seq(textSourceOverlap)
}
