package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D11b: winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03): rolling k-gram hashes → minimum of each w-window →
  * distinct selected hashes. Any substring match of length ≥ w+k-1
  * shares at least one fingerprint.
  *
  * Formulated Spark-natively as posexplode + a running window-min +
  * re-aggregation rather than one nested array expression: a nested
  * `transform(…, j -> array_min(slice(grams, …)))` re-evaluates the
  * whole gram chain per window (interpreted higher-order functions
  * evaluate lambda-body references per element — quadratic per row),
  * while this shape is linear, spills, and parallelizes across the
  * corpus regardless of document length.
  */
object Winnow {

  /** docs(doc_id, text) → (doc_id, winnow_fps array sorted).
    * `gramHashes` defaults to the fast xxhash64 family; pass
    * [[Text.gramMd5s]] for the DuckDB-mirrorable geometry-gate variant
    * (the selection logic below is hash-type-agnostic — longs and hex
    * strings both order consistently across engines). */
  def fingerprints(docs: DataFrame, k: Int = 8, w: Int = 4,
      gramHashes: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column =
        Text.gramHashes): DataFrame = {
    val grams = Spread(docs, col("doc_id"))
      .withColumn("canon", Text.canonical(col("text")))
      .select(col("doc_id"),
        posexplode(gramHashes(col("canon"), k)).as(Seq("pos", "gram")))
    // min of the w-gram window ENDING at pos — every w-window's min is
    // emitted at its last position; distinct per doc = the fingerprint set.
    val winMin = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), Window.currentRow)
    val ordered = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val byDoc = Window.partitionBy(col("doc_id"))
    grams
      .withColumn("wmin", min(col("gram")).over(winMin))
      .withColumn("n_grams", count(lit(1)).over(byDoc))
      // docs shorter than one full window keep their single overall min
      .filter(col("pos") >= w - 1 ||
        (col("n_grams") < w && col("pos") === col("n_grams") - 1))
      // a window min typically persists for ~w consecutive windows;
      // dropping consecutive repeats (same sort, same WindowExec) cuts
      // the collect_set input ~w-fold before the aggregation shuffle
      .withColumn("prev_wmin", lag(col("wmin"), 1).over(ordered))
      .filter(col("prev_wmin").isNull || col("wmin") =!= col("prev_wmin"))
      .groupBy("doc_id")
      .agg(array_sort(collect_set(col("wmin"))).as("winnow_fps"))
  }
}
