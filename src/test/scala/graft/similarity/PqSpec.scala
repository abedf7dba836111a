package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** D49 — product quantization: code well-formedness and determinism,
  * reconstruction quality, and eval-corpus recall (planted identical
  * copies MUST be found — their codes are identical by construction;
  * the noise tail of exact top-10 is allowed to scramble, as for
  * LSH/IVF). Observed at sf0.001: top1 1.0, mean_recall 0.3,
  * reconstruction cos avg 0.67 / min 0.56 — bounds leave margin. */
class PqSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val cb = Pq.codebooks(emb, sf + "#spec")

  test("D49: codes are m in-range ints and identical vectors share codes") {
    val codes = Pq.encode(emb, cb).cache()
    val bad = codes.filter(
      size(col("codes")) =!= Pq.M ||
      exists(col("codes"), c => c < 0 || c >= Pq.Ksub))
    assert(bad.count() === 0)
    // planted duplicate: same embedding must encode to the same codes
    val one = emb.limit(1).select("vec_id", "embedding")
    val dup = one.select((col("vec_id") + 777000L).as("vec_id"),
      col("embedding"))
    val pair = Pq.encode(one.unionByName(dup), cb)
      .select("codes").distinct()
    assert(pair.count() === 1, "identical vectors must share codes")
    codes.unpersist()
  }

  test("D49: reconstruction preserves direction (lossy but aligned)") {
    val rc = Pq.encode(emb, cb).join(emb, "vec_id")
      .select(Ann.cosine(col("embedding"),
        Pq.decodeCol(col("codes"), cb)).as("rc"))
      .agg(min("rc").as("mn"), avg("rc").as("av")).head()
    assert(rc.getAs[Double]("mn") > 0.4,
      s"worst reconstruction cosine ${rc.getAs[Double]("mn")}")
    assert(rc.getAs[Double]("av") > 0.6,
      s"mean reconstruction cosine ${rc.getAs[Double]("av")}")
  }

  test("D49: planted-copy eval — top-1 recall ≥ 0.9, mean recall@10 ≥ 0.2") {
    val out = graft.SparkEntry.queries("ann_pq_adc")(spark, sf)
    val stats = out.select("top1_recall", "mean_recall", "min_recall")
      .distinct().head()
    assert(stats.getAs[Double]("top1_recall") >= 0.9,
      s"top1_recall ${stats.getAs[Double]("top1_recall")}")
    assert(stats.getAs[Double]("mean_recall") >= 0.2)
  }

  test("D61: IVF-PQ planted copies survive both prunings; probe scan prunes cells") {
    val out = graft.SparkEntry.queries("ann_ivf_pq")(spark, sf).cache()
    val stats = out.select("top1_recall", "mean_recall", "min_recall")
      .distinct().head()
    // an identical copy lands in the query's own argmax cell AND shares
    // its codes — the composed index must keep finding it
    assert(stats.getAs[Double]("top1_recall") >= 0.9,
      s"top1_recall ${stats.getAs[Double]("top1_recall")}")
    // doubly-lossy: the noise tail shrinks further than PQ-only, but
    // the planted signal must hold
    assert(stats.getAs[Double]("mean_recall") >= 0.1)
    out.unpersist()

    // the probe's scan must prune to the probed cell partitions —
    // assert on the pruned index read the entry path constructs
    import graft.Tables
    val emb = Tables.embeddings(spark, sf)
    val cbIvf = Ivf.codebookFor(emb, 16, sf + "#prunecheck")
    val cbPq = Pq.codebooks(emb, sf + "#prunecheck")
    val index = IvfPq.indexStored(emb, cbIvf, cbPq, sf + "#prunecheck")
    val pruned = index.filter(col("cell").isin(0, 3))
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.selectedPartitions.partitionCount <= 2,
      s"cell IN (0,3) must read ≤2 of 16 cell partitions, " +
        s"read ${scan.selectedPartitions.partitionCount}")
  }
}
