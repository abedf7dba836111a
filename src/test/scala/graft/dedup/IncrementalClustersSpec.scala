package graft.dedup

import graft.SparkSpec

/** D92 — incremental cluster maintenance: quotient-graph parity with
  * the full recompute (replayed HERE per run — the entry emits only
  * the production output, so this spec IS the correctness gate),
  * per-class labeling laws, forced merges. */
class IncrementalClustersSpec extends SparkSpec {

  private lazy val rows = IncrementalClusters.incremental(spark, sf).collect()
  private lazy val parity = IncrementalClusters.fullParity(spark, sf).collect()

  test("D92: incremental labels equal the full recompute on every batch doc") {
    assert(parity.nonEmpty)
    parity.foreach(r => assert(r.getAs[Boolean]("label_match"),
      s"doc ${r.getAs[Long]("doc_id")}: " +
        s"inc=${r.getAs[Long]("label_inc")} full=${r.getAs[Long]("label_full")}"))
    // the witness covers exactly the entry's batch, doc for doc, and
    // agrees with the labels the entry actually shipped
    assert(parity.map(_.getAs[Long]("doc_id")).toSeq ===
      rows.map(_.getAs[Long]("doc_id")).toSeq)
    assert(parity.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("label_inc")).toMap ===
      rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("label_inc")).toMap)
  }

  test("D92: merges, growth and fresh singletons all genuinely occur") {
    assert(rows.head.getAs[Long]("n_merges") >= 1,
      "the directive feed must fuse at least one pair of base clusters")
    val byKind = rows.groupBy(_.getAs[String]("kind"))
    assert(byKind.keySet === Set("bridge", "joiner", "fresh"))
    // a joiner is an exact copy of a base doc: its cluster label must
    // be that base doc (base ids < 3.5M), never the joiner itself
    byKind("joiner").foreach(r =>
      assert(r.getAs[Long]("label_inc") < 3500000L,
        "a joiner must adopt its base doc's cluster"))
    // fresh noise stays a singleton labeled by its own id
    byKind("fresh").foreach(r =>
      assert(r.getAs[Long]("label_inc") === r.getAs[Long]("doc_id")))
  }
}
