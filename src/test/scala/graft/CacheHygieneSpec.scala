package graft

/** Cache hygiene (r13 verdict item 7): entries may `.cache()` subtrees
  * reused within their own computation, but a long Verify session over
  * 300+ entries must not ACCUMULATE pinned storage — Verify clears the
  * DataFrame cache after every entry's write (Bench already clears
  * between timed reps). This spec drives the Verify wrapper shape over
  * the entries that cache the most and asserts the session ends with
  * an empty cache manager.
  */
class CacheHygieneSpec extends SparkSpec {

  /** The cache-heaviest entries: every `.cache()` site the r13 round
    * added plus the long-standing all-pairs/dedup set builders. */
  private val CacheHeavy = Seq(
    "q_budget_select", "q_length_batches", "dedup_span_mask",
    "dedup_jaccard_allpairs", "dedup_containment", "dedup_skew_stress",
    "dedup_method_eval")

  test("the Verify per-entry wrapper leaves no pinned storage behind") {
    CacheHeavy.foreach { name =>
      SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      // the Verify.main loop runs exactly this after each entry
      spark.sqlContext.clearCache()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left cached plans behind after the per-entry clear")
    }
  }

  test("without the per-entry clear, cache-using entries DO pin storage " +
      "(the hazard the wrapper exists for)") {
    spark.sqlContext.clearCache()
    SparkEntry.queries("q_budget_select")(spark, sf)
      .write.format("noop").mode("overwrite").save()
    assert(!spark.sharedState.cacheManager.isEmpty,
      "expected q_budget_select to cache its shared projection — if " +
        "this starts failing, the entry no longer caches and this spec's " +
        "premise (and CacheHeavy list) should be revisited")
    spark.sqlContext.clearCache()
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
