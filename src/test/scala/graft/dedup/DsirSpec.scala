package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** D46 — DSIR importance selection: the whole point is that the top-k
  * is ENRICHED in the target domain relative to the corpus base rate.
  * Exactness (integer-quantized log-ratio sums) is oracle-gated; these
  * specs gate the selection behavior itself. */
class DsirSpec extends SparkSpec {

  // sf0.001 has ~50 docs and the entry keeps top-100 — selection would
  // be vacuous there; the behavior gate needs the 500-doc corpus
  private val sfSel = "/root/testdata/sf0.01"

  test("D46: top-k is enriched in the target domain vs the corpus base rate") {
    val docs = Tables.documents(spark, sfSel)
    val baseRate = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    val top = graft.SparkEntry.queries("text_dsir_select")(spark, sfSel).cache()
    val n = top.count()
    assert(n === 100L)
    // absolute margin: base rate is ~0.44 here, so multiplicative
    // margins saturate; +0.05 is ~1 s.e. at n=100 over a real gap
    // (measured top rate 0.58)
    val topRate = top.filter(col("lang") === "en").count().toDouble / n
    assert(topRate > baseRate + 0.05,
      s"top-k en rate $topRate not enriched over base $baseRate")
    top.unpersist()
  }

  test("D46: output is rank-ordered by importance with deterministic ties") {
    val rows = graft.SparkEntry.queries("text_dsir_select")(spark, sfSel)
      .select("logw_q", "doc_id").collect()
    val ok = rows.sliding(2).forall {
      case Array(a, b) =>
        val (wa, wb) = (a.getLong(0), b.getLong(0))
        wa > wb || (wa == wb && a.getLong(1) < b.getLong(1))
      case _ => true
    }
    assert(ok, "rows not in (logw_q desc, doc_id asc) order")
    assert(rows.nonEmpty)
  }
}
