package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D25 BM25: value-level correctness is oracle-gated (text_bm25); here
  * the 100 TB contracts — no token explode, hand-checked tiny-corpus
  * score, and the query-set size guard. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("scores match a hand-computed tiny corpus") {
    val docs = Seq(
      (1L, Seq("a", "b", "a")),
      (2L, Seq("b", "c")),
      (3L, Seq("c", "c", "c", "c"))).toDF("doc_id", "toks")
    val out = Bm25.scores(docs, Seq("a", "c")).orderBy("doc_id").collect()
    // N=3, sumdl=9, avgdl=3; df_a=1, df_c=2
    val avgdl = 9.0 / 3
    def contrib(tf: Long, df: Long, dl: Long): Double = {
      if (tf == 0) 0.0
      else {
        val idf = math.log((3 - df + 0.5) / (df + 0.5) + 1.0)
        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }
    }
    def expected(tfA: Long, tfC: Long, dl: Long): Double =
      BigDecimal(contrib(tfA, 1, dl)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .+(BigDecimal(contrib(tfC, 2, dl)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Long]("dl"), r.getAs[Long]("n_terms_hit"), r.getAs[Double]("bm25"))).toMap
    assert(byId(1L) === ((3L, 1L, expected(2, 0, 3))))
    assert(byId(2L) === ((2L, 1L, expected(0, 1, 2))))
    assert(byId(3L) === ((4L, 1L, expected(0, 4, 4))))
  }

  test("plan has no Generate: tf comes from closed array filters, not explode") {
    val df = graft.SparkEntry.queries("text_bm25")(spark, sf)
    val generates = df.queryExecution.sparkPlan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(generates.isEmpty,
      "BM25 must not explode the token stream — per-term tf is map-side")
  }

  test("an oversized query term set fails loudly") {
    val docs = Seq((1L, Seq("a"))).toDF("doc_id", "toks")
    val e = intercept[IllegalArgumentException] {
      Bm25.scores(docs, (1 to 65).map(i => s"t$i"))
    }
    assert(e.getMessage.contains("1..64"))
  }
}
