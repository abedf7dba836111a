package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Specs for deterministic hash splitting and stratified mixture
  * sampling (D13/D14). */
class SplitsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf).cache()

  test("D35: cluster-aware split never straddles a near-dup pair") {
    val rows = graft.SparkEntry.queries("q_split_leakage")(spark, sf).collect()
    val byMethod = rows.map(r => r.getAs[String]("method") ->
      (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_straddle"))).toMap
    assert(byMethod("cluster_aware")._1 > 0)
    assert(byMethod("cluster_aware")._2 === 0L,
      "keying every member on the cluster key pins the cluster to one split")
    assert(byMethod("naive")._2 >= byMethod("cluster_aware")._2)
  }

  test("hashSplit is exhaustive, exclusive, deterministic, and near the weights") {
    val split = Splits.hashSplit(docs.select("doc_id"), col("doc_id")).cache()
    val n = docs.count().toDouble
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every row gets exactly one split
    assert(counts.values.sum.toDouble === n)
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    // proportions within a loose tolerance of the 0.8/0.1/0.1 weights
    // (50 docs at sf0.001 — binomial noise is real)
    assert(math.abs(counts.getOrElse("train", 0L) / n - 0.8) < 0.15)
    // identical assignment on re-run (no RNG)
    val again = Splits.hashSplit(docs.select("doc_id"), col("doc_id"))
    assert(split.exceptAll(again).count() === 0)
    split.unpersist()
  }

  test("hashSplit assignment is stable under corpus growth") {
    val half = docs.filter(col("doc_id") % 2 === 0).select("doc_id")
    val fromHalf = Splits.hashSplit(half, col("doc_id"))
    val fromFull = Splits.hashSplit(docs.select("doc_id"), col("doc_id"))
      .filter(col("doc_id") % 2 === 0)
    assert(fromHalf.exceptAll(fromFull).count() === 0,
      "a doc's split must not depend on which other docs are present")
    assert(fromFull.exceptAll(fromHalf).count() === 0)
  }

  test("stratifiedSample keeps per-stratum rates and rate 1.0 keeps everything") {
    val kept = Splits.stratifiedSample(docs.select("doc_id", "lang"),
      col("doc_id"), col("lang"), Seq("en" -> 0.5), defaultRate = 1.0)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptBy = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // non-en strata at rate 1.0: nothing dropped (hexThreshold(1)="g")
    totals.filterNot(_._1 == "en").foreach { case (l, c) =>
      assert(keptBy.getOrElse(l, 0L) === c, s"stratum $l must keep all rows")
    }
    // en roughly halved (loose binomial tolerance at sf0.001)
    val enFrac = keptBy.getOrElse("en", 0L).toDouble / totals("en")
    assert(enFrac > 0.2 && enFrac < 0.8, s"en keep fraction $enFrac")
    // rate 0 drops the stratum entirely
    val none = Splits.stratifiedSample(docs.select("doc_id", "lang"),
      col("doc_id"), col("lang"), Seq("en" -> 0.0), defaultRate = 1.0)
    assert(none.filter(col("lang") === "en").count() === 0)
  }

  test("D65: exact stratified split holds out exactly ceil(p*n) per stratum") {
    val out = Splits.exactStratifiedSplit(
      docs.select("doc_id", "lang"), "doc_id", "lang", 0.1).cache()
    val perLang = out.groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"))
      .collect()
    assert(perLang.nonEmpty)
    perLang.foreach { r =>
      val expected = math.ceil(r.getAs[Long]("n") * 0.1).toLong
      assert(r.getAs[Long]("n_val") === expected,
        s"lang ${r.getString(0)}: val=${r.getAs[Long]("n_val")} expected=$expected")
    }
    // total conservation + determinism across runs
    assert(out.count() === docs.count())
    val again = Splits.exactStratifiedSplit(
      docs.select("doc_id", "lang"), "doc_id", "lang", 0.1)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }

  test("D69: ES weighted sample matches a driver reference and skews toward heavy rows") {
    val base = docs.select(col("doc_id"), col("n_chars"))
    val out = Splits.weightedSample(base, col("doc_id"), col("n_chars"), 50)
      .collect()
    assert(out.length === 50)
    // exact driver reference: same md5-uniform, same key, top-50
    val all = base.collect().map { r =>
      val id = r.getLong(0); val w = r.getLong(1)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / math.pow(16, 12)
      (id, w, math.log(u) / w)
    }
    val expect = all.sortBy { case (id, _, k) => (-k, id) }.take(50)
      .map(_._1).toSeq
    assert(out.map(_.getLong(0)).toSeq === expect,
      "engine top-k must equal the reference ES order")
    // the sample over-represents heavy rows vs the corpus average
    val corpusAvgW = all.map(_._2.toDouble).sum / all.length
    val sampleAvgW = out.map(_.getLong(1).toDouble).sum / out.length
    assert(sampleAvgW > corpusAvgW,
      s"weighted sample avg weight $sampleAvgW must exceed corpus $corpusAvgW")
    // reproducible
    val again = Splits.weightedSample(base, col("doc_id"), col("n_chars"), 50)
      .collect().map(_.getLong(0)).toSeq
    assert(again === out.map(_.getLong(0)).toSeq)
  }

  test("the split expression stays map-side: no shuffle in the plan") {
    val plan = Splits.hashSplit(docs.select("doc_id"), col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"hash split must be a pure projection:\n$plan")
  }
}
