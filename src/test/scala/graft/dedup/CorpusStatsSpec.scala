package graft.dedup

import graft.{SparkSpec, Tables}
import graft.functions.Text
import org.apache.spark.sql.functions._

/** D72/D73 — corpus statistics vs exact driver-side replications of
  * the quantized algebra (same double ops, same floors — results must
  * be bit-identical, not approximately close). */
class CorpusStatsSpec extends SparkSpec {

  private def tokenCounts(): Map[(String, String), Long] =
    Tables.documents(spark, sf)
      .select(col("source"), explode(Text.words(col("text"))).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("D72: entropy/JSD equals the driver-side quantized-algebra replay") {
    val sw = tokenCounts()
    val tots = sw.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val corpus = sw.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val nn = corpus.values.sum
    val halfLn2Q9 = math.floor(0.5 * math.log(2.0) * 1e9).toLong
    val ref = tots.keys.map { src =>
      val present = sw.collect { case ((s, w), n) if s == src => (w, n) }
      var eQ, klPmQ, klQmQ, absQ = 0L
      present.foreach { case (w, n) =>
        val p = n.toDouble / tots(src)
        val q = corpus(w).toDouble / nn
        val m = (p + q) / 2
        eQ += math.floor(p * -math.log(p) * 1e9).toLong
        klPmQ += math.floor(p * math.log(p / m) * 0.5 * 1e9).toLong
        klQmQ += math.floor(q * math.log(q / m) * 0.5 * 1e9).toLong
        absQ += math.floor(q * (0.5 * math.log(2.0)) * 1e9).toLong
      }
      src -> (tots(src), eQ, klPmQ + klQmQ + (halfLn2Q9 - absQ))
    }.toMap
    val got = CorpusStats.textEntropyJsd.fn(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("entropy_q9"),
          r.getAs[Long]("jsd_q9"))).toMap
    assert(got === ref)
    // JSD is bounded by ln 2 (up to quantization slack below zero)
    got.values.foreach { case (_, e, j) =>
      assert(e >= 0L)
      assert(j <= math.ceil(math.log(2.0) * 1e9).toLong)
    }
  }

  test("D74: readability counts and scores replay the formula") {
    val out = CorpusStats.textReadability.fn(spark, sf).collect()
    assert(out.length === Tables.documents(spark, sf).count())
    out.foreach { r =>
      val w = r.getAs[Long]("n_words"); val s0 = r.getAs[Long]("n_sents")
      val sy = r.getAs[Long]("n_syll")
      assert(w >= 1 && s0 >= 1 && sy >= 1)
      assert(r.getAs[Long]("flesch_q") === math.floor((206.835
        - 1.015 * (w.toDouble / s0) - 84.6 * (sy.toDouble / w))
        * 1e4).toLong)
      assert(r.getAs[Long]("fk_grade_q") === math.floor((0.39
        * (w.toDouble / s0) + 11.8 * (sy.toDouble / w) - 15.59)
        * 1e4).toLong)
      // prose has roughly 1-4 syllable groups per word
      assert(sy <= 5 * w)
    }
  }

  test("D73: per-doc keywords equal the driver-side tf-idf replay") {
    val tf = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(Text.words(col("text"))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val df = tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val nd = Tables.documents(spark, sf).count()
    val ref = tf.keys.map(_._1).toSeq.distinct.sorted.flatMap { doc =>
      val scored = tf.collect { case ((d0, w), t) if d0 == doc =>
        (w, math.floor(t * math.log(nd.toDouble / df(w)) * 1e6).toLong)
      }.toSeq
      scored.sortBy { case (w, s) => (-s, w) }
        .take(CorpusStats.KeywordsPerDoc).zipWithIndex
        .map { case ((w, s), i) => (doc, i + 1, w, s) }
    }
    val got = CorpusStats.textTfidfKeywords.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rnk"),
        r.getAs[String]("word"), r.getAs[Long]("tfidf_q"))).toSeq
    assert(got === ref)
  }

  test("D75: novelty replays the df==1 fraction and brackets correctly") {
    val sh = Tables.documents(spark, sf)
      .withColumn("ws", Text.words(col("text")))
      .select(col("doc_id"),
        explode(Text.shinglesOnWords(col("ws"), 3)).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val df = sh.groupBy(_._2).map { case (g, xs) => g -> xs.length.toLong }
    val ref = sh.groupBy(_._1).map { case (doc, gs) =>
      val n = gs.length.toLong
      val u = gs.count(g => df(g._2) == 1L).toLong
      doc -> (n, u, u * 1000000L / n)
    }
    val got = CorpusStats.textNovelty.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("unique_grams"),
          r.getAs[Long]("novelty_q"))).toMap
    assert(got === ref)
    assert(got.values.forall { case (n, u, q) =>
      u <= n && q >= 0L && q <= 1000000L
    })
  }

  test("D75: the gram explode executes once (pinned exchange is reused)") {
    // synthetic corpus (not the documents table) so other suites'
    // cached scans cannot substitute into this plan — the DedupSpec
    // precaution
    val corpus = spark.range(0, 300).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 10).map(j =>
        concat(lit(s"w$j "), (col("id") + j) % 5)): _*).as("text"))
    val df = CorpusStats.noveltyOn(corpus)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val generates = "Generate explode".r.findAllIn(finalPlan).size
    assert(generates === 1,
      s"gram explode must execute once, got $generates:\n$finalPlan")
    assert(finalPlan.contains("ReusedExchange"),
      s"join-back must reuse the gram exchange:\n$finalPlan")
  }

  test("D84: the OOV curve replays exactly and is monotone in vocab size") {
    import org.apache.spark.sql.functions._
    val words = graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.Text.words(col("text"))).as("w"))
      .filter(col("w") =!= "").collect().map(_.getString(0))
    val byType = words.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (w, c) => (-c, w) }
    val total = words.length.toLong
    val rows = CorpusStats.textOovCurve.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("vocab_size") ->
        (r.getAs[Long]("covered"), r.getAs[Long]("oov_ppm"))).toMap
    rows.foreach { case (v, (cov, ppm)) =>
      val expectCov = byType.take(v.toInt).map(_._2).sum
      assert(cov === expectCov, s"coverage at V=$v")
      assert(ppm === (total - expectCov) * 1000000L / total)
    }
    val ppms = rows.toSeq.sortBy(_._1).map(_._2._2)
    assert(ppms.zip(ppms.tail).forall { case (a, b) => a >= b },
      "a bigger vocabulary cannot cover fewer tokens")
  }
}
