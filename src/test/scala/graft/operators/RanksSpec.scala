package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R53/D53 — scalable global rank + snake shard packing: the
  * two-pass rank must equal the single-partition reference rank
  * exactly, must NOT plan the SinglePartition exchange the naive
  * shape provably does, and the snake packing must balance token
  * sums within one document's tokens. */
class RanksSpec extends SparkSpec {

  test("R53: two-pass global rank equals the naive global-window rank") {
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"),
      graft.functions.Text.whitespaceTokenCount(col("text")).as("tok"))
    val naive = docs.withColumn("rnk_ref",
      row_number().over(Window.orderBy(col("tok").desc, col("doc_id"))).cast("long"))
    val fast = Ranks.globalRowNumber(
      docs, Seq(col("tok").desc, col("doc_id")), 7, "rnk")
    val joined = fast.join(naive, Seq("doc_id", "tok"))
    assert(joined.count() === docs.count())
    assert(joined.filter(col("rnk") =!= col("rnk_ref")).count() === 0,
      "two-pass rank diverges from the total-order reference")
  }

  test("R53: no SinglePartition exchange (and the naive shape HAS one)") {
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"),
      graft.functions.Text.whitespaceTokenCount(col("text")).as("tok"))
    val naivePlan = docs.withColumn("rnk",
      row_number().over(Window.orderBy(col("tok").desc, col("doc_id"))))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("SinglePartition"),
      "sensitivity check: the naive global window must plan SinglePartition")
    val fastPlan = Ranks.rankedDocs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!fastPlan.contains("SinglePartition"),
      "scalable rank must not funnel the table through one task")
  }

  test("D54: per-group sample yields exactly min(k, |group|) rows via WindowGroupLimit") {
    val docs = graft.Tables.documents(spark, sf)
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Ranks.qGroupSample.fn(spark, sf).collect()
    val byLang = out.groupBy(_.getAs[String]("lang"))
    assert(byLang.keySet === sizes.keySet)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length === math.min(Ranks.SampleK.toLong, sizes(lang)),
        s"$lang: expected exactly min(k, group size) rows")
      assert(rows.map(_.getAs[Int]("rn")).sorted.toSeq ===
        (1 to rows.length), s"$lang: ranks must be contiguous from 1")
    }
    // reproducible: a second run returns the identical sample
    val again = Ranks.qGroupSample.fn(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    // the rank filter must pre-prune map-side before the exchange
    val plan = Ranks.qGroupSample.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected a WindowGroupLimit partial top-k:\n$plan")
  }

  test("D55: budget select == the naive single-partition greedy prefix") {
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"),
      graft.functions.Text.qualityScore(col("text")).as("quality"),
      graft.functions.Text.whitespaceTokenCount(col("text")).cast("long").as("tok"))
    val total = docs.agg(sum("tok")).head().getLong(0)
    val budget = math.floor(Ranks.BudgetFraction * total).toLong
    val naive = docs.withColumn("cum_tok",
        sum("tok").over(Window.orderBy(col("quality").desc, col("doc_id"))))
      .filter(col("cum_tok") <= budget)
      .select("doc_id", "quality", "tok", "cum_tok")
      .orderBy("doc_id").collect().toSeq
    val fast = Ranks.qBudgetSelect.fn(spark, sf).collect().toSeq
    assert(fast.map(_.toSeq) === naive.map(_.toSeq))
    assert(fast.nonEmpty && fast.map(_.getAs[Long]("cum_tok")).max <= budget)
    val plan = Ranks.qBudgetSelect.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      "budget select must not funnel the corpus through one task")
  }

  test("D58: length-sorted batching strictly cuts the padding bill") {
    val rows = Ranks.qLengthBatches.fn(spark, sf).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(rows.keySet === Set("arrival", "sorted"))
    val (a, s) = (rows("arrival"), rows("sorted"))
    assert(a.getAs[Long]("total_tokens") === s.getAs[Long]("total_tokens"),
      "both methods batch the same corpus")
    assert(s.getAs[Long]("total_padding") < a.getAs[Long]("total_padding"),
      "sorting by length must strictly reduce padding")
    val n = graft.Tables.documents(spark, sf).count()
    assert(s.getAs[Long]("n_batches") ===
      math.ceil(n.toDouble / Ranks.BatchSize).toLong)
    assert(s.getAs[Double]("padding_ratio_q") >= 0.0 &&
      s.getAs[Double]("padding_ratio_q") <=
        a.getAs[Double]("padding_ratio_q"))
  }

  test("D53: snake shards balance token sums within one max-doc spread") {
    val rows = Ranks.qShardAssign.fn(spark, sf).collect()
    assert(rows.length === Ranks.NumShards)
    assert(rows.map(_.getAs[Long]("shard")).toSeq ===
      (0L until Ranks.NumShards.toLong))
    val docs = graft.Tables.documents(spark, sf)
    val total = docs.select(
      sum(graft.functions.Text.whitespaceTokenCount(col("text")).cast("long")))
      .head().getLong(0)
    assert(rows.map(_.getAs[Long]("token_sum")).sum === total,
      "every token lands in exactly one shard")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val maxTok = docs.select(
      max(graft.functions.Text.whitespaceTokenCount(col("text")).cast("long")))
      .head().getLong(0)
    val sums = rows.map(_.getAs[Long]("token_sum"))
    assert(sums.max - sums.min <= maxTok,
      s"snake packing spread ${sums.max - sums.min} exceeds max doc $maxTok")
  }

  test("R65: the lift table conserves counts and its gains curve is a proper CDF") {
    val out = Ranks.qDecileLift.fn(spark, sf).collect()
    assert(out.map(_.getAs[Int]("decile")).toSeq === (0 until 10))
    val sizes = out.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1, s"deciles must balance: ${sizes.toSeq}")
    val docs = Tables.documents(spark, sf)
    assert(sizes.sum === docs.count())
    assert(out.map(_.getAs[Long]("n_pos")).sum ===
      docs.filter(col("lang") === "en").count())
    val gains = out.map(_.getAs[Long]("cum_gain_q"))
    assert(gains.sliding(2).forall(s => s.length < 2 || s(0) <= s(1)))
    assert(gains.last === 1000000L, "cumulative gains must end at 100%")
  }

  test("R57: equi-depth bins balance within one row, edges ordered, no funnel") {
    val df = Relational.qHistogramDepth.fn(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getAs[Int]("bin")).toSeq ===
      (0 until Relational.NBins))
    val sizes = rows.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1L,
      s"equi-depth sizes must differ by at most 1, got ${sizes.toSeq}")
    // bin value ranges are ordered: hi(i) <= lo(i+1)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
      case _ =>
    }
    // the rank path itself must not funnel (the entry's 1-row count
    // aggregates legitimately reduce O(#partitions) partials on one
    // task — that's metadata, not data; R53's spec covers the rank)
    val ranked = Ranks.globalRowNumber(
      Tables.orders(spark, sf)
        .select(col("o_totalprice").as("price"), col("o_orderkey").as("k")),
      Seq(col("price").asc, col("k").asc), 8, "rn")
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      "rank assignment must not funnel through one task")
  }

  test("R153: quantile normalization equals the naive global-window mapping") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"),
      graft.functions.Text.whitespaceTokenCount(col("text")).cast("long").as("tok"))
    val n = docs.count()
    val pooledNaive = docs
      .withColumn("grank",
        row_number().over(Window.orderBy(col("tok"), col("doc_id"))).cast("long"))
      .select(col("grank"), col("tok").as("norm_ref"))
    val wSrc = Window.partitionBy("source")
    val ref = docs
      .withColumn("rk", row_number().over(wSrc.orderBy(col("tok"), col("doc_id"))).cast("long"))
      .withColumn("n_s", count(lit(1)).over(wSrc))
      .withColumn("target_rank",
        expr(s"((2*rk - 1) * ${n}L + 2*n_s - 1) div (2*n_s)"))
      .join(pooledNaive, col("target_rank") === pooledNaive("grank"))
      .select(col("doc_id"), col("norm_ref"))
    val got = Ranks.qQuantileNormalize.fn(spark, sf)
      .select("doc_id", "norm_tok", "source", "rk")
    assert(got.join(ref, "doc_id")
      .filter(col("norm_tok") =!= col("norm_ref")).count() == 0)
    // within a source, normalization preserves order (monotone in rank)
    val bad = got.withColumn("prev",
      lag("norm_tok", 1).over(Window.partitionBy("source").orderBy("rk")))
      .filter(col("prev").isNotNull && col("prev") > col("norm_tok")).count()
    assert(bad == 0)
    // the pooled order comes from globalRowNumber, whose no-
    // SinglePartition property is asserted directly above; the only
    // single-task reduction in this entry is the sanctioned 1-row
    // n_total aggregate
  }

  test("D110: every training prefix carries the corpus mixture within the slot bound") {
    val rows = Ranks.qCurriculumInterleave.fn(spark, sf)
      .select("train_pos", "lang").collect()
      .map(r => (r.getAs[Long]("train_pos"), r.getAs[String]("lang")))
      .sortBy(_._1)
    val n = rows.length
    val shares = rows.groupBy(_._2).map { case (l, xs) => l -> xs.length }
    val strata = shares.size
    assert(strata > 1, "mixture law is vacuous with one stratum")
    // the schedule is a total order 1..n
    assert(rows.map(_._1).toSeq == (1L to n.toLong))
    for (p <- Seq(n / 10, n / 4, n / 2, 3 * n / 4); if p > 0) {
      val prefix = rows.take(p).groupBy(_._2).map { case (l, xs) => l -> xs.length }
      shares.foreach { case (l, ns) =>
        val expect = p.toLong * ns / n
        val got = prefix.getOrElse(l, 0).toLong
        assert(math.abs(got - expect) <= 1L + strata,
          s"lang $l at prefix $p: $got vs $expect")
      }
    }
    // contrast: a sorted-by-stratum layout violates the mixture law by
    // construction — the largest stratum's deviation at n/2 is massive
    val sortedLayout = rows.map(_._2).sorted
    val worstAtHalf = shares.map { case (l, ns) =>
      math.abs(sortedLayout.take(n / 2).count(_ == l).toLong - (n / 2).toLong * ns / n)
    }.max
    assert(worstAtHalf > (1L + strata) * 10,
      "the contrast layout must violate the bound by an order of magnitude")
  }
}
