package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D13/D14: deterministic dataset splitting and mixture sampling for
  * training pipelines. Both assign by the first 4 hex chars of
  * md5(key) compared lexicographically against precomputed thresholds:
  *  - engine-independent: any system with md5 reproduces the exact
  *    assignment (the DuckDB oracle mirrors it verbatim);
  *  - shuffle-free: a map-side projection — no sampling RNG, no
  *    repartition — so at 100 TB the split costs one scan;
  *  - stable: a document's assignment depends only on its key, never
  *    on corpus size or row order, the property that keeps train/test
  *    contamination-free across recrawls (rand()-based splits
  *    reshuffle on every run).
  * 65536 buckets give 1/65536 rate granularity — plenty for mixture
  * weights; widen [[hashBucket]] if finer rates are ever needed.
  */
object Splits {

  /** Lowercase 4-hex-char threshold for a cumulative fraction; a
    * fraction ≥ 1 returns "g", which sorts above every hex string, so
    * rate 1.0 keeps ALL rows (even bucket "ffff"). */
  def hexThreshold(frac: Double): String =
    if (frac >= 1.0) "g" else f"${math.max((frac * 65536).toLong, 0L)}%04x"

  /** The first 4 hex chars of md5 of the key's string form. */
  def hashBucket(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 4)

  /** Assign each row a split name by cumulative weight: a row lands in
    * the first split whose cumulative threshold exceeds its hash
    * bucket. Weights must sum to ~1; the last split absorbs rounding. */
  def hashSplit(df: DataFrame, key: Column,
      weights: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0),
      "weights must be non-empty and non-negative")
    val cum = weights.scanLeft(0.0)(_ + _._2).tail
    val b = hashBucket(key)
    val cases = weights.init.zip(cum.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), c)) =>
        val cond = b < lit(hexThreshold(c))
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }
    df.withColumn("split",
      cases.fold(lit(weights.last._1): Column)(_.otherwise(weights.last._1)))
  }

  /** D29: temperature-weighted (α-) sampling rates — the multilingual
    * mixture-rebalancing rule (exponentiated share smoothing, as in
    * multilingual LM sampling à la Conneau & Lample 2019): stratum l
    * with share p_l gets weight p_l^α (α < 1 upweights rare strata),
    * target share q_l = w_l/Σw, and a keep rate that fills a
    * `budgetFrac`·N token budget: r_l = min(1, budget·q_l/n_l).
    *
    * Pure driver arithmetic over the O(#strata) count map (bounded —
    * same budget class as the IVF codebook); the returned rates feed
    * the same map-side [[stratifiedSample]] filter, so the corpus
    * still costs one scan. Rates are quantized to 1e-6 (floor(x·1e6 +
    * 0.5)/1e6) so an oracle recomputing them in SQL lands on identical
    * doubles despite last-ulp libm pow differences. Σw is accumulated
    * in stratum-name order for determinism. */
  def alphaSampleRates(counts: Seq[(String, Long)], alpha: Double,
      budgetFrac: Double): Seq[(String, Double)] = {
    require(counts.nonEmpty && counts.forall(_._2 > 0), "strata must be non-empty")
    val nt = counts.map(_._2).sum
    val w = counts.sortBy(_._1).map { case (s, n) =>
      s -> math.pow(n.toDouble / nt, alpha)
    }
    val wsum = w.map(_._2).sum
    w.map { case (s, wl) =>
      val n = counts.find(_._1 == s).get._2
      val rate = math.min(1.0, nt.toDouble * budgetFrac * (wl / wsum) / n)
      s -> math.floor(rate * 1e6 + 0.5) / 1e6
    }
  }

  /** Keep each row with its stratum's rate — deterministic mixture
    * rebalancing (e.g. downsample a dominant language or source to hit
    * a target training mix). Strata missing from `rates` keep
    * `defaultRate` of their rows. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      rates: Seq[(String, Double)], defaultRate: Double = 1.0): DataFrame = {
    val thr = rates.foldLeft(Option.empty[Column]) {
      case (acc, (s, r)) =>
        val c = stratum === lit(s)
        val t = lit(hexThreshold(r))
        Some(acc.fold(when(c, t))(_.when(c, t)))
    }.fold(lit(hexThreshold(defaultRate)): Column)(
      _.otherwise(hexThreshold(defaultRate)))
    df.filter(hashBucket(key) < thr)
  }

  /** D65 — EXACT-count stratified split: per stratum, exactly
    * ceil(p · n_s) rows to the held-out split, the rest to train.
    * [[hashSplit]]'s thresholds give EXPECTED proportions — fine for
    * train, but an eval set wants its size exact and reproducible.
    * Selection is by md5-hash order within the stratum (content-
    * independent, stable under corpus growth only in the hashSplit
    * sense — adding rows shifts the boundary by design: exact counts
    * and insertion stability are mutually exclusive, which is WHY both
    * operators exist).
    *
    * Scale shape: the per-stratum rank rides [[graft.operators.Ranks
    * .globalRowNumber]] on the (stratum, hash, key) total order —
    * stratum-local rank = global rank − stratum start offset, with
    * the offsets from the O(#strata) count table (the documented
    * bounded driver materialization class, same as alphaSampleRates).
    * No per-stratum window ever funnels a whole stratum through one
    * task — the trap a naive Window.partitionBy(stratum) hits when
    * strata are few and huge. */
  /** D69 — deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis, IPL 2006): each row gets the key
    * ln(u)/w with u a deterministic md5-derived uniform and w its
    * weight; the top-k by key IS a weighted sample without
    * replacement (u^(1/w) order, in log space). The distributed-
    * sampling primitive: one map-side key computation + a top-k
    * (TakeOrderedAndProject — no global sort, no single-partition
    * window), reproducible across runs/partitionings because u comes
    * from the row's identity, not an RNG stream. Weights must be
    * strictly positive. */
  def esKey(key: Column, weight: Column): Column = {
    val v = conv(substring(md5(key.cast("string").cast("binary")), 1, 12),
      16, 10).cast("long")
    val u = (v.cast("double") + 0.5) / math.pow(16, 12)
    log(u) / weight.cast("double")
  }

  def weightedSample(df: DataFrame, key: Column, weight: Column,
      k: Int): DataFrame =
    df.withColumn("es_key", esKey(key, weight))
      .orderBy(col("es_key").desc, key.asc)
      .limit(k)

  def exactStratifiedSplit(df: DataFrame, key: String, stratum: String,
      p: Double, heldOut: String = "val",
      npart: Int = 32): DataFrame = {
    val withH = df.select(col(key), col(stratum),
      md5(col(key).cast("string").cast("binary")).as("_h"))
    val ranked = graft.operators.Ranks.globalRowNumber(withH,
      Seq(col(stratum).asc, col("_h").asc, col(key).asc), npart, "_grn")
    val counts = withH.groupBy(stratum).agg(count(lit(1)).as("n_s"))
      .orderBy(stratum).collect() // O(#strata)
    var acc = 0L
    val offs = counts.map { r =>
      val o = (r.getString(0), acc, r.getLong(1)); acc += r.getLong(1); o
    }.toSeq
    val s = df.sparkSession
    import s.implicits._
    ranked.join(broadcast(offs.toDF(stratum, "_off", "n_s")), Seq(stratum))
      .withColumn("sr", col("_grn") - col("_off"))
      .withColumn("split",
        when(col("sr") <= ceil(col("n_s") * p), lit(heldOut))
          .otherwise(lit("train")))
      .select(col(key), col(stratum), col("sr"), col("split"))
  }
}
