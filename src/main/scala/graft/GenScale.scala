package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-corpus generator — the r7 verdict's item 1
  * prerequisite: the committed scale-stress measurements
  * (`bench/scale_sf*.json`, see [[ScaleBench]]) need 50–100× the
  * largest driver-provided dataset, generated reproducibly.
  *
  * Same star schema, value domains, and seed discipline as
  * `/root/testdata` (TESTDATA.md; every categorical domain matches —
  * region/brand/priority/segment/event-type/lang literals that entries
  * filter on all exist at every sf). Every column is a pure hash
  * expression of the row id (`xxhash64(id, salt)`), so generation is
  * one embarrassingly-parallel `spark.range` per table: no driver
  * data, no RNG state, bit-identical on every run and at any
  * parallelism — and the lineitem→orders date correlation is kept by
  * RE-DERIVING the order's date hash from `l_orderkey` instead of
  * joining.
  *
  * Usage: `runMain graft.GenScale <outDir> <sf> [skewExp]` (sf
  * relative to the driver's convention: sf1 ≡ 6M lineitem rows ≈
  * 170 MB; skewExp > 0 makes the events user distribution power-law —
  * see the events block).
  */
object GenScale {

  private def h(c: Column, salt: Int): Column = {
    // abs(Long.MinValue) stays negative (2^-64 per hash draw), which
    // would make the downstream `% n` negative and element_at pick
    // from the array END — clamp that one value to 0. Deliberately
    // NOT pmod: pmod(x,n) != abs(x)%n for every negative hash, which
    // would silently regenerate a different corpus and break r8→r9
    // scale-measurement comparability; this form is bit-identical to
    // the committed r8 corpus for every non-MinValue hash.
    val a = abs(xxhash64(c, lit(salt)))
    when(a < 0, lit(0L)).otherwise(a)
  }

  private def pick(c: Column, salt: Int, vals: Seq[String]): Column = {
    val arr = array(vals.map(lit): _*)
    element_at(arr, (h(c, salt) % vals.size).cast("int") + 1)
  }

  /** Cents-exact double in [0, hi) with two decimals. */
  private def money(c: Column, salt: Int, hi: Long): Column =
    round((h(c, salt) % (hi * 100)).cast("double") / 100.0, 2)

  val Vocab: Seq[String] = Seq("spark", "line", "column", "order",
    "small", "sort", "fast", "value", "scan", "hash", "slow", "group",
    "batch", "agg", "filter", "query", "a", "big", "key", "window",
    "row", "part", "table", "stream", "merge", "data", "the", "join",
    "vector", "customer")

  val Langs: Seq[String] = Seq("en", "en", "de", "es", "fr", "zh")

  /** The order-date formula, shared by orders AND lineitem (which
    * re-derives its order's date from l_orderkey — correlation without
    * a generation-time join). 1995-01-01 + [0, 2400) days. */
  private def orderDate(key: Column): Column =
    timestamp_seconds(lit(788918400L) + (h(key, 40) % 2400) * 86400L)

  def gen(spark: SparkSession, out: String, sf: Double,
      skewExp: Double = 0.0): Unit = {
    val nCust = (150000 * sf).toLong max 100
    val nSupp = (10000 * sf).toLong max 50
    val nPart = (200000 * sf).toLong max 100
    val nOrd = (1500000 * sf).toLong max 1000
    val nLine = 4 * nOrd
    val nEv = (1000000 * sf).toLong max 1000
    val nUsers = (15000 * sf).toLong max 100
    val nDoc = (50000 * sf).toLong max 500
    val nVec = (20000 * sf).toLong max 200

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    import spark.implicits._
    write(Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name"), "region")
    write((0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey"), "nation")

    write(spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      (h(col("id"), 1) % 25).cast("int").as("c_nationkey"),
      money(col("id"), 2, 10000).as("c_acctbal"),
      pick(col("id"), 3, Seq("BUILDING", "HOUSEHOLD", "MACHINERY",
        "AUTOMOBILE", "FURNITURE")).as("c_mktsegment")), "customer")

    write(spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      (h(col("id"), 10) % 25).cast("int").as("s_nationkey"),
      money(col("id"), 11, 10000).as("s_acctbal")), "supplier")

    write(spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat_ws(" ",
        pick(col("id"), 20, Seq("large", "hot", "blue", "old", "cold",
          "red", "green", "tiny")),
        pick(col("id"), 21, Seq("ring", "bolt", "plate", "wheel", "box",
          "pipe", "cap", "rod"))).as("p_name"),
      concat(lit("Brand#"), ((h(col("id"), 22) % 25) + 1).cast("string"))
        .as("p_brand"),
      pick(col("id"), 23, Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO",
        "SMALL", "STANDARD")).as("p_type"),
      ((h(col("id"), 24) % 50) + 1).cast("int").as("p_size"),
      round(lit(900.0) + (h(col("id"), 25) % 1000).cast("double") / 10.0, 2)
        .as("p_retailprice")), "part")

    write(spark.range(nOrd).select(
      col("id").as("o_orderkey"),
      (h(col("id"), 30) % nCust).as("o_custkey"),
      pick(col("id"), 31, Seq("O", "O", "F", "F", "P")).as("o_orderstatus"),
      round(lit(1000.0) +
        (h(col("id"), 32) % 49900000).cast("double") / 100.0, 2)
        .as("o_totalprice"),
      orderDate(col("id")).as("o_orderdate"),
      pick(col("id"), 33, Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")).as("o_orderpriority")), "orders")

    write(spark.range(nLine).select(
      (col("id") / 4).cast("long").as("l_orderkey"),
      (h(col("id"), 50) % nPart).as("l_partkey"),
      (h(col("id"), 51) % nSupp).as("l_suppkey"),
      // deliberately NON-unique within an order, like the testdata
      ((h(col("id"), 52) % 7) + 1).cast("int").as("l_linenumber"),
      ((h(col("id"), 53) % 50) + 1).cast("double").as("l_quantity"),
      round(lit(900.0) +
        (h(col("id"), 54) % 10400000).cast("double") / 100.0, 2)
        .as("l_extendedprice"),
      ((h(col("id"), 55) % 11).cast("double") / 100.0).as("l_discount"),
      ((h(col("id"), 56) % 9).cast("double") / 100.0).as("l_tax"),
      pick(col("id"), 57, Seq("R", "N", "A")).as("l_returnflag"),
      pick(col("id"), 58, Seq("O", "F")).as("l_linestatus"),
      // ship 1–120 days after the (re-derived) order date
      timestamp_seconds(
        unix_timestamp(orderDate((col("id") / 4).cast("long"))) +
          ((h(col("id"), 59) % 120) + 1) * 86400L).as("l_shipdate")),
      "lineitem")

    // skewExp = 0 → uniform users (the driver-testdata shape);
    // skewExp = s > 0 → power-law-ish concentration via the inverse-
    // CDF trick u^s (still a pure hash expression): at s = 3 and sf1
    // the heaviest user carries ~4% of ALL events — the real-world
    // hot-key shape that stresses per-user windows, sessionization
    // state, and join salting under load
    val u = (h(col("id"), 61) % 1000000L).cast("double") / 1e6
    val userExpr =
      if (skewExp > 0) floor(pow(u, skewExp) * nUsers).cast("long")
      else (h(col("id"), 61) % nUsers)
    write(spark.range(nEv).select(
      col("id").as("event_id"),
      // 30 days of 2024-01, microsecond jitter
      timestamp_micros(lit(1704067200000000L) +
        (h(col("id"), 60) % (30L * 86400000000L))).as("ts"),
      userExpr.as("user_id"),
      pick(col("id"), 62, Seq("view", "click", "purchase", "signup",
        "error")).as("event_type"),
      money(col("id"), 63, 561).as("value"),
      format_string("{\"k\": %d}", h(col("id"), 64) % 100).as("props")),
      "events")

    val vocabArr = array(Vocab.map(lit): _*)
    val docs = spark.range(nDoc).select(
      col("id").as("doc_id"),
      array_join(transform(
        sequence(lit(0), (h(col("id"), 70) % 90 + 10).cast("int")),
        i => element_at(vocabArr,
          pmod(xxhash64(col("id"), i, lit(71)), lit(Vocab.size))
            .cast("int") + 1)), " ").as("text"),
      pick(col("id"), 72, Langs).as("lang"),
      concat(lit("src"), (h(col("id"), 73) % 20).cast("string"))
        .as("source"))
      .withColumn("n_chars", length(col("text")))
    write(docs, "documents")

    // label-clustered embeddings: centroid(label, dim) + per-vector
    // noise, both pure hashes — ANN/blocking structure at any scale
    write(embeddingsFrame(spark, nVec), "embeddings")
  }

  /** The embeddings table as a standalone frame — [[ImiCapBench]]
    * generates a vectors-only corpus past the IVF cell cap (tens of
    * millions of rows) without paying for the rest of the star. */
  def embeddingsFrame(spark: SparkSession, nVec: Long): DataFrame =
    spark.range(nVec).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        (((pmod(xxhash64(pmod(xxhash64(col("id"), lit(80)), lit(10)), i,
            lit(81)), lit(1000)) - 500).cast("double") / 2500.0) +
          ((pmod(xxhash64(col("id"), i, lit(82)), lit(2000)) - 1000)
            .cast("double") / 5000.0)).cast("float")).as("embedding"),
      pmod(xxhash64(col("id"), lit(80)), lit(10)).cast("int").as("label"))

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val sf = args(1).toDouble
    val skewExp = if (args.length > 2) args(2).toDouble else 0.0
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("WARN")
    gen(spark, out, sf, skewExp)
    println(s"generated sf=$sf skew=$skewExp at $out")
    spark.stop()
  }
}
