package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Specs for the native Catalyst extensions registered by
  * GraftExtensions. */
class ExtensionsSpec extends SparkSpec {

  test("graft_cosine matches the composable dot/norm formulation exactly") {
    val emb = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val composable = graft.similarity.Ann.dot(col("e"), col("e")) /
      (graft.similarity.Ann.norm(col("e")) * graft.similarity.Ann.norm(col("e")))
    val diff = emb.select(
      (call_function("graft_cosine", col("e"), col("e")) - composable).as("d"))
      .filter(abs(col("d")) > 0).count()
    assert(diff === 0, "native and composable cosine must agree bit-for-bit")
  }

  test("graft_vec_mean equals the posexplode mean and handles empty groups") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1.0, 2.0, 3.0)),
      (0, Seq(3.0, 4.0, 5.0)),
      (1, Seq(10.0, 20.0, 30.0))).toDF("g", "v")
    val native = df.groupBy("g")
      .agg(call_function("graft_vec_mean", col("v")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(native(0) === Seq(2.0, 3.0, 4.0))
    assert(native(1) === Seq(10.0, 20.0, 30.0))
    // null inputs are counted out
    val withNull = Seq((0, Option(Seq(2.0, 4.0))), (0, Option.empty[Seq[Double]]))
      .toDF("g", "v")
      .groupBy("g").agg(call_function("graft_vec_mean", col("v")).as("m"))
      .collect().head.getSeq[Double](1).toSeq
    assert(withNull === Seq(2.0, 4.0))
  }

  test("graft_vec_mean survives mixed-dimension groups split across partitions") {
    import spark.implicits._
    // 100 dim-2 rows + 3 dim-1 rows in one group, spread across
    // partitions: partials that first-saw different dimensions reach
    // merge(), which must keep the count-dominant buffer (no AIOOBE,
    // no element-wise mixing of different dimensions)
    val rows = (0 until 100).map(_ => (0, Seq(1.0, 2.0))) ++
      (0 until 3).map(_ => (0, Seq(9.0)))
    val m = rows.toDF("g", "v").repartition(8)
      .groupBy("g").agg(call_function("graft_vec_mean", col("v")).as("m"))
      .collect().head.getSeq[Double](1).toSeq
    assert(m === Seq(1.0, 2.0), "count-dominant dimension wins")
  }

  test("graft_cell_scores equals per-cell graft_cosine bit-for-bit, incl. SQL path") {
    import spark.implicits._
    val codebook = Seq(Seq(1.0, 0.0, 0.0), Seq(0.5, 0.5, 0.0), Seq(0.0, 0.0, 0.0))
    val vecs = Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(-1.0, 0.5, 0.0)))
      .toDF("vec_id", "e").withColumn("e", col("e").cast("array<double>"))
    val fused = vecs.select(col("vec_id"),
      call_function("graft_cell_scores", col("e"), typedlit(codebook)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val perCell = vecs.select(col("vec_id"),
      array(codebook.map(c =>
        call_function("graft_cosine", col("e"), typedlit(c))): _*).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(fused === perCell)
    // zero-norm centroid scores 0.0, not NaN (cell 2)
    assert(fused(1L)(2) === 0.0)
    vecs.createOrReplaceTempView("cs_vecs")
    val sql = spark.sql(
      "SELECT graft_cell_scores(e, array(array(1.0D, 0.0D, 0.0D), " +
        "array(0.5D, 0.5D, 0.0D), array(0.0D, 0.0D, 0.0D))) AS s " +
        "FROM cs_vecs WHERE vec_id = 1").collect().head.getSeq[Double](0).toSeq
    assert(sql === fused(1L))
  }

  test("graft_might_contain: no false negatives, fpp-bounded positives, SQL path") {
    val bytes = graft.operators.Bloom.keyFilterBytes(
      spark.range(0, 1000).toDF("k"), "k", fpp = 0.01)
    val probed = spark.range(0, 100000).toDF("k")
      .select(col("k"),
        call_function("graft_might_contain", col("k"), lit(bytes)).as("hit"))
    // every inserted key must hit
    assert(probed.filter(col("k") < 1000 && !col("hit")).count() === 0,
      "bloom false negative")
    // false-positive rate on the 99k non-members stays near the build fpp
    val fp = probed.filter(col("k") >= 1000 && col("hit")).count()
    assert(fp < 99000 * 0.03, s"false-positive count $fp exceeds 3x build fpp")
    probed.createOrReplaceTempView("bloom_probe")
    assert(spark.sql("SELECT count(*) FROM bloom_probe WHERE hit").collect()
      .head.getLong(0) >= 1000)
  }

  test("graft_vec_mean works in SQL and under partial aggregation") {
    import spark.implicits._
    val big = (0 until 10000).map(i => (i % 7, Seq(i.toDouble, (i * 2).toDouble)))
      .toDF("g", "v").repartition(8)
    big.createOrReplaceTempView("vecs")
    val rows = spark.sql(
      "SELECT g, graft_vec_mean(v) AS m FROM vecs GROUP BY g ORDER BY g").collect()
    assert(rows.length === 7)
    // group 0: values 0,7,14,... mean = expected arithmetic mean
    val g0 = (0 until 10000).filter(_ % 7 == 0).map(_.toDouble)
    val expected = g0.sum / g0.size
    assert(math.abs(rows.head.getSeq[Double](1).head - expected) < 1e-9)
  }

  test("D67: dim stats match an exact driver recomputation on dim 0") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("emb_dim_stats")(spark, sf).collect()
    assert(out.length === 64)
    out.foreach { r =>
      assert(r.getAs[Long]("var_q") >= 0L, s"dim ${r.getInt(0)} negative var")
    }
    val xs = graft.Tables.embeddings(spark, sf)
      .select(element_at(col("embedding").cast("array<double>"), 1))
      .collect().map(_.getDouble(0))
    val n = xs.length.toLong
    val s1 = xs.map(x => math.floor(x * 1e6).toLong).sum
    val s2 = xs.map { x =>
      val q = math.floor(x * 1e6); (q * q).toLong }.sum
    val mean = s1 / (1e6 * n)
    val expMean = math.floor(mean * 1e6).toLong
    val expVar = math.floor((s2 / (1e12 * n) - mean * mean) * 1e9).toLong
    val d0 = out.find(_.getInt(0) == 0).get
    assert(d0.getAs[Long]("mean_q") === expMean)
    assert(d0.getAs[Long]("var_q") === expVar)
    assert(d0.getAs[Long]("n") === n)
  }

  test("D78: graft_cm_estimate is one-sided, bounded, and exact on hand counts") {
    import spark.implicits._
    val df = (Seq.fill(100)("alpha") ++ Seq.fill(7)("beta") ++ Seq("gamma"))
      .toDF("word")
    val sk = df.agg(expr("count_min_sketch(word, 0.001d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val est = Seq("alpha", "beta", "gamma", "absent").toDF("w")
      .select(col("w"),
        call_function("graft_cm_estimate", col("w"), lit(sk)).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 108 items, eps 0.001 → the error budget is < 1, so estimates on
    // this corpus must be EXACT (and the absent key must read 0)
    assert(est === Map("alpha" -> 100L, "beta" -> 7L, "gamma" -> 1L,
      "absent" -> 0L))
  }

  test("D78: shard sketches merged equal the one-pass sketch (mergeability law)") {
    import org.apache.spark.util.sketch.CountMinSketch
    import java.io.ByteArrayInputStream
    val words = graft.functions
      .Spread(Tables.documents(spark, sf), col("doc_id"))
      .select(col("doc_id"), explode(graft.functions.Text.words(col("text")))
        .as("word"))
    def build(df: org.apache.spark.sql.DataFrame) =
      CountMinSketch.readFrom(new ByteArrayInputStream(
        df.agg(expr("count_min_sketch(word, 0.01d, 0.9d, 42)"))
          .head().getAs[Array[Byte]](0)))
    val full = build(words)
    val even = build(words.filter(col("doc_id") % 2 === 0))
    val odd = build(words.filter(col("doc_id") % 2 =!= 0))
    even.mergeInPlace(odd)
    val probes = words.groupBy("word").count()
      .orderBy(desc("count"), asc("word")).limit(20)
      .collect().map(_.getString(0))
    probes.foreach { w =>
      assert(even.estimateCount(org.apache.spark.unsafe.types.UTF8String
          .fromString(w).getBytes) ===
        full.estimateCount(org.apache.spark.unsafe.types.UTF8String
          .fromString(w).getBytes),
        s"merged shard estimate must equal the one-pass estimate for '$w'")
    }
  }

  test("D78: the coverage entry's estimates dominate exact counts within the eps bound") {
    val out = graft.SparkEntry.queries("text_cm_point_freq")(spark, sf)
      .collect()
    assert(out.length === 30)
    assert(out.forall(_.getAs[Boolean]("one_sided_ok")),
      "count-min can only overcount")
    val n = graft.functions.Spread(Tables.documents(spark, sf), col("doc_id"))
      .select(explode(graft.functions.Text.words(col("text"))).as("w"))
      .count()
    val bound = math.ceil(0.001 * n).toLong * 10 // generous slack on eps·N
    assert(out.forall(_.getAs[Long]("overcount") <= bound),
      s"overcounts must sit within the eps·N class (N=$n)")
  }

  test("graft_simhash64 is bit-identical to the 64-column composed formulation") {
    val docs = graft.Tables.documents(spark, sf)
    val fused = graft.dedup.Dedup.simhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = graft.dedup.Dedup.simhashSignaturesComposed(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.nonEmpty && fused == composed)
    // hand check: a single-hash group's simhash IS that hash's bits
    // (each bit's lone vote carries its own sign)
    import spark.implicits._
    val one = Seq((1L, 0x0123456789abcdefL), (2L, -1L), (3L, 0L))
      .toDF("doc_id", "h")
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions
        .call_function("graft_simhash64", org.apache.spark.sql.functions.col("h"))
        .as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(1L) == 0x0123456789abcdefL)
    assert(one(2L) == -1L)
    assert(one(3L) == 0L)
  }
}
