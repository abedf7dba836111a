package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** E26 — the generic table profiler vs driver-side replays. */
class ProfileSpec extends SparkSpec {

  test("E26: per-column stats replay exactly and obey profile laws") {
    val out = Profile.profile(Tables.lineitem(spark, sf),
      Seq("l_returnflag", "l_quantity", "l_orderkey")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("string"),
        col("l_orderkey").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val n = rows.length.toLong
    def check(name: String, vals: Seq[String]): Unit = {
      val r = out(name)
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("null_ppm") === 0L)
      assert(r.getAs[Long]("n_distinct") === vals.distinct.size.toLong)
      assert(r.getAs[String]("min_val") === vals.min)
      assert(r.getAs[String]("max_val") === vals.max)
      val (topV, topN) = vals.groupBy(identity).view
        .mapValues(_.size).toSeq
        .sortBy { case (v, c) => (-c, v) }.head
      assert(r.getAs[String]("top_val") === topV)
      assert(r.getAs[Long]("top_n") === topN.toLong)
      assert(r.getAs[Long]("top_ppm") === topN * 1000000L / n)
      // profile laws
      assert(r.getAs[Long]("n_distinct") <= n)
      assert(r.getAs[Long]("top_n") <= n)
    }
    check("l_returnflag", rows.map(_._1))
    check("l_quantity", rows.map(_._2))
    check("l_orderkey", rows.map(_._3))
  }

  test("E26b: sketch profile — exact parts exact, sketch parts bounded, skewed modes right") {
    val out = Profile.etlProfileSketchEval.fn(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val exact = Profile.profile(Tables.lineitem(spark, sf),
      Seq("l_orderkey", "l_quantity", "l_returnflag", "l_linestatus"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    exact.foreach { case (c, e) =>
      val s0 = out(c)
      // counts ride the sketch pass exactly
      assert(s0.getAs[Long]("n") === e.getAs[Long]("n"))
      // HLL within its rsd class (0.02 build → 5% gate, R19 convention)
      assert(s0.getAs[Double]("distinct_rel_err") <= 0.05,
        s"$c distinct_rel_err=${s0.getAs[Double]("distinct_rel_err")}")
    }
    // the sketch profile's min/max are TYPE-ordered (the profiler-
    // correct reading — the lexicographic form ranks "10.0" < "9.0");
    // on STRING columns the orders coincide, so E26 parity pins those,
    // and numeric columns check against a direct typed recompute
    for (c <- Seq("l_returnflag", "l_linestatus")) {
      assert(out(c).getAs[String]("min_val") ===
        exact(c).getAs[String]("min_val"), s"$c min")
      assert(out(c).getAs[String]("max_val") ===
        exact(c).getAs[String]("max_val"), s"$c max")
    }
    for (c <- Seq("l_orderkey", "l_quantity")) {
      val typed = Tables.lineitem(spark, sf)
        .agg(min(col(c)).cast("string"), max(col(c)).cast("string"))
        .head()
      assert(out(c).getAs[String]("min_val") === typed.getString(0), s"$c min")
      assert(out(c).getAs[String]("max_val") === typed.getString(1), s"$c max")
    }
    // the heavy-hitter mode must be EXACT on genuinely skewed columns
    // (low-cardinality); on near-uniform ones "mode" carries no signal
    // and Misra-Gries legitimately returns any survivor
    for (c <- Seq("l_returnflag", "l_linestatus"))
      assert(out(c).getAs[String]("approx_top_val") ===
        exact(c).getAs[String]("top_val"), s"$c sketch mode")
  }

  test("E31: FD discovery finds the key, rejects non-keys, counts violations exactly") {
    val out = Profile.etlFdDiscovery.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out.size === 12)
    // the key determines every other column
    out.filter(_._1._1 == "o_orderkey").foreach { case (k, (_, v, h)) =>
      assert(h && v === 0L, s"$k must hold")
    }
    // low-cardinality columns cannot determine the key
    assert(!out(("o_orderstatus", "o_orderkey"))._3)
    assert(!out(("o_orderpriority", "o_orderkey"))._3)
    // violation counts equal a driver-side recompute
    val rows = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0).toString, r.getString(1)))
    val expViol = rows.distinct.groupBy(_._1).count(_._2.size > 1).toLong
    assert(out(("o_custkey", "o_orderstatus"))._2 === expViol)
  }
}
