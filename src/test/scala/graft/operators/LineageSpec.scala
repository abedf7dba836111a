package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** L2 — column lineage: exact source sets through projections,
  * aggregates, joins, windows, generators, unions, and self-joins. */
class LineageSpec extends SparkSpec {

  test("L2: Q3's revenue traces to exactly the two lineitem money columns") {
    val df = graft.SparkEntry.queries("q3_shipping_priority")(spark, sf)
    val lin = Lineage.columns(df)
    assert(lin("revenue") ===
      Set("lineitem.l_extendedprice", "lineitem.l_discount"))
    assert(lin("o_orderdate") === Set("orders.o_orderdate"))
  }

  test("L2: aliases and arithmetic keep lineage; filters add nothing") {
    val df = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R") // control flow — excluded
      .select((col("l_quantity") * col("l_tax")).as("qt"),
        col("l_orderkey").as("k"))
    val lin = Lineage.columns(df)
    assert(lin("qt") === Set("lineitem.l_quantity", "lineitem.l_tax"))
    assert(lin("k") === Set("lineitem.l_orderkey"))
    assert(!lin.values.flatten.toSet.contains("lineitem.l_returnflag"),
      "the filter predicate must not pollute data lineage")
  }

  test("L2: self-join aliases resolve to the same table without cross-talk") {
    val a = Tables.nation(spark, sf).select(col("n_nationkey").as("ka"),
      col("n_name").as("name_a"))
    val b = Tables.nation(spark, sf).select(col("n_nationkey").as("kb"),
      col("n_regionkey").as("reg_b"))
    val df = a.join(b, col("ka") === col("kb"))
      .select(col("name_a"), col("reg_b"))
    val lin = Lineage.columns(df)
    assert(lin("name_a") === Set("nation.n_name"))
    assert(lin("reg_b") === Set("nation.n_regionkey"))
  }

  test("L2: windows, explodes, and unions merge lineage correctly") {
    // window over one column ordered by another: both are data inputs
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("l_shipdate")
    val win = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_shipdate"), col("l_quantity"))
      .withColumn("runsum", sum("l_quantity").over(w))
    val linW = Lineage.columns(win)
    assert(linW("runsum").contains("lineitem.l_quantity"))
    // generator output traces to the exploded source column
    val gen = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val linG = Lineage.columns(gen)
    assert(linG("word") === Set("documents.text"))
    assert(linG("doc_id") === Set("documents.doc_id"))
    // positional union merges both branches' sources
    val u = Tables.customer(spark, sf).select(col("c_name").as("name"))
      .unionByName(Tables.supplier(spark, sf).select(col("s_name").as("name")))
    assert(Lineage.columns(u)("name") ===
      Set("customer.c_name", "supplier.s_name"))
  }

  test("L2: table-level dependencies name exactly the tables a query reads") {
    assert(Lineage.tables(
      graft.SparkEntry.queries("q1_pricing_summary")(spark, sf))
      === Set("lineitem"))
    assert(Lineage.tables(
      graft.SparkEntry.queries("q5_local_supplier")(spark, sf))
      === Set("lineitem", "orders", "customer", "supplier", "nation",
        "region"))
    assert(Lineage.tables(
      graft.SparkEntry.queries("q_cohort_retention")(spark, sf))
      === Set("orders"))
  }

  test("L2: every coverage entry resolves with non-empty lineage on data columns") {
    // smoke the extractor across wildly different plan shapes: take a
    // sample of entries and demand at least one traced source column
    val names = Seq("q1_pricing_summary", "q_cube_grouping", "q_pivot",
      "q13_order_distribution", "text_tfidf_keywords", "q_window_rank")
    names.foreach { n =>
      val lin = Lineage.columns(graft.SparkEntry.queries(n)(spark, sf))
      assert(lin.nonEmpty, s"$n: no output columns resolved")
      assert(lin.values.exists(_.nonEmpty),
        s"$n: no output column traced to any source")
    }
  }
}
