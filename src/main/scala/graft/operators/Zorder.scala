package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R37 — Z-order (Morton) multi-dimensional clustering for
  * data-skipping layouts.
  *
  * At 100 TB a table is filtered on MORE than its sort key: a layout
  * range-clustered on one column skips row groups for that column only,
  * while a Z-ordered layout interleaves the bits of several columns so
  * every file/row-group covers a small hyper-rectangle of the key
  * space — a range filter on ANY of the interleaved dimensions then
  * prunes most row groups via ordinary parquet min/max statistics (the
  * Delta/Iceberg OPTIMIZE ZORDER idea, expressed with nothing but a
  * codegen'd integer expression + repartitionByRange + sorted write;
  * no table format required).
  *
  * The z-value is pure integer arithmetic — bit i of each dimension
  * lands at position dims·i of the key — so the oracle mirrors it
  * term-for-term in DuckDB and the entry is exactly hash-gated.
  * Production use quantile-normalizes each dimension first (equal-depth
  * buckets over 2^bits); the raw masked form here keeps the whole
  * operator SQL-mirrorable, and [[ZorderSpec]] gates the part an SQL
  * oracle cannot: that the layout actually skips row groups for
  * two-dimensional range filters that a single-column sort cannot
  * serve.
  *
  * Reference analogue: Net7EtlBus keys its store on the composite
  * zipcode_statecode (`ZipCodeHelpers.cs:12-15`) — a lexicographic
  * concat that clusters one dimension only; Z-ordering is the
  * multi-dimensional generalization a 100 TB layout needs.
  */
object Zorder {

  /** Morton interleave of two non-negative integer dims, `bits` low
    * bits each (defaults cover 16-bit-quantized dimensions):
    * z = Σ_i ((x>>i)&1)·4^i + 2·((y>>i)&1)·4^i. Codegen-friendly:
    * a flat sum of shifts/ands, no UDF, no loop at runtime. */
  def zvalue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31)
    val mask = (1L << bits) - 1
    val xb = x.cast("long").bitwiseAND(lit(mask))
    val yb = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftright(xb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(yb, i).bitwiseAND(lit(1L)) * lit(2L << (2 * i))
    }.reduce(_ + _)
  }

  /** Write `df` Z-clustered on (x, y): range-partition by z-value so
    * each output file owns a contiguous z-range (a small
    * hyper-rectangle of (x, y) space), sort within partitions so
    * row-group min/max stats are tight. The helper column never
    * reaches the files. */
  def writeZordered(df: DataFrame, x: Column, y: Column, path: String,
      numFiles: Int, bits: Int = 16,
      options: Map[String, String] = Map.empty): Unit =
    df.withColumn("__zval", zvalue2(x, y, bits))
      .repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
      .write.options(options).mode("overwrite").parquet(path)

  /** Oracle-side mirror of [[zvalue2]]: the identical flat term sum in
    * DuckDB integer arithmetic. */
  private def oZ(xc: String, yc: String, bits: Int): String = {
    val mask = (1L << bits) - 1
    (0 until bits).map { i =>
      s"((($xc & $mask) >> $i) & 1) * ${1L << (2 * i)} + " +
        s"((($yc & $mask) >> $i) & 1) * ${2L << (2 * i)}"
    }.mkString("CAST(", " + ", " AS BIGINT)")
  }

  /** The z-value computation over lineitem's (l_partkey, l_suppkey) —
    * the two dimensions a part-supplier workload filters together. */
  val qZorder = QueryDef(
    "q_zorder_key",
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        zvalue2(col("l_partkey"), col("l_suppkey")).as("zval"))
      .orderBy("zval", "l_orderkey", "l_linenumber"),
    Some(s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                    ${oZ("l_partkey", "l_suppkey", 16)} AS zval
             FROM lineitem
             ORDER BY zval, l_orderkey, l_linenumber"""))

  val all: Seq[QueryDef] = Seq(qZorder)
}
