package graft.plans

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** The native Jaro-Winkler expression: pinned reference values
  * (bit-identical to DuckDB's jaro_winkler_similarity), SQL-surface
  * registration, and codegen/interpreted agreement. */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.score(UTF8String.fromString(a), UTF8String.fromString(b))

  test("reference values match DuckDB bit for bit") {
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("dixon", "dicksonx") === 0.8133333333333332)
    // below the 0.7 boost threshold the prefix must NOT boost
    assert(jw("ab", "axyzwqrs") === 0.5416666666666666)
    assert(jw("abcdxx", "abzzzzzz") === 0.5277777777777778)
    assert(jw("", "") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
  }

  test("non-ASCII parity: DuckDB compares UTF-8 BYTES, so must we " +
      "(a UTF-16 char loop scores héllo/hello 0.88, DuckDB says 0.84)") {
    assert(jw("héllo", "hello") === 0.8400000000000001)
    assert(jw("für", "fur") === 0.75)
    assert(jw("crate", "trace") === 0.7333333333333334)
    // CJK: every code point is 3 UTF-8 bytes — byte-level windows
    assert(jw("日本語テキスト", "日本語のテキスト") === 0.9369047619047619)
  }

  test("the SQL surface and codegen path agree with the direct score") {
    import spark.implicits._
    val one = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta') AS s").head().getDouble(0)
    assert(one === 0.9611111111111111)
    // dataframe path (whole-stage codegen) over many pairs == direct
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("graft", "craft"), ("spark", "sprak"), ("abc", "abd"))
    val viaDf = pairs.toDF("a", "b")
      .selectExpr("graft_jaro_winkler(a, b) AS s")
      .collect().map(_.getDouble(0)).toSeq
    assert(viaDf === pairs.map { case (a, b) => jw(a, b) })
    // nulls propagate
    assert(spark.sql("SELECT graft_jaro_winkler(CAST(NULL AS STRING), 'x') AS s")
      .head().isNullAt(0))
  }

  test("E30b: JW linkage recovers most corrupted records correctly") {
    val rows = graft.etl.Linkage.etlRecordLinkageJw.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val correct = rows.count(_.getAs[Boolean]("is_correct")).toDouble
    assert(correct / rows.length >= 0.85,
      s"JW must link most single-typo names: ${correct / rows.length}")
    rows.foreach(r => assert(r.getAs[Double]("jw") >= 0.85))
  }
}
