package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.types._

/** E39 — the static schema-contract rules, plus agreement with the
  * engine's actual runtime behavior (the rule set must predict what
  * IO10's mergeSchema read really does). */
class SchemaCompatSpec extends SparkSpec {

  private def st(fs: (String, DataType, Boolean)*) =
    StructType(fs.map { case (n, t, nl) => StructField(n, t, nl) })

  test("E39: the rule matrix — widening ok, narrowing/missing-required/nullability break") {
    val writer = st(("id", LongType, false), ("v", IntegerType, true),
      ("s", StringType, true))
    // projection + widening + added nullable column: compatible
    assert(SchemaCompat.canRead(writer,
      st(("id", LongType, false), ("v", LongType, true),
        ("extra", StringType, true))))
    // narrowing breaks
    val narrow = SchemaCompat.violations(writer, st(("id", IntegerType, false)))
    assert(narrow.exists(v => v.path == "id" && v.reason.contains("widening")))
    // required-but-absent breaks; nullable-absent is fine
    assert(!SchemaCompat.canRead(writer, st(("missing", LongType, false))))
    assert(SchemaCompat.canRead(writer, st(("missing", LongType, true))))
    // nullable writer into non-nullable reader breaks
    assert(!SchemaCompat.canRead(writer, st(("v", IntegerType, false))))
    // cross-family breaks
    assert(!SchemaCompat.canRead(writer, st(("s", LongType, true))))
    // nested recursion reports full paths
    val wNest = st(("o", st(("a", IntegerType, true)), true))
    val rNest = st(("o", st(("a", StringType, true)), true))
    val vs = SchemaCompat.violations(wNest, rNest)
    assert(vs.map(_.path) === Seq("o.a"))
    // arrays: element widening ok, element narrowing breaks
    assert(SchemaCompat.canRead(
      st(("xs", ArrayType(IntegerType, false), true)),
      st(("xs", ArrayType(LongType, false), true))))
    assert(!SchemaCompat.canRead(
      st(("xs", ArrayType(LongType, false), true)),
      st(("xs", ArrayType(IntegerType, false), true))))
  }

  test("E39 x IO15: schema drift audits across snapshot versions") {
    import spark.implicits._
    // a table's schema evolves across commits; the checker answers
    // "can a reader built against version N still read version M"
    // straight off the time-travel reads — no schema registry needed
    val root = java.nio.file.Files
      .createTempDirectory("graft_compat_snap").toString
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), root)
    Snapshots.commit(Seq((2L, "b", 9L)).toDF("id", "v", "n"), root)
    val s1 = Snapshots.readVersion(spark, root, 1).schema
    val s2 = Snapshots.readVersion(spark, root, 2).schema
    // forward: v1 data readable under the evolved v2 contract
    assert(SchemaCompat.canRead(s1,
      s2.copy(fields = s2.fields.map(_.copy(nullable = true)))))
    // backward: v2 data is NOT readable by a reader that REQUIRES the
    // v1-only world to have no extra columns... projection makes it
    // fine — but a v1 reader requiring a non-null column absent in v1
    // direction is the break the checker must catch:
    val strictNewReader = org.apache.spark.sql.types.StructType(
      s2.fields.map(f => f.copy(nullable = false)))
    val vs = SchemaCompat.violations(s1, strictNewReader)
    assert(vs.exists(_.path == "n"),
      "a required new column must flag against the old snapshot")
  }

  test("E39: the verdict matches the engine's real mergeSchema behavior") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compat").toString
    Seq((1L, "x")).toDF("id", "s").write.parquet(s"$dir/p=1")
    val evolved = Seq((2L, "y", 9L)).toDF("id", "s", "n")
    evolved.write.parquet(s"$dir/p=2")
    val writer = spark.read.parquet(s"$dir/p=1").schema // old files
    val reader = evolved.schema.copy(fields = evolved.schema.fields
      .map(_.copy(nullable = true)))
    // the checker says old data is readable under the evolved schema
    assert(SchemaCompat.canRead(writer, reader))
    // and the engine agrees: mergeSchema reads old rows with NULL n
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    val old = merged.filter(col("id") === 1L).collect().head
    assert(old.isNullAt(old.fieldIndex("n")))
  }
}
