package graft

import graft.etl.ZipEtl
import graft.functions.{Text, Winnow}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants of the core operators: the algebraic
  * contracts users rely on, checked over ScalaCheck-generated inputs
  * (sampled with fixed seeds — the scalatest/scalacheck bridge is not
  * on the offline classpath). */
class PropertySpec extends SparkSpec {

  private val word = Gen.oneOf("the", "cat", "und", "DOG!", "le", "42",
    "  spaced ", "MiXeD", "punct,", "a")
  private val textGen = Gen.listOfN(12, word).map(_.mkString(" "))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("canonicalization is idempotent") {
    import spark.implicits._
    val texts = samples(textGen, 40)
    assert(texts.nonEmpty)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val once = df.select(Text.canonical(col("text")).as("c"))
    val twice = once.select(Text.canonical(col("c")).as("c"))
    assert(once.collect().map(_.getString(0)).toSeq ===
      twice.collect().map(_.getString(0)).toSeq)
  }

  test("last-wins dedup is idempotent and never grows") {
    val ingest = ZipEtl.ingest(spark)
    val once = ZipEtl.dedupeLastWins(ingest).cache()
    val twice = ZipEtl.dedupeLastWins(once)
    assert(once.count() <= ingest.count())
    assert(twice.count() === once.count())
    assert(twice.exceptAll(once).count() === 0)
    once.unpersist()
  }

  test("upsert is idempotent: applying the same delta twice changes nothing") {
    val base = ZipEtl.processedBaseline(spark)
    val delta = ZipEtl.enrich(ZipEtl.dedupeLastWins(ZipEtl.ingest(spark)))
      .withColumn("last_modified", lit(ZipEtl.runDate).cast("date"))
    val once = ZipEtl.upsert(base, delta).cache()
    val twice = ZipEtl.upsert(once, delta)
    assert(twice.count() === once.count())
    assert(twice.exceptAll(once).count() === 0)
    once.unpersist()
  }

  test("winnowing guarantee: docs sharing a long substring share a fingerprint") {
    import spark.implicits._
    // guarantee threshold: any shared canonical substring of length
    // >= w + k - 1 = 11 yields a shared fingerprint (k=8, w=4)
    val shared = "abcdefghijklmnopqrstuvwxyz0123456789"
    val prefixGen = Gen.alphaLowerStr.suchThat(s => s.length >= 3 && s.length <= 30)
    samples(Gen.zip(prefixGen, prefixGen), 10).foreach { case (p, q) =>
      val docs = Seq((1L, s"$p $shared"), (2L, s"$q $shared"))
        .toDF("doc_id", "text")
      val fps = Winnow.fingerprints(docs).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          r.getSeq[Long](r.fieldIndex("winnow_fps")).toSet).toMap
      assert((fps(1L) & fps(2L)).nonEmpty, s"prefixes: '$p' / '$q'")
    }
  }
}
