package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for text analysis D8-D11. */
class TextSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def one(text: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("canonical lowercases, strips punctuation, collapses whitespace") {
    val out = one("  Hello,   WORLD!! 42 ").select(Text.canonical(col("text"))).head().getString(0)
    assert(out === "hello world 42")
  }

  test("D8: language ID picks the language with most marker hits") {
    val cases = Seq(
      "the cat and the dog is a friend of mine" -> "en",
      "der hund und die katze das ist gut" -> "de",
      "el perro y los gatos las casas es bueno" -> "es",
      "le chien et la maison les arbres des fleurs" -> "fr",
      "xyzzy qwerty plugh" -> "en") // no markers → priority default
    cases.foreach { case (text, expected) =>
      val got = one(text).select(Text.langId(col("text"))).head().getString(0)
      assert(got === expected, s"text: $text")
    }
  }

  test("D9: quality score is bounded and ranks clean text above noise") {
    val clean = "the report covers quarterly results and the outlook is strong " * 3
    val noise = "@@## $$%% ^^&& !!?? ||}{"
    val q = (t: String) => one(t).select(Text.qualityScore(col("text"))).head().getDouble(0)
    assert(q(clean) > q(noise))
    assert(q(clean) <= 1.0 && q(noise) >= 0.0)
  }

  test("D10: token counts — whitespace vs BPE-ish") {
    val df = one("Hello, world! The answer is 42.")
    val r = df.select(
      Text.whitespaceTokenCount(col("text")).as("ws"),
      Text.bpeTokenCount(col("text")).as("bpe")).head()
    assert(r.getAs[Int]("ws") === 6)
    // hello , world ! the answer is 42 . → 9
    assert(r.getAs[Int]("bpe") === 9)
  }

  test("D11: md5 fingerprint is canonicalization-invariant") {
    val a = one("The  Quick brown FOX!").select(Text.fingerprintMd5(col("text"))).head().getString(0)
    val b = one("the quick brown fox").select(Text.fingerprintMd5(col("text"))).head().getString(0)
    assert(a === b)
  }

  test("D11b: winnowing shares fingerprints for overlapping docs, not disjoint ones") {
    import spark.implicits._
    val common = "a shared long passage about distributed query engines and storage"
    val docs = Seq(
      (1L, s"prefix one $common suffix alpha"),
      (2L, s"totally different start $common other ending"),
      (3L, "unrelated material concerning gardening tips and recipes only")
    ).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](r.fieldIndex("winnow_fps")).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "overlapping docs must share fingerprints")
    assert((fps(1L) & fps(3L)).isEmpty, "disjoint docs must not")
  }

  test("D11b: winnowing handles documents shorter than one window") {
    import spark.implicits._
    val docs = Seq((1L, "tiny")).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs).collect()
    assert(fps.length === 1 &&
      fps.head.getSeq[Long](fps.head.fieldIndex("winnow_fps")).nonEmpty)
  }

  test("D28: hashed-key LM scoring emits the identical NLL table as string mode") {
    // r5 verdict item 6: the production mode shuffles 8-byte xxhash64
    // keys through the two count-table groupBys and their join-backs
    // instead of raw bigram strings; every count — and so the NLL —
    // must be bit-identical (64-bit collisions aside, ~n²/2⁶⁵).
    val docs = graft.Tables.documents(spark, sf)
    val hashed = graft.functions.LmScore.score(docs, hashKeys = true).collect()
    val strings = graft.functions.LmScore.score(docs, hashKeys = false).collect()
    assert(hashed.nonEmpty)
    assert(hashed.toSeq === strings.toSeq,
      "hashed and string key modes must produce the same (doc_id, n_bigrams, nll)")
  }

  test("D21: heavy-hitters sketch returns a true top-k with exact counts") {
    val rows = graft.SparkEntry.queries("text_heavy_hitters")(spark, sf).collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getAs[Boolean]("count_matches")),
      "tracked-item budget >> vocabulary: sketch counts must be exact")
    // every emitted item is a legitimate top-10 member under ties:
    // its exact frequency >= the 10th-highest corpus frequency
    val words = graft.functions.Spread(
      graft.Tables.documents(spark, sf), col("doc_id"))
      .select(explode(Text.words(col("text"))).as("word"))
    val freqs = words.groupBy("word").count()
      .orderBy(desc("count")).collect().map(_.getLong(1))
    val tenth = freqs.take(10).last
    assert(rows.forall(_.getAs[Long]("exact_freq") >= tenth))
  }

  test("D63: a bound phrase out-scores an equally frequent independent pair") {
    import spark.implicits._
    // "neural network" only ever occurs as a unit; "the data" co-occur
    // as often but both words also appear everywhere else
    val filler = (1 to 6).map(i =>
      s"the data of run $i and the cost of the data store $i")
    val phrase = (1 to 6).map(i => s"neural network results for run $i")
    val docs = (filler ++ phrase).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = graft.dedup.PipelineQueries
      .collocations(docs, minC = 5, k = 20).collect()
    val pmi = out.map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Long]("pmi_q")).toMap
    assert(pmi.contains(("neural", "network")), s"pairs: ${pmi.keys}")
    assert(pmi.contains(("the", "data")))
    assert(pmi(("neural", "network")) > pmi(("the", "data")),
      "the bound phrase must carry strictly higher PMI")
    // the top rank carries the bound-phrase PMI (ties like
    // "network results" share the identical unit-pair counts)
    assert(out.head.getAs[Long]("pmi_q") === pmi(("neural", "network")))
  }
}
