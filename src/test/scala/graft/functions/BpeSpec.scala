package graft.functions

import graft.SparkSpec

/** D38 — the distributed BPE training loop must equal a sequential
  * reference implementation rule-for-rule, including the greedy
  * left-to-right self-pair semantics SQL/fold code most easily gets
  * wrong. */
class BpeSpec extends SparkSpec {

  /** Straight-line reference BPE: word-freq map, list-of-symbols state,
    * explicit greedy scan — no Spark, no cleverness. */
  private def referenceBpe(wordFreq: Map[String, Long],
      iters: Int): Seq[Bpe.Rule] = {
    var state: Map[Vector[String], Long] =
      wordFreq.groupMapReduce { case (w, _) => w.toVector.map(_.toString) }(
        _._2)(_ + _)
    val rules = scala.collection.mutable.ArrayBuffer.empty[Bpe.Rule]
    var it = 1
    while (it <= iters) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      if (counts.isEmpty) it = iters + 1
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        rules += Bpe.Rule(it, a, b, a + b, cnt)
        state = state.groupMapReduce { case (syms, _) =>
          // greedy left-to-right merge
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toVector
        }(_._2)(_ + _)
        it += 1
      }
    }
    rules.toSeq
  }

  private def sparkRules(corpus: Seq[String], iters: Int): Seq[Bpe.Rule] = {
    import spark.implicits._
    Bpe.train(Bpe.wordFreqs(corpus.toDF("text")), iters)
  }

  private def refRules(corpus: Seq[String], iters: Int): Seq[Bpe.Rule] = {
    val words = corpus.flatMap(
      _.toLowerCase.replaceAll("[^a-z0-9\\s]", "").trim.split("\\s+"))
      .filter(_.nonEmpty)
    referenceBpe(words.groupMapReduce(identity)(_ => 1L)(_ + _), iters)
  }

  test("distributed rules equal the sequential reference on a mixed corpus") {
    val corpus = Seq(
      "low lower lowest low low",
      "new newer newest new",
      "wide wider widest",
      "low new wide lowest")
    assert(sparkRules(corpus, 6) === refRules(corpus, 6))
  }

  test("self-pair merges are greedy left-to-right, not overlapping") {
    // 'aaaa' must merge to [aa][aa], 'aaa' to [aa][a]; rule 1 is (a,a)
    val corpus = Seq("aaaa aaaa aaa baab")
    val rules = sparkRules(corpus, 3)
    assert(rules === refRules(corpus, 3))
    assert(rules.head.left_sym === "a" && rules.head.right_sym === "a")
    // aaaa contributes 3 (a,a) pairs per occurrence, aaa contributes 2,
    // baab contributes 1: 2*3 + 2 + 1 = 9
    assert(rules.head.pair_count === 9L)
  }

  test("count ties break lexicographically and training stops when exhausted") {
    // 'xy' and 'xz' both appear twice: (x,y) vs (x,z) tie → (x,y) first
    val corpus = Seq("xy xy xz xz")
    val rules = sparkRules(corpus, 10)
    assert(rules === refRules(corpus, 10))
    assert(rules.head.left_sym === "x" && rules.head.right_sym === "y")
    // after merging xy and xz the words are single symbols: no pairs
    // remain, so training stops early instead of looping
    assert(rules.length === 2)
  }

  test("single-char and empty words contribute nothing") {
    val corpus = Seq("a b c a b", "  ", "dd dd")
    val rules = sparkRules(corpus, 2)
    assert(rules === refRules(corpus, 2))
    assert(rules.head.merged === "dd" && rules.head.pair_count === 2L)
    assert(rules.length === 1, "no adjacent pairs left after (d,d)")
  }

  test("D48: encode applies rules greedily and counts subtokens exactly") {
    import spark.implicits._
    // rules: (a,a)→aa then (aa,a)→aaa; "aaaaa" → [aa][aa][a] → [aaa? ]
    // greedy: pass1 "aaaaa"→[aa,aa,a]; pass2 (aa,a): [aa,aa,a]→[aa,aaa]
    val rules = Seq(
      Bpe.Rule(1, "a", "a", "aa", 0L),
      Bpe.Rule(2, "aa", "a", "aaa", 0L))
    val docs = Seq((1L, "aaaaa ab"), (2L, "b aaa")).toDF("doc_id", "text")
    val out = Bpe.encode(docs, rules).orderBy("doc_id").collect()
    val d1 = out(0)
    assert(d1.getAs[Long]("n_words") === 2L)
    // "aaaaa" → [aa, aaa] (2) ; "ab" → [a, b] (2)
    assert(d1.getAs[Long]("n_subtokens") === 4L)
    assert(d1.getAs[String]("tok_prefix") === "aa aaa a b")
    val d2 = out(1)
    // "b" → [b]; "aaa" → [aa, a] → (aa,a) → [aaa]
    assert(d2.getAs[Long]("n_subtokens") === 2L)
    assert(d2.getAs[String]("tok_prefix") === "b aaa")
  }

  test("D48: trained-rule encode is consistent with training token totals") {
    val docs = graft.Tables.documents(spark, sf)
    val rules = Bpe.train(Bpe.wordFreqs(docs), 3)
    val enc = Bpe.encode(docs, rules)
    import org.apache.spark.sql.functions._
    val row = enc.agg(sum("n_words"), sum("n_subtokens")).head()
    val (words, subs) = (row.getLong(0), row.getLong(1))
    val canonWords = docs.select(sum(size(filter(
      split(graft.functions.Text.canonical(col("text")), " "),
      w => length(w) > 0)))).head().getLong(0)
    assert(words === canonWords, "word totals must match the canonical stream")
    assert(subs > words, "multi-char words must yield >1 subtoken on average")
  }
}
