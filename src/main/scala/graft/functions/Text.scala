package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks (SURVEY.md §2.4 D8-D11) as pure,
  * codegen'd column expressions — no UDFs anywhere, so every operator
  * composes into whole-stage codegen and runs at scan speed on 100 TB.
  * All shapes use Spark's higher-order array functions (transform /
  * filter / aggregate) over split text.
  */
object Text {

  /** Canonical form: lowercase, strip non-alphanumerics, collapse
    * whitespace. The base for hashing/fingerprints so trivial
    * formatting differences never defeat dedup. */
  def canonical(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9\\s]", ""), "\\s+", " "))

  def words(c: Column): Column = split(canonical(c), " ")

  /** Word k-shingles: ["a","b","c","d"] with k=3 →
    * ["a b c","b c d"]. Distinct set — shingle multiplicity does not
    * matter for Jaccard.
    *
    * NOTE: prefer [[shingleHashes]] in operator paths — this string
    * form re-evaluates `ws` (the full canonical+split chain) once per
    * shingle, because lambda bodies re-evaluate their free references
    * per element. Kept for debuggability/display. */
  def shingles(c: Column, k: Int): Column = shinglesOnWords(words(c), k)

  /** String-shingle variant over a MATERIALIZED words column — the
    * lambda's free reference is then a plain attribute read per
    * element instead of the whole canonical+split chain (which turns
    * shingle generation quadratic in document length; measured 20.9 →
    * 1.6 s on the D56 entry at sf0.1). */
  def shinglesOnWords(ws: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(size(ws) - k, lit(0))),
      i => array_join(slice(ws, i + 1, lit(k)), " ")))

  /** Hashed word k-shingles: xxhash64-combined hashes of k consecutive
    * words, built with zip_with over k aligned slices of the
    * once-hashed word array — every subexpression appears as a
    * function ARGUMENT (evaluated once per row), never inside a lambda
    * body, so cost is O(words·k) longs with no string building. The
    * hash stands in for the shingle everywhere a set semantics is
    * needed (minhash, Jaccard); collisions at 64 bits are negligible.
    * Expects a materialized words column (see [[words]]). */
  def shingleHashes(wsCol: Column, k: Int): Column = {
    val wordHashes = transform(wsCol, w => xxhash64(w))
    val len = greatest(size(wsCol) - (k - 1), lit(1))
    (2 to k).foldLeft(slice(wordHashes, lit(1), len)) { (acc, j) =>
      zip_with(acc, slice(wordHashes, lit(j), len), (a, b) => xxhash64(a, b))
    }
  }

  /** D10: token counts — whitespace tokens and a BPE-ish regex
    * tokenization (letter runs | digit runs | single punctuation),
    * the standard pre-tokenizer shape. */
  def whitespaceTokenCount(c: Column): Column = size(words(c))
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit(bpePattern), lit(0)))

  /** D8: marker-word language ID. Argmax of stopword-marker hits with
    * a fixed priority tiebreak (en > de > es > fr) — deterministic on
    * any input, including marker-free text. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "y", "las", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  def markerHits(c: Column, markers: Seq[String]): Column =
    markerHitsOnWords(words(c), markers)

  /** Variant over an already-materialized words column — callers that
    * need several marker counts should split once and pass the column,
    * not re-derive words per count. */
  def markerHitsOnWords(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, w => w.isin(markers: _*)))

  def langId(c: Column): Column = langIdOnWords(words(c))

  def langIdOnWords(ws: Column): Column = {
    val hits = langMarkers.map { case (l, m) => l -> markerHitsOnWords(ws, m) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit(langMarkers.head._1)) { case ((l, h), acc) =>
      when(h === best, lit(l)).otherwise(acc)
    }
    // foldRight means earlier languages win ties (en first).
  }

  /** D9: quality-score components + composite. All ratios guarded
    * against empty text; double arithmetic identical to the oracle.
    * The On-variant takes materialized canon/words columns so the
    * regex chain runs once per row regardless of how many components
    * reference it. */
  def qualityComponentsOn(text: Column, canon: Column, ws: Column): Seq[(String, Column)] = {
    val nWords = size(ws)
    val textLen = greatest(length(text), lit(1))
    val punctCount = length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))
    val punctRatio = punctCount.cast("double") / textLen
    val stopRatio = markerHitsOnWords(ws, langMarkers.flatMap(_._2)).cast("double") /
      greatest(nWords, lit(1))
    val meanWordLen = (length(canon) - (nWords - 1)).cast("double") /
      greatest(nWords, lit(1))
    Seq(
      "n_words" -> nWords,
      "punct_ratio" -> punctRatio,
      "stopword_ratio" -> stopRatio,
      "mean_word_len" -> meanWordLen)
  }

  def qualityComponents(c: Column): Seq[(String, Column)] =
    qualityComponentsOn(c, canonical(c), words(c))

  def qualityScoreOn(comp: Map[String, Column]): Column = {
    val score =
      lit(0.3) * least(lit(1.0), comp("n_words").cast("double") / 100.0) +
        lit(0.3) * (lit(1.0) - comp("punct_ratio")) +
        lit(0.2) * least(lit(1.0), comp("stopword_ratio") * 5.0) +
        lit(0.2) * least(lit(1.0), comp("mean_word_len") / 8.0)
    // floor(x*1e6+0.5)/1e6 instead of ROUND(x,6): both engines compute
    // the identical double, and floor of it is engine-independent —
    // ROUND differs (half-up vs half-even) exactly when the score lands
    // on a .5 ulp boundary, which weighted sums of small rationals do.
    floor(score * 1e6 + 0.5) / 1e6
  }

  def qualityScore(c: Column): Column =
    qualityScoreOn(qualityComponents(c).toMap)

  /** D11a: exact content fingerprint — md5 of the canonical form. */
  def fingerprintMd5(c: Column): Column = md5(canonical(c))

  /** k-gram rolling hashes of the canonical text, as an array column.
    * The canonical form is expected to be a materialized column (not an
    * inline expression) — lambda bodies re-evaluate their free
    * references per element, so an inline regex chain here would run
    * once per gram. */
  def gramHashes(canonCol: Column, k: Int): Column = {
    val n = greatest(length(canonCol) - (k - 1), lit(1))
    transform(sequence(lit(1), n), i => xxhash64(canonCol.substr(i, lit(k))))
  }

  /** Cross-engine-mirrorable char-gram hashes: md5 hex strings instead
    * of xxhash64 longs. Slower (string building + hex), but DuckDB
    * computes the identical values, so winnowing GEOMETRY over these
    * grams is fully oracle-gatable; the production path stays
    * [[gramHashes]]. */
  def gramMd5s(canonCol: Column, k: Int): Column = {
    val n = greatest(length(canonCol) - (k - 1), lit(1))
    transform(sequence(lit(1), n), i => md5(canonCol.substr(i, lit(k))))
  }
}
