package graft.dedup

import graft.{QueryDef, Tables}
import graft.functions.{Spread, Text}
import org.apache.spark.sql.functions._

/** D93 — paragraph-level (segment-level) exact dedup with document
  * reassembly: the RefinedWeb / Dolma / CCNet curation pass that
  * whole-document dedup (D1) and pair dedup (D2-D5) both miss — a
  * boilerplate passage (header, license block, nav chrome) repeated
  * across thousands of otherwise-distinct pages survives every
  * document-granular pass, but falls out here because dedup runs at
  * the SEGMENT level: each document splits into fixed word windows,
  * the globally FIRST occurrence of each distinct segment survives
  * (by (doc_id, seg_idx) — deterministic), later copies are removed
  * from their documents, and each document reassembles from its
  * surviving segments in order.
  *
  * The corpus text carries no newlines, so "paragraph" is a
  * deterministic fixed-width word window (disjoint 10-word tiles —
  * the segmentation D42 uses with stride == window). Real deployments
  * swap the splitter for '\n\n' paragraphs with no shape change.
  *
  * Scale design (100 TB): the keeper decision is a MIN aggregation
  * per segment hash — `min(struct(doc_id, seg_idx))` is partially
  * aggregable, so a boilerplate segment occurring 100M times reduces
  * map-side instead of funneling one hot hash group through a single
  * window task (the D2 bucket-cap concern solved by algebra instead
  * of a valve). Cost: one hash-keyed aggregation + one join-back on
  * the same key (exchange reuse) + one doc-keyed reassembly
  * aggregation — all linear in corpus tokens. Per-doc collect_list is
  * bounded by document length (the sessionize/pack valve class).
  */
object ParagraphDedup {

  private val Seg = 10

  val textParagraphDedup = QueryDef(
    "text_paragraph_dedup",
    (s, d) => {
      val docs = Spread(Tables.documents(s, d), col("doc_id"))
        .select(col("doc_id"), Text.words(col("text")).as("ws"))
      // canonical text is never empty on this corpus (split("") = [""]
      // has size 1), so n_segs = 1 + (len-1) div Seg is always >= 1 and
      // the sequence() below never sees stop < start
      val segRows = docs
        .withColumn("n_segs",
          lit(1L) + floor((size(col("ws")).cast("long") - 1) / Seg).cast("long"))
        .select(col("doc_id"), col("ws"),
          explode(sequence(lit(0L), col("n_segs") - 1)).as("si"))
        .select(col("doc_id"), col("si").cast("int").as("seg_idx"),
          array_join(slice(col("ws"), (col("si") * Seg + 1).cast("int"), lit(Seg)), " ")
            .as("seg"))
        .withColumn("h", md5(col("seg").cast("binary")))
        // both consumers (keeper agg + join-back) need hash partitioning
        // on h; an explicit repartition makes the two subtrees
        // sameResult so ReuseExchange computes the explode+md5 ONCE
        // (the Decontaminate.flagged pattern)
        .repartition(col("h"))
      // skew-safe first-occurrence: partial-aggregable min, not a window.
      // `seg` rides INSIDE the min-struct: (doc_id, seg_idx) is unique so
      // the extra field never changes the argmin, but Catalyst cannot
      // decompose a struct ordering, so `seg` stays in this branch's
      // pruned schema — both exchange consumers now read IDENTICAL
      // columns and ReuseExchange collapses them to one
      // scan+explode+md5 execution (the Decontaminate.flagged
      // same-schema discipline)
      val firsts = segRows.groupBy("h")
        .agg(min(struct(col("doc_id"), col("seg_idx"), col("seg"))).as("first"))
      val flagged = segRows.join(firsts, "h")
        .withColumn("keep",
          col("first.doc_id") === col("doc_id") &&
            col("first.seg_idx") === col("seg_idx"))
      flagged.groupBy("doc_id").agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        md5(coalesce(
          array_join(
            transform(
              array_sort(collect_list(when(col("keep"),
                struct(col("seg_idx"), col("seg"))))),
              x => x("seg")),
            " "),
          lit("")).cast("binary")).as("rebuilt_hash"))
        .withColumn("changed", col("n_kept") < col("n_segs"))
        .orderBy("doc_id")
    },
    Some(s"""WITH w AS (SELECT doc_id, string_split(${PipelineQueries.oCanon}, ' ') AS ws
                        FROM documents),
             n AS (SELECT doc_id, ws, 1 + (len(ws) - 1) // ${Seg} AS n_segs FROM w),
             segs AS (SELECT doc_id, CAST(si AS INTEGER) AS seg_idx,
                        array_to_string(ws[si*${Seg}+1 : si*${Seg}+${Seg}], ' ') AS seg
                      FROM n, UNNEST(generate_series(0, n_segs - 1)) AS t(si)),
             k AS (SELECT doc_id, seg_idx, seg,
                     row_number() OVER (PARTITION BY md5(seg)
                                        ORDER BY doc_id, seg_idx) = 1 AS keep
                   FROM segs)
             SELECT doc_id,
                    CAST(count(*) AS BIGINT) AS n_segs,
                    CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
                    md5(COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
                                   FILTER (WHERE keep), '')) AS rebuilt_hash,
                    count(*) FILTER (WHERE keep) < count(*) AS changed
             FROM k GROUP BY doc_id ORDER BY doc_id"""))

  /** D96 — boilerplate-segment strip by DOCUMENT FREQUENCY: a segment
    * occurring in ≥ df-threshold DISTINCT documents is boilerplate
    * (header/license/chrome) and strips from EVERY document — including
    * the first (D93 keeps the first occurrence: right for content
    * dedup, wrong for chrome — nobody wants one surviving cookie
    * banner). The Dolma/CCNet line-frequency cleaning pass, and the
    * per-segment analogue of D75's novelty read.
    *
    * Scale: df = one distinct + one count aggregation on the segment
    * hash (both partial-aggregable — same skew argument as D93), the
    * flag joins back on the same key, reassembly is the D93 doc-keyed
    * aggregation. The threshold is a count, not a fraction, so the
    * operator never needs a corpus-size broadcast.
    */
  val textBoilerplateStrip = QueryDef(
    "text_boilerplate_strip",
    (s, d) => {
      val DfCut = 2 // ≥ 2 distinct docs ⇒ boilerplate on this corpus
      val docs = Spread(Tables.documents(s, d), col("doc_id"))
        .select(col("doc_id"), Text.words(col("text")).as("ws"))
      val segRows = docs
        .withColumn("n_segs",
          lit(1L) + floor((size(col("ws")).cast("long") - 1) / Seg).cast("long"))
        .select(col("doc_id"), col("ws"),
          explode(sequence(lit(0L), col("n_segs") - 1)).as("si"))
        .select(col("doc_id"), col("si").cast("int").as("seg_idx"),
          array_join(slice(col("ws"), (col("si") * Seg + 1).cast("int"), lit(Seg)), " ")
            .as("seg"))
        .withColumn("h", md5(col("seg").cast("binary")))
        .repartition(col("h")) // shared exchange for df + join-back (D93 note)
      // document frequency per segment: distinct (h, doc) first, then a
      // plain count — both reduce map-side (no countDistinct expand)
      val df = segRows.select("h", "doc_id").distinct()
        .groupBy("h").agg(count(lit(1)).as("df"))
      val flagged = segRows.join(df, "h")
        .withColumn("keep", col("df") < DfCut)
      flagged.groupBy("doc_id").agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        md5(coalesce(
          array_join(
            transform(
              array_sort(collect_list(when(col("keep"),
                struct(col("seg_idx"), col("seg"))))),
              x => x("seg")),
            " "),
          lit("")).cast("binary")).as("rebuilt_hash"))
        .withColumn("changed", col("n_kept") < col("n_segs"))
        .orderBy("doc_id")
    },
    Some(s"""WITH w AS (SELECT doc_id, string_split(${PipelineQueries.oCanon}, ' ') AS ws
                        FROM documents),
             n AS (SELECT doc_id, ws, 1 + (len(ws) - 1) // ${Seg} AS n_segs FROM w),
             segs AS (SELECT doc_id, CAST(si AS INTEGER) AS seg_idx,
                        array_to_string(ws[si*${Seg}+1 : si*${Seg}+${Seg}], ' ') AS seg
                      FROM n, UNNEST(generate_series(0, n_segs - 1)) AS t(si)),
             df AS (SELECT md5(seg) AS h, count(DISTINCT doc_id) AS df
                    FROM segs GROUP BY 1),
             k AS (SELECT doc_id, seg_idx, seg, df.df < 2 AS keep
                   FROM segs JOIN df ON md5(seg) = df.h)
             SELECT doc_id,
                    CAST(count(*) AS BIGINT) AS n_segs,
                    CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
                    md5(COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
                                   FILTER (WHERE keep), '')) AS rebuilt_hash,
                    count(*) FILTER (WHERE keep) < count(*) AS changed
             FROM k GROUP BY doc_id ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(textParagraphDedup, textBoilerplateStrip)
}
