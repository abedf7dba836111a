package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R53 / D53 — scalable global enumeration + balanced training-shard
  * packing.
  *
  * The naive global `row_number() OVER (ORDER BY ...)` plans an
  * `Exchange SinglePartition`: every row of the table flows through ONE
  * task — the canonical 100 TB scale trap (RanksSpec proves the naive
  * shape really does plan that, and that this one does not). The
  * scalable form is the classic two-pass rank:
  *
  *   1. `repartitionByRange` on the TOTAL sort key (range exchange,
  *      sampled boundaries — deterministic for a fixed input layout);
  *   2. count rows per range partition — an O(#partitions) driver
  *      materialization (the documented bounded-collect class, SURVEY
  *      §5), NOT a data collect;
  *   3. broadcast the cumulative offsets back and add a
  *      partition-local `row_number` keyed on the partition id.
  *
  * No task ever sees more than one range slice. The sort key must be
  * total (tie-broken to a unique key) so ranks are well-defined
  * independently of where sampled range boundaries fall.
  *
  * On top of the rank, `q_shard_assign` packs documents into
  * [[NumShards]] training shards balanced by token count via snake
  * (boustrophedon) assignment — sort by size desc, deal passes
  * alternating left-to-right and right-to-left, the standard greedy
  * guarantee that per-shard totals differ by at most one document's
  * tokens per pass. Token-balanced shards are what keeps a
  * data-parallel training job free of stragglers; hash-mod sharding
  * balances row COUNTS only.
  */
object Ranks {

  val NumShards = 8

  /** Global 1-based row_number over `sort` (must be a total order)
    * without a single-partition exchange.
    *
    * The ranged table is MATERIALIZED (localCheckpoint) before the
    * offset collect: RangePartitioner samples its boundaries with a
    * per-execution seed, so without pinning, the offsets action and
    * the downstream action can land rows in different partitions —
    * per-partition counts then disagree with the offsets and ranks
    * silently duplicate/skip at partition seams. On a cluster, swap
    * localCheckpoint for a reliable checkpoint dir (executor-loss
    * safety), exactly as `dedup/Clusters` parameterizes it. */
  def globalRowNumber(df: DataFrame, sort: Seq[Column], npart: Int,
      rankCol: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val ranged = df.repartitionByRange(npart, sort: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // O(#partitions) rows to the driver — bounded by construction
    val counts = ranged.groupBy("_pid").agg(count(lit(1)).as("_n"))
      .orderBy("_pid").collect()
    var acc = 0L
    val offsets = counts.map { r =>
      val o = (r.getInt(0), acc); acc += r.getLong(1); o
    }.toSeq
    val offs = broadcast(offsets.toDF("_pid", "_off"))
    ranged.join(offs, "_pid")
      .withColumn(rankCol,
        row_number().over(Window.partitionBy("_pid").orderBy(sort: _*))
          .cast("long") + col("_off"))
      .drop("_pid", "_off")
  }

  /** Global running sum of `value` over the total order `sort`, same
    * two-pass shape as [[globalRowNumber]]: range exchange, per-range
    * partial SUMS to the driver (O(#partitions)), broadcast cumulative
    * offsets, pid-local running-sum window. The default RANGE frame is
    * safe because the sort key is total — no two rows tie. */
  def globalPrefixSum(df: DataFrame, sort: Seq[Column], value: Column,
      npart: Int, cumCol: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val ranged = df.repartitionByRange(npart, sort: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // pin boundaries — see globalRowNumber
    val sums = ranged.groupBy("_pid").agg(sum(value).as("_s"))
      .orderBy("_pid").collect()
    var acc = 0L
    val offsets = sums.map { r =>
      val o = (r.getInt(0), acc); acc += r.getLong(1); o
    }.toSeq
    val offs = broadcast(offsets.toDF("_pid", "_off"))
    ranged.join(offs, "_pid")
      .withColumn(cumCol,
        sum(value).over(Window.partitionBy("_pid").orderBy(sort: _*))
          + col("_off"))
      .drop("_pid", "_off")
  }

  /** Snake assignment of 1-based rank r into n shards. Column `/` is
    * double division, so the pass index goes through floor (exact for
    * any realistic rank — doubles are integer-exact below 2^53). */
  private def snakeShard(rank: Column, n: Int): Column = {
    val r0 = rank - 1
    val pass = floor(r0 / n).cast("long")
    when(pass % 2 === 0, r0 % n).otherwise(lit(n - 1) - r0 % n)
  }

  /** Documents ranked by token count desc (doc_id tiebreak), exposed
    * for the spec's rank-parity and plan asserts. */
  def rankedDocs(s: SparkSession, d: String): DataFrame =
    globalRowNumber(
      Tables.documents(s, d).select(col("doc_id"),
        graft.functions.Text.whitespaceTokenCount(col("text")).as("tok")),
      Seq(col("tok").desc, col("doc_id")), 32, "rnk")

  val qShardAssign = QueryDef(
    "q_shard_assign",
    (s, d) =>
      rankedDocs(s, d)
        .withColumn("shard", snakeShard(col("rnk"), NumShards))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok").cast("long")).as("token_sum"))
        .orderBy("shard"),
    Some(s"""WITH t AS (
               SELECT doc_id,
                      CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), ' ')) AS BIGINT) AS tok
               FROM documents),
             r AS (
               SELECT tok,
                      row_number() OVER (ORDER BY tok DESC, doc_id) AS rnk
               FROM t),
             a AS (
               SELECT tok,
                      CASE WHEN ((rnk - 1) // ${NumShards}) % 2 = 0
                           THEN (rnk - 1) % ${NumShards}
                           ELSE ${NumShards - 1} - ((rnk - 1) % ${NumShards})
                      END AS shard
               FROM r)
             SELECT CAST(shard AS BIGINT) AS shard,
                    CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(tok) AS BIGINT) AS token_sum
             FROM a GROUP BY shard ORDER BY shard"""))

  /** D54 — deterministic per-group k-sample: rank by a content hash
    * within each group and keep the first [[SampleK]]. Unlike D14's
    * Bernoulli rate filter (expected counts), this yields EXACTLY
    * min(k, |group|) rows per group, reproducibly — the "cap every
    * source at k examples" curation op. Scale: the rank filter plans a
    * WindowGroupLimit (spec-asserted), so each map task pre-prunes to
    * its local top-k per group BEFORE the window exchange — shuffle
    * traffic is O(groups × k) per task, not the corpus. */
  val SampleK = 20

  val qGroupSample = QueryDef(
    "q_group_sample",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          md5(col("doc_id").cast("string")).as("h"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("lang").orderBy("h", "doc_id")))
        .filter(col("rn") <= SampleK)
        .select("lang", "rn", "doc_id")
        .orderBy("lang", "rn"),
    Some(s"""WITH h AS (SELECT doc_id, lang,
                          md5(CAST(doc_id AS VARCHAR)) AS h
                        FROM documents),
             r AS (SELECT lang, doc_id,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY h, doc_id) AS rn
                   FROM h)
             SELECT lang, CAST(rn AS INT) AS rn, doc_id
             FROM r WHERE rn <= $SampleK ORDER BY lang, rn"""))

  /** D55 — token-budget data selection: take documents in quality
    * order (best first) until a token budget fills — THE data-mixing
    * primitive ("train on the best 25% of this source"). The greedy
    * prefix needs a GLOBAL running token sum over the quality order;
    * the naive window is the same single-partition funnel R53 exists
    * to kill, so this rides [[globalPrefixSum]]. The budget (25% of
    * corpus tokens) and the D9 quality key are both deterministic; the
    * only driver materializations are the 1-row token total and the
    * O(#partitions) offsets. */
  val BudgetFraction = 0.25

  val qBudgetSelect = QueryDef(
    "q_budget_select",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        graft.functions.Text.qualityScore(col("text")).as("quality"),
        graft.functions.Text.whitespaceTokenCount(col("text"))
          .cast("long").as("tok"))
        // two consumers (the budget total + the ranked pass): cached,
        // the canonicalize+split quality projection runs once per run
        .cache()
      val total = docs.agg(sum("tok")).head().getLong(0)
      val budget = math.floor(BudgetFraction * total).toLong
      globalPrefixSum(docs, Seq(col("quality").desc, col("doc_id")),
          col("tok"), 32, "cum_tok")
        .filter(col("cum_tok") <= budget)
        .select("doc_id", "quality", "tok", "cum_tok")
        .orderBy("doc_id")
    },
    Some(s"""WITH c AS (SELECT doc_id, text,
                          ${graft.dedup.PipelineQueries.oCanon} AS canon
                        FROM documents),
             m AS (SELECT doc_id, text, canon,
                     len(string_split(canon, ' ')) AS n_words,
                     greatest(length(text), 1) AS text_len
                   FROM c),
             q AS (SELECT doc_id,
                     ${graft.dedup.PipelineQueries.oQualityExpr} AS quality,
                     CAST(n_words AS BIGINT) AS tok
                   FROM m),
             r AS (SELECT doc_id, quality, tok,
                     CAST(sum(tok) OVER (ORDER BY quality DESC, doc_id)
                       AS BIGINT) AS cum_tok
                   FROM q),
             b AS (SELECT CAST(floor($BudgetFraction * sum(tok)) AS BIGINT)
                     AS budget FROM q)
             SELECT doc_id, quality, tok, cum_tok
             FROM r, b WHERE cum_tok <= budget ORDER BY doc_id"""))

  /** D58 — length-bucketed batch packing: fixed-size micro-batches of
    * length-SORTED documents vs arrival-order batching, with the
    * padding bill of each. A batch pads every member to its max
    * length, so batching similar lengths together is the standard
    * serving/training trick — this entry MEASURES it (total padding
    * tokens + ratio per method) rather than asserting it. Sorting
    * rides [[globalRowNumber]] (no single-partition funnel); the
    * contrast leg batches by arrival id. One summary row per method —
    * the operator a batch scheduler calls to justify its sort. */
  val BatchSize = 64

  val qLengthBatches = QueryDef(
    "q_length_batches",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        graft.functions.Text.whitespaceTokenCount(col("text"))
          .cast("long").as("tok"))
        // three consumers (count + sorted leg + arrival leg): cached,
        // the canonicalize+split token count runs once per run
        .cache()
      val nBatches = math.ceil(docs.count().toDouble / BatchSize).toLong
      val sorted = globalRowNumber(docs, Seq(col("tok"), col("doc_id")),
          32, "rnk")
        .withColumn("b", floor((col("rnk") - 1) / BatchSize).cast("long"))
      val arrival = docs.withColumn("b", col("doc_id") % nBatches)
      def summarize(leg: DataFrame, method: String) =
        leg.groupBy("b")
          .agg(count(lit(1)).as("n"), max("tok").as("mx"),
            sum("tok").as("sm"))
          .agg(count(lit(1)).as("n_batches"),
            sum(col("sm")).as("total_tokens"),
            sum(col("n") * col("mx") - col("sm")).as("total_padding"))
          .select(lit(method).as("method"), col("n_batches"),
            col("total_tokens"), col("total_padding"))
      summarize(arrival, "arrival").unionByName(summarize(sorted, "sorted"))
        .withColumn("padding_ratio_q",
          floor(col("total_padding").cast("double")
            / (col("total_padding") + col("total_tokens")) * 1e6) / 1e6)
        .orderBy("method")
    },
    Some(s"""WITH t AS (SELECT doc_id,
                          CAST(len(string_split(${graft.dedup.PipelineQueries.oCanon}, ' ')) AS BIGINT) AS tok
                        FROM documents),
             nb AS (SELECT CAST(ceil(CAST(count(*) AS DOUBLE) / $BatchSize)
                      AS BIGINT) AS n FROM t),
             sl AS (SELECT tok, CAST(floor(CAST(row_number() OVER (ORDER BY tok, doc_id) - 1 AS DOUBLE) / $BatchSize) AS BIGINT) AS b FROM t),
             al AS (SELECT tok, doc_id % (SELECT n FROM nb) AS b FROM t),
             sb AS (SELECT b, count(*) AS n, max(tok) AS mx, sum(tok) AS sm
                    FROM sl GROUP BY b),
             ab AS (SELECT b, count(*) AS n, max(tok) AS mx, sum(tok) AS sm
                    FROM al GROUP BY b),
             u AS (SELECT 'arrival' AS method,
                     CAST(count(*) AS BIGINT) AS n_batches,
                     CAST(sum(sm) AS BIGINT) AS total_tokens,
                     CAST(sum(n * mx - sm) AS BIGINT) AS total_padding
                   FROM ab
                   UNION ALL
                   SELECT 'sorted', CAST(count(*) AS BIGINT),
                     CAST(sum(sm) AS BIGINT), CAST(sum(n * mx - sm) AS BIGINT)
                   FROM sb)
             SELECT method, n_batches, total_tokens, total_padding,
                    floor(CAST(total_padding AS DOUBLE)
                      / (total_padding + total_tokens) * 1e6) / 1e6
                      AS padding_ratio_q
             FROM u ORDER BY method"""))

  /** R65 — decile lift / gains table: rank the corpus by a score,
    * split into equal-count deciles (R57's rank arithmetic on the R53
    * two-pass rank — no funnel), and report per-decile response rate,
    * lift over the base rate, and cumulative gains — the
    * model-evaluation readout behind "the top 10% by score captures
    * X% of positives". Here: does the D9 quality score predict
    * English-labeled docs (the outcome D64 measures directly)?
    * Everything after the rank is a 10-row frame — the cum/total
    * windows are O(deciles). */
  val qDecileLift = QueryDef(
    "q_decile_lift",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        graft.functions.Text.qualityScore(col("text")).as("score"),
        (col("lang") === "en").as("pos"))
      val ranked = globalRowNumber(docs,
        Seq(col("score").desc, col("doc_id")), 32, "rn")
      val nRow = docs.agg(count(lit(1)).as("n_total"))
      val per = ranked.crossJoin(broadcast(nRow))
        .withColumn("decile", expr("cast(((rn - 1) * 10) div n_total as int)"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
      val wCum = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      per
        .withColumn("cum_pos", sum("n_pos").over(wCum))
        .withColumn("tot_pos", sum("n_pos").over(wAll))
        .withColumn("tot_n", sum("n").over(wAll))
        .select(col("decile"), col("n"), col("n_pos"),
          floor(col("n_pos") * lit(1e6) / col("n")).cast("long").as("rate_q"),
          floor((col("n_pos").cast("double") / col("n")) /
            (col("tot_pos").cast("double") / col("tot_n")) * 1e6)
            .cast("long").as("lift_q"),
          floor(col("cum_pos") * lit(1e6) / col("tot_pos")).cast("long")
            .as("cum_gain_q"))
        .orderBy("decile")
    },
    Some(s"""WITH c AS (SELECT doc_id, lang, text,
                          ${graft.dedup.PipelineQueries.oCanon} AS canon
                        FROM documents),
             m AS (SELECT doc_id, lang, text, canon,
                     len(string_split(canon, ' ')) AS n_words,
                     greatest(length(text), 1) AS text_len
                   FROM c),
             q AS (SELECT doc_id, lang = 'en' AS pos,
                     ${graft.dedup.PipelineQueries.oQualityExpr} AS score
                   FROM m),
             r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id)
                     AS rn,
                     (SELECT count(*) FROM documents) AS n_total
                   FROM q),
             per AS (SELECT CAST(((rn - 1) * 10) // n_total AS INT) AS decile,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_pos
                     FROM r GROUP BY 1),
             w AS (SELECT *,
                     SUM(n_pos) OVER (ORDER BY decile
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_pos,
                     SUM(n_pos) OVER () AS tot_pos,
                     SUM(n) OVER () AS tot_n
                   FROM per)
             SELECT decile, n, n_pos,
                    CAST(floor(n_pos * 1e6 / n) AS BIGINT) AS rate_q,
                    CAST(floor((CAST(n_pos AS DOUBLE) / n)
                      / (CAST(tot_pos AS DOUBLE) / tot_n) * 1e6) AS BIGINT)
                      AS lift_q,
                    CAST(floor(cum_pos * 1e6 / tot_pos) AS BIGINT)
                      AS cum_gain_q
             FROM w ORDER BY decile"""))

  /** R153 — quantile normalization across sources (the genomics
    * batch-effect correction, applied to corpus mixing): each source's
    * token-count distribution maps onto the POOLED distribution by
    * fractional rank — source s's rank-rk value becomes the pooled
    * value at the same quantile — so per-source length distributions
    * align exactly while each document keeps its within-source order
    * (the read behind "source B's docs are long only because B is
    * measured differently"). Midpoint quantile q = (2·rk−1)/(2·n_s),
    * pooled target rank = ceil(q·N) — all BIGINT
    * (`((2rk−1)·N + 2n_s − 1) div (2n_s)`), so the mapping is
    * hash-exact. The pooled order is the R53 two-pass global rank
    * (range exchange + broadcast offsets — no SinglePartition funnel);
    * the per-source ranks are ordinary partitioned windows. The DuckDB
    * oracle computes the SAME mapping with a naive global row_number —
    * the two-formulation equivalence is itself what the gate verifies
    * (the R53/D65 discipline). */
  val qQuantileNormalize = QueryDef(
    "q_quantile_normalize",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
        graft.functions.Text.whitespaceTokenCount(col("text")).cast("long").as("tok"))
      val pooled = globalRowNumber(docs, Seq(col("tok"), col("doc_id")), 32, "grank")
        .select(col("grank"), col("tok").as("norm_tok"))
      val wSrc = Window.partitionBy("source")
      val ranked = docs
        .withColumn("rk",
          row_number().over(wSrc.orderBy(col("tok"), col("doc_id"))).cast("long"))
        .withColumn("n_s", count(lit(1)).over(wSrc))
      val nAll = docs.agg(count(lit(1)).as("n_total"))
      ranked.crossJoin(broadcast(nAll))
        .withColumn("target_rank",
          expr("((2*rk - 1) * n_total + 2*n_s - 1) div (2*n_s)"))
        .join(pooled, col("target_rank") === pooled("grank"))
        .select(col("doc_id"), col("source"), col("tok"), col("rk"),
          col("target_rank"), col("norm_tok"))
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (
               SELECT doc_id, source,
                      CAST(len(string_split(${graft.dedup.PipelineQueries.oCanon}, ' ')) AS BIGINT) AS tok
               FROM documents),
             pooled AS (SELECT CAST(row_number() OVER (ORDER BY tok, doc_id) AS BIGINT) AS grank,
                               tok AS norm_tok
                        FROM t),
             r AS (SELECT doc_id, source, tok,
                     CAST(row_number() OVER (PARTITION BY source
                                             ORDER BY tok, doc_id) AS BIGINT) AS rk,
                     CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s,
                     CAST(count(*) OVER () AS BIGINT) AS n_total
                   FROM t),
             m AS (SELECT *,
                     ((2*rk - 1) * n_total + 2*n_s - 1) // (2*n_s) AS target_rank
                   FROM r)
             SELECT m.doc_id, m.source, m.tok, m.rk,
                    CAST(m.target_rank AS BIGINT) AS target_rank,
                    pooled.norm_tok
             FROM m JOIN pooled ON m.target_rank = pooled.grank
             ORDER BY m.doc_id"""))

  /** D110 — mixture-uniform curriculum interleaving: a deterministic
    * total training order in which EVERY PREFIX carries (within ±1 per
    * stratum) the corpus's stratum mixture — the data-ordering
    * guarantee behind "the model never sees a 10M-doc run of one
    * source" (a plain hash shuffle only gives the mixture in
    * expectation; a sorted-by-source layout maximally violates it).
    * Each stratum's documents first get a deterministic within-stratum
    * shuffle order (md5 hash rank — the D54 convention), then map to
    * the global slot key ((2r−1)·N) div (2n_s) — stratum s's docs form
    * an arithmetic progression of stride N/n_s through the schedule,
    * which is exactly what makes prefix counts track shares with
    * bounded error. The final total order is the R53 two-pass rank on
    * (slot, stratum, doc) — no SinglePartition funnel.
    *
    * All integer arithmetic; the oracle mirrors both windows and the
    * slot mapping (the R153 midpoint-rank algebra, repurposed from
    * value mapping to schedule construction). */
  val qCurriculumInterleave = QueryDef(
    "q_curriculum_interleave",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val wStr = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      val nAll = docs.agg(count(lit(1)).as("n_total"))
      val slotted = docs
        .withColumn("r_s", row_number().over(wStr).cast("long"))
        .withColumn("n_s", count(lit(1)).over(Window.partitionBy("lang")))
        .crossJoin(broadcast(nAll))
        .withColumn("slot", expr("((2*r_s - 1) * n_total) div (2*n_s)"))
      globalRowNumber(slotted, Seq(col("slot"), col("lang"), col("doc_id")),
        32, "train_pos")
        .select(col("doc_id"), col("lang"), col("r_s"), col("slot"),
          col("train_pos"))
        .orderBy("doc_id")
    },
    Some("""WITH docs AS (SELECT doc_id, lang FROM documents),
            r AS (SELECT doc_id, lang,
                    CAST(row_number() OVER (PARTITION BY lang
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                      AS BIGINT) AS r_s,
                    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_s,
                    CAST(count(*) OVER () AS BIGINT) AS n_total
                  FROM docs),
            sl AS (SELECT *, ((2*r_s - 1) * n_total) // (2*n_s) AS slot
                   FROM r)
            SELECT doc_id, lang, r_s, CAST(slot AS BIGINT) AS slot,
                   CAST(row_number() OVER (ORDER BY slot, lang, doc_id)
                     AS BIGINT) AS train_pos
            FROM sl ORDER BY doc_id"""))

  val all: Seq[QueryDef] =
    Seq(qShardAssign, qGroupSample, qBudgetSelect, qLengthBatches,
      qDecileLift, qQuantileNormalize, qCurriculumInterleave)
}
