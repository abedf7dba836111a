package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** L1 — plan linter: SURVEY §5's scale rules as an executable check
  * instead of reviewer folklore. Walks a query's physical plan and
  * reports the anti-patterns that are survivable at sf0.1 and fatal
  * at 100 TB:
  *
  *   - `cartesian-product`: CartesianProductExec anywhere;
  *   - `nested-loop-join`: BroadcastNestedLoopJoinExec — legitimate
  *     ONLY for the sanctioned 1-row stats broadcasts / bounded eval
  *     scans, so it reports and the caller allowlists;
  *   - `single-partition-exchange`: an Exchange with SinglePartition
  *     whose input is not an aggregate — the global-window funnel
  *     trap (R53's reason to exist). Only GLOBAL aggregates (empty
  *     grouping — a bounded 1-row-per-task reduction) are the benign
  *     exempt class; a grouped aggregate emits one row per group and
  *     is flagged separately as `grouped-agg-funnel` so callers with
  *     provably bounded key cardinality allowlist it deliberately.
  *   - `global-window`: a WindowExec directly over a SinglePartition
  *     exchange — the naive global row_number/running-sum shape.
  *
  * Use in tests and pre-deploy checks: `Lint.check(df)` returns the
  * findings; `Lint.assertClean(df, allow)` throws on anything not
  * allowlisted. This is the tool form of the RelationalSpec
  * plan-guard test, available to library users for THEIR queries.
  */
object Lint {

  final case class Finding(kind: String, node: String)

  private def collect(p: SparkPlan): Seq[Finding] = {
    val self = p match {
      case _: CartesianProductExec =>
        Seq(Finding("cartesian-product", p.nodeName))
      case _: BroadcastNestedLoopJoinExec =>
        Seq(Finding("nested-loop-join", p.nodeName))
      case e: ShuffleExchangeExec if e.outputPartitioning.numPartitions == 1 =>
        aggBelow(e.child) match {
          case Some(g) if g.isEmpty =>
            Seq.empty // global aggregate: bounded 1-row-per-task funnel
          case Some(_) =>
            // a GROUPED aggregate emits one row per group — bounded
            // only if the caller knows the key cardinality is, so it
            // is flagged under its own kind for deliberate allowlisting
            Seq(Finding("grouped-agg-funnel", e.child.nodeName))
          case None =>
            Seq(Finding("single-partition-exchange", e.child.nodeName))
        }
      case w: WindowExec
          if w.partitionSpec.isEmpty =>
        Seq(Finding("global-window", w.nodeName))
      case _ => Seq.empty
    }
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => p.children
    }
    self ++ children.flatMap(collect) ++
      p.subqueries.flatMap(collect)
  }

  /** All scale-risk findings in the query's physical plan. */
  def check(df: DataFrame): Seq[Finding] =
    collect(df.queryExecution.executedPlan).distinct

  /** Throw unless every finding's kind is allowlisted — the CI gate
    * form. */
  def assertClean(df: DataFrame, allow: Set[String] = Set.empty): Unit = {
    val bad = check(df).filterNot(f => allow.contains(f.kind))
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "plan lint: " + bad.map(f => s"${f.kind} at ${f.node}").mkString("; "))
  }

  /** L3 — join-strategy advisor: for every join in the OPTIMIZED
    * logical plan, both sides' size estimates from optimizer
    * statistics, the broadcast threshold, and what the stats suggest —
    * the "why didn't my join broadcast" debugging read as data
    * instead of a plan-string safari. Each row carries the join type,
    * per-side estimated bytes, whether either side clears the
    * configured `autoBroadcastJoinThreshold`, and the advice
    * (`broadcast-left`/`broadcast-right`/`shuffle-both`). The advisor
    * reads LOGICAL stats — the same inputs the planner uses — so it
    * predicts rather than post-hoc-describes; compare with the
    * executed plan to find estimate drift. Driver-side metadata only:
    * no job runs. */
  final case class JoinAdvice(joinType: String, leftBytes: BigInt,
      rightBytes: BigInt, thresholdBytes: Long, advice: String)

  def adviseJoins(df: DataFrame): Seq[JoinAdvice] = {
    val threshold = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val plan = df.queryExecution.optimizedPlan
    plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        val lb = j.left.stats.sizeInBytes
        val rb = j.right.stats.sizeInBytes
        val advice =
          if (threshold <= 0) "shuffle-both (broadcast disabled)"
          else if (rb <= threshold) "broadcast-right"
          else if (lb <= threshold) "broadcast-left"
          else "shuffle-both"
        JoinAdvice(j.joinType.toString, lb, rb, threshold, advice)
    }
  }

  /** L4 — optimized-plan FINGERPRINT: a stable hash of the query's
    * canonicalized optimized logical plan. Two queries get the same
    * fingerprint iff Catalyst considers them the same computation
    * (expression ids and alias NAMES are normalized away; literals,
    * operators and shapes are not) — so a stored fingerprint per
    * production query turns "did the upgrade / refactor / stats change
    * silently alter my plan" into a diffable regression check, the
    * plan-level analogue of the oracle's result hashing. Uses Spark's
    * own `canonicalized` normalization, so the equivalence notion is
    * exactly the engine's `sameResult`. */
  def planFingerprint(df: DataFrame): String = {
    val canon = df.queryExecution.optimizedPlan.canonicalized.toString
    java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** L5 — the SHUFFLE BILL: every exchange in the physical plan with
    * its partitioning and the optimizer's size estimate for the data
    * that will cross the wire — "what does this query cost the
    * network" BEFORE running it, the per-query complement of L3's
    * join advice (a join that should have broadcast shows up here as
    * an avoidable fact-sized exchange; a reused exchange shows up
    * once). Broadcast exchanges are listed separately — they ship
    * whole-relation copies to every executor, a different bill.
    * Driver-side metadata only: no job runs; estimates come from the
    * same optimizer statistics the planner itself used. */
  final case class ExchangeCost(kind: String, partitioning: String,
      estBytes: BigInt)

  def shuffleBill(df: DataFrame): Seq[ExchangeCost] =
    shuffleBill(df.queryExecution.executedPlan)

  /** Whether a SinglePartition exchange's input is AGGREGATE-REDUCED:
    * the rows entering the funnel are some aggregate's output (already
    * collapsed to group count), reached by descending through unary
    * nodes that can only PRESERVE OR SHRINK row count (projections,
    * filters, sorts, limits, windows, codegen wrappers). Anything else
    * on the way down — a join, a generator, a union, a raw scan —
    * means the funnel swallows data-proportional rows: the global-
    * window trap L1 exists to flag. Shared by the L1 rule and the
    * shuffle-bill annotation so the two can never disagree. */
  /** The aggregate (if any) feeding a node through reduction-
    * preserving operators, as its grouping-expression list:
    * `Some(Nil)` = GLOBAL aggregate (at most one row per input task —
    * the truly bounded funnel class), `Some(keys)` = grouped
    * aggregate (one row PER GROUP — data-proportional for
    * high-cardinality keys, so NOT exempt), `None` = no aggregate. */
  private[operators] def aggBelow(p: SparkPlan)
      : Option[Seq[org.apache.spark.sql.catalyst.expressions.Expression]] =
    p match {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        Some(a.groupingExpressions)
      case u @ (_: org.apache.spark.sql.execution.WholeStageCodegenExec |
          _: org.apache.spark.sql.execution.InputAdapter |
          _: org.apache.spark.sql.execution.ProjectExec |
          _: org.apache.spark.sql.execution.FilterExec |
          _: org.apache.spark.sql.execution.SortExec |
          _: org.apache.spark.sql.execution.LocalLimitExec |
          _: org.apache.spark.sql.execution.GlobalLimitExec |
          _: org.apache.spark.sql.execution.window.WindowExec) =>
        aggBelow(u.children.head)
      case _ => None
    }

  /** Annotate a SinglePartition shuffle token with its L1 class, so a
    * committed shuffle-bill diff distinguishes the funnels WITHOUT
    * re-running the linter. `[agg-1row]` = global-aggregate reduction,
    * sanctioned; `[agg-grouped]` = grouped-aggregate funnel, bounded
    * only when the grouping keys are (L1 flags it as
    * `grouped-agg-funnel` for deliberate allowlisting); `[non-agg]` =
    * the raw funnel L1 flags as `single-partition-exchange`. */
  private def singlePartitionClass(e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec): String =
    aggBelow(e.child) match {
      case Some(g) if g.isEmpty => "[agg-1row]"
      case Some(_) => "[agg-grouped]"
      case None => "[non-agg]"
    }

  /** Overload for a physical plan obtained elsewhere (e.g. the
    * cache-free planning path in [[PlanLedger]]). */
  def shuffleBill(executedPlan: SparkPlan): Seq[ExchangeCost] = {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    // under AQE the executed plan is an adaptive wrapper; its
    // executedPlan member is the current physical plan — before any
    // action runs, that is the INITIAL plan with exchanges inserted
    // (pre-runtime-reoptimization, exactly what a pre-flight cost
    // review wants); after an action it shows the final stages, where
    // reused exchanges appear once
    val plan = executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collect {
      case s: ShuffleExchangeExec =>
        val part = s.outputPartitioning.toString +
          (if (s.outputPartitioning.numPartitions == 1 &&
            s.outputPartitioning.toString == "SinglePartition")
            singlePartitionClass(s) else "")
        ExchangeCost("shuffle", part,
          s.child.logicalLink.map(_.stats.sizeInBytes).getOrElse(BigInt(-1)))
      case b: BroadcastExchangeExec =>
        ExchangeCost("broadcast", b.outputPartitioning.toString,
          b.child.logicalLink.map(_.stats.sizeInBytes).getOrElse(BigInt(-1)))
    }
  }
}
