package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Catalyst optimizer rule: rewrite a NATURAL point-in-interval join —
  * `points JOIN intervals ON p >= lo AND p < hi` with no equi key —
  * into the bucketed equi-join of
  * [[graft.operators.RangeJoin.bucketed]], automatically.
  *
  * Spark plans a range-only inner join as BroadcastNestedLoopJoin:
  * all-pairs work and a whole-side broadcast, an instant non-starter
  * when both sides scale. Users who know the trick call
  * `RangeJoin.bucketed`; this rule gives everyone else the same plan
  * without changing their query: tag each point with its single
  * containing bucket (`p div W`), explode each interval into the
  * buckets it covers (`sequence(lo div W, hi div W)`), equi-join on
  * the bucket and keep the ORIGINAL predicate as the exactness
  * filter. A point lives in exactly one bucket, so each qualifying
  * pair meets exactly once — no dedup, bit-identical results.
  *
  * Deliberately conservative and OPT-IN:
  *  - fires only when `spark.graft.rangeJoin.bucketWidth` is a
  *    positive long (the bucket width in the range column's units —
  *    semantics are width-independent, only the fan-out/skew trade
  *    moves, exactly as in RangeJoin.bucketed);
  *  - inner joins only, and only when NO equi conjunct exists (with
  *    one, Spark already hash-joins and the range residual is fine —
  *    this also makes the rule self-terminating: its own output
  *    carries a bucket equi conjunct);
  *  - all three expressions must be BIGINT and live strictly on
  *    opposite sides. NULL bounds/points produce empty sequences or
  *    null buckets and match nothing — the same rows the original
  *    comparison rejected.
  *
  * Monotonicity makes the coverage law hold on any long domain
  * (truncating division is non-decreasing, so lo ≤ p ≤ hi ⇒
  * lo div W ≤ p div W ≤ hi div W), including negatives. */
class RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  private case class Bound(point: Expression, bound: Expression,
      lower: Boolean)

  private def bounds(e: Expression): Seq[Bound] = e match {
    case GreaterThanOrEqual(a, b) => Seq(Bound(a, b, lower = true),
      Bound(b, a, lower = false))
    case GreaterThan(a, b) => Seq(Bound(a, b, lower = true),
      Bound(b, a, lower = false))
    case LessThanOrEqual(a, b) => Seq(Bound(a, b, lower = false),
      Bound(b, a, lower = true))
    case LessThan(a, b) => Seq(Bound(a, b, lower = false),
      Bound(b, a, lower = true))
    case _ => Nil
  }

  private def sideOf(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(left.outputSet)) Some(true)
    else if (e.references.subsetOf(right.outputSet)) Some(false)
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = try conf.getConfString(WidthConf, "0").toLong
    catch { case _: NumberFormatException => 0L }
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(left, right, cond, hint, w).getOrElse(j)
    }
  }

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (for (sa <- sideOf(a, left, right); sb <- sideOf(b, left, right))
          yield sa != sb).getOrElse(false)
      case _ => false
    }
    if (hasEqui) return None

    val bs = conjuncts.flatMap(bounds)
      .filter(b => b.point.dataType == LongType &&
        b.bound.dataType == LongType)
    val pair = (for {
      lo <- bs.iterator if lo.lower
      hi <- bs.iterator if !hi.lower
      if lo.point.semanticEquals(hi.point)
      pSide <- sideOf(lo.point, left, right).iterator
      loSide <- sideOf(lo.bound, left, right).iterator
      hiSide <- sideOf(hi.bound, left, right).iterator
      if loSide == hiSide && loSide != pSide
    } yield (lo.point, lo.bound, hi.bound, pSide)).nextOption()

    pair.map { case (p, lo, hi, pointOnLeft) =>
      val wLit = Literal(w)
      val pAlias = Alias(IntegralDivide(p, wLit), "__gbucket_p")()
      // Sequence is TimeZoneAwareExpression: without a zone it reports
      // unresolved even for long bounds — pin the session zone
      val rawSeq = new Sequence(IntegralDivide(lo, wLit),
        IntegralDivide(hi, wLit), None, Some(conf.sessionLocalTimeZone))
      // An inverted interval (lo > hi, dirty data) must contribute ZERO
      // buckets: Sequence with no step defaults to step -1 when
      // start > stop, so unguarded it explodes into a descending bucket
      // array — wasted fan-out, and pathological bounds can exceed
      // Sequence's max array length where the naive plan simply
      // returned no rows. A null bound short-circuits to the empty
      // branch too, matching Explode-of-null's emit-nothing.
      val seqE = If(LessThanOrEqual(lo, hi), rawSeq,
        Literal.create(Array.empty[Long], rawSeq.dataType))
      val elemT = seqE.dataType.asInstanceOf[ArrayType]
      val gAttr = AttributeReference("__gbucket_i", elemT.elementType,
        elemT.containsNull)()
      val (pointPlan, ivPlan) = if (pointOnLeft) (left, right) else (right, left)
      val pointP = Project(pointPlan.output :+ pAlias, pointPlan)
      val ivGen = Generate(Explode(seqE), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(gAttr),
        child = ivPlan)
      val (newL, newR) = if (pointOnLeft) (pointP, ivGen) else (ivGen, pointP)
      val newCond = (EqualTo(pAlias.toAttribute, gAttr) +: conjuncts)
        .reduce(And)
      Project(left.output ++ right.output,
        Join(newL, newR, Inner, Some(newCond), hint))
    }
  }
}
