package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** L2 — column-level lineage extractor: for every output column of a
  * query, the set of SOURCE columns (`table.column`) whose values flow
  * into it. The impact-analysis primitive behind "which reports break
  * if we drop l_discount" and "where does this PII column leak to" —
  * answered from the ANALYZED Catalyst plan, before any physical
  * planning, so it works on any DataFrame the library produces.
  *
  * Semantics: DATA lineage — a source column is included iff it is
  * referenced by an expression on the value path of the output column
  * (projections, aggregates, window functions, generators, join
  * outputs, positional union merge). Filter/sort/join predicates are
  * CONTROL flow and deliberately excluded: they decide which rows
  * survive, not what a value is made of (the standard
  * data-vs-control lineage split; a control-closure variant would add
  * `plan.expressions` references at each node).
  *
  * Source naming: file relations are named by their root file/dir
  * (`lineitem.parquet` → `lineitem`); in-memory test frames report as
  * `local`. Resolution is one bottom-up pass keyed on `ExprId`, so
  * aliasing, self-joins, and re-used subtrees resolve exactly — two
  * reads of the same table through different aliases keep distinct
  * ExprIds and therefore distinct, correct lineage.
  */
object Lineage {

  /** Output column name → source columns as `table.column`. */
  def columns(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val m = resolve(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty)).toMap
  }

  /** Table-level dependencies: every relation the plan READS — the
    * "which feeds does this report depend on" inventory and the edge
    * set of a run-order DAG over a view registry. Deliberately WIDER
    * than [[columns]]' value lineage: a table referenced only through
    * join keys or filters contributes no output VALUES, but dropping
    * it still breaks the query, so dependency analysis must count it. */
  def tables(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collect {
      case l: LogicalRelation => relationName(l)
      case _: LocalRelation => "local"
    }.toSet

  private def relationName(l: LogicalRelation): String = {
    val name = l.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.rootPaths.headOption.map(_.getName).getOrElse("file")
      case other => other.getClass.getSimpleName
    }
    name.replaceAll("\\.(parquet|orc|csv|json)$", "")
  }

  private def ofNamed(exprs: Seq[NamedExpression],
      childMap: Map[ExprId, Set[String]]): Map[ExprId, Set[String]] =
    exprs.map { ne =>
      val srcs = ne.references.toSeq
        .flatMap(a => childMap.getOrElse(a.exprId, Set.empty))
        .toSet
      ne.exprId -> srcs
    }.toMap

  private def resolve(plan: LogicalPlan): Map[ExprId, Set[String]] =
    plan match {
      case l: LogicalRelation =>
        val t = relationName(l)
        l.output.map(a => a.exprId -> Set(s"$t.${a.name}")).toMap
      case l: LocalRelation =>
        l.output.map(a => a.exprId -> Set(s"local.${a.name}")).toMap
      case p: Project =>
        val c = resolve(p.child)
        c ++ ofNamed(p.projectList, c)
      case a: Aggregate =>
        val c = resolve(a.child)
        c ++ ofNamed(a.aggregateExpressions, c)
      case w: Window =>
        val c = resolve(w.child)
        c ++ ofNamed(w.windowExpressions, c)
      case g: Generate =>
        val c = resolve(g.child)
        val gen = g.generator.references.toSeq
          .flatMap(a => c.getOrElse(a.exprId, Set.empty)).toSet
        c ++ g.generatorOutput.map(a => a.exprId -> gen).toMap
      case u: Union =>
        // positional merge: output i carries every child's column i
        val childMaps = u.children.map(resolve)
        val merged = u.output.zipWithIndex.map { case (out, i) =>
          out.exprId -> u.children.zip(childMaps).flatMap { case (ch, m) =>
            m.getOrElse(ch.output(i).exprId, Set.empty[String])
          }.toSet
        }.toMap
        childMaps.reduce(_ ++ _) ++ merged
      case e: Expand =>
        val c = resolve(e.child)
        val merged = e.output.zipWithIndex.map { case (out, i) =>
          out.exprId -> e.projections.flatMap { proj =>
            proj(i).references.toSeq
              .flatMap(a => c.getOrElse(a.exprId, Set.empty[String]))
          }.toSet
        }.toMap
        c ++ merged
      case s: SubqueryAlias => resolve(s.child)
      case other =>
        // joins, filters, sorts, limits, distinct, repartition…:
        // outputs pass through from children untouched
        other.children.map(resolve)
          .foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
    }
}
