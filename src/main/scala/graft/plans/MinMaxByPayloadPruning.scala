package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Prune unused payload fields out of `min_by`/`max_by` struct aggregates.
  *
  * The engine's per-key dedup family — `RelOps.latestPerKey`,
  * `RelOps.firstWinsDedup`, `Dedup.exact` — aggregates
  * `min_by(struct(<all columns>), struct(<ordering>))` so the shuffle
  * carries one combined row per key per partition instead of the whole
  * table. But when the CALLER then projects a subset of the payload
  * (`latestPerKey(orders).select(key, date)`), Catalyst's column pruning
  * stops at the aggregate: nothing in the stock optimizer reaches INSIDE
  * an aggregate function's struct argument, so every untouched field —
  * at corpus scale, whole document-text columns — still rides the
  * aggregation buffer and the exchange (observed on executed plans; the
  * motivating case shuffled full text the query then discarded).
  *
  * This rule closes the gap: for a `Project` directly over an
  * `Aggregate`, any `min_by`/`max_by` whose payload is a literal
  * `CreateNamedStruct` and whose result is consumed ONLY through
  * `GetStructField` extractions gets its payload narrowed to the
  * extracted fields (ordinals remapped in the projection; a whole-struct
  * use disables pruning for that aggregate). Semantics are unchanged:
  * the ordering argument is untouched, so the same row wins each group —
  * payload fields are pure carry-along output. Also upstream: narrowing
  * the struct lets the standard column-pruning batch drop the columns
  * from the scan itself in the same fixed point.
  *
  * Registered via [[graft.GraftExtensions]]
  * (`injectOptimizerRule` → the operator-optimization fixed point, so it
  * composes with `CollapseProject`, which produces the Project-on-
  * Aggregate shape this matches). Idempotent: after one application every
  * payload field is referenced, so the guard (`used.size < n`) fails.
  */
object MinMaxByPayloadPruning extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, agg: Aggregate) =>
      val rewrites = agg.aggregateExpressions.flatMap(candidate(_, projectList))
      if (rewrites.isEmpty) p
      else {
        val byId = rewrites.map(r => r.oldAttr.exprId -> r).toMap
        val newAggList = agg.aggregateExpressions.map { ne =>
          byId.values.find(_.oldAlias eq ne).map(_.newAlias).getOrElse(ne)
        }
        val newProjectList = projectList.map { ne =>
          ne.transform {
            case GetStructField(ar: AttributeReference, ord, nameOpt)
                if byId.contains(ar.exprId) =>
              val r = byId(ar.exprId)
              GetStructField(r.newAlias.toAttribute, r.ordinalMap(ord), nameOpt)
          }.asInstanceOf[NamedExpression]
        }
        Project(newProjectList, agg.copy(aggregateExpressions = newAggList))
      }
  }

  private final case class Rewrite(oldAlias: NamedExpression, oldAttr: Attribute,
                                   newAlias: Alias, ordinalMap: Map[Int, Int])

  /** A prunable aggregate output: `Alias(AggregateExpression(min_by/max_by
    * over a literal named struct))` whose attribute is consumed only via
    * field extraction, with at least one field unused.
    */
  private def candidate(ne: NamedExpression,
                        projectList: Seq[NamedExpression]): Option[Rewrite] = ne match {
    case al @ Alias(ae: AggregateExpression, name)
        if !ae.isDistinct && ae.filter.isEmpty =>
      val structAndBuild = ae.aggregateFunction match {
        case MinBy(v: CreateNamedStruct, ord) =>
          Some((v, (s: CreateNamedStruct) => MinBy(s, ord)))
        case MaxBy(v: CreateNamedStruct, ord) =>
          Some((v, (s: CreateNamedStruct) => MaxBy(s, ord)))
        case _ => None
      }
      structAndBuild.flatMap { case (struct, build) =>
        val attr = al.toAttribute
        val n = struct.valExprs.size
        var usedWhole = false
        val used = scala.collection.mutable.SortedSet.empty[Int]
        def scan(e: Expression): Unit = e match {
          case GetStructField(ar: AttributeReference, ord, _) if ar.exprId == attr.exprId =>
            used += ord
          case ar: AttributeReference if ar.exprId == attr.exprId =>
            usedWhole = true
          case other => other.children.foreach(scan)
        }
        projectList.foreach(scan)
        if (usedWhole || used.isEmpty || used.size >= n) None
        else {
          val keep = used.toIndexedSeq
          val newStruct = CreateNamedStruct(keep.flatMap(i =>
            Seq(struct.nameExprs(i), struct.valExprs(i))))
          // fresh exprId: the attribute's struct TYPE changes, so reusing
          // the old id would leave stale type info anywhere it is cached
          val newAlias = Alias(ae.copy(aggregateFunction = build(newStruct)), name)()
          Some(Rewrite(al, attr, newAlias, keep.zipWithIndex.toMap))
        }
      }
    case _ => None
  }
}
