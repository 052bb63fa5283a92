package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY.md §4 custom item 3): rewrite the
  * latest-row-per-key idiom
  *
  * {{{ Filter(rn = 1, Window(row_number() OVER (PARTITION BY k ORDER BY s DESC) AS rn, child)) }}}
  *
  * into a `max_by` aggregate (`min_by` for ascending order):
  *
  * {{{ Project(k, latest.*, 1 AS rn, Aggregate(k, max_by(struct(child.output), struct(s)) AS latest)) }}}
  *
  * The window form sorts every partition's full history; the aggregate form
  * combines map-side, so the shuffle carries one row per (input partition,
  * key) — at a 100 TB metrics table that is the difference between moving
  * the table and moving the key set. The reference's `ORDER BY id DESC
  * LIMIT 1` snapshots (myapp/views.py:585-614,667-671) hit this shape
  * constantly.
  *
  * Guards (rewrite only when provably equivalent):
  *   - single window expression, plain `row_number`, filter is exactly `rn = 1`
  *   - partition + ordering keys are attributes with a uniform direction
  *   - nullable ordering attributes (parquet reads!) rewrite only under the
  *     default null placement (DESC NULLS LAST / ASC NULLS FIRST), which is
  *     exactly what struct-ordering gives max_by/min_by (null field =
  *     smallest); explicit non-default placements keep the Window form
  *   - `rn` is not referenced above the filter other than being projectable
  *     (output attribute ids are preserved, so any parent works)
  */
object LatestPerKeyRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(f, cond, w).getOrElse(f)
  }

  private def rewrite(f: Filter, cond: Expression, w: Window): Option[LogicalPlan] = {
    // filter must be exactly `rn = 1` on the window's produced attribute
    val rnAttr = w.windowExpressions match {
      case Seq(a @ Alias(we: WindowExpression, _))
          if we.windowFunction.isInstanceOf[RowNumber] => Some(a)
      case _ => None
    }
    rnAttr.flatMap { rnAlias =>
      val isRnEq1 = cond match {
        case EqualTo(attr: AttributeReference, Literal(1, _)) =>
          attr.exprId == rnAlias.exprId
        case EqualTo(Literal(1, _), attr: AttributeReference) =>
          attr.exprId == rnAlias.exprId
        case _ => false
      }
      val partitionAttrs = w.partitionSpec.collect { case a: AttributeReference => a }
      val orderAttrs = w.orderSpec.collect {
        case SortOrder(a: AttributeReference, dir, nullOrd, _) => (a, dir, nullOrd)
      }
      val uniformDirection = orderAttrs.map(_._2).distinct.size == 1
      // max_by/min_by compare CreateStruct(orderAttrs), and struct field
      // comparison treats a null field as smaller than any value — exactly
      // the window's DEFAULT null placement (DESC NULLS LAST / ASC NULLS
      // FIRST). Nullable ordering columns (every parquet-read column) are
      // therefore safe under the default placement; only the explicit
      // non-default placements (DESC NULLS FIRST / ASC NULLS LAST) have no
      // struct-ordering equivalent and keep the Window form.
      val nullPlacementOk = orderAttrs.forall { case (a, dir, nullOrd) =>
        !a.nullable || ((dir, nullOrd) match {
          case (Descending, NullsLast) => true
          case (Ascending, NullsFirst) => true
          case _                       => false
        })
      }
      val ok = isRnEq1 &&
        partitionAttrs.size == w.partitionSpec.size &&
        orderAttrs.size == w.orderSpec.size && orderAttrs.nonEmpty &&
        uniformDirection &&
        nullPlacementOk &&
        w.partitionSpec.nonEmpty
      if (!ok) None
      else {
        val child = w.child
        val ordStruct = CreateStruct(orderAttrs.map(_._1))
        val payload = CreateStruct(child.output)
        val aggFn = orderAttrs.head._2 match {
          case Descending => MaxBy(payload, ordStruct)
          case Ascending  => MinBy(payload, ordStruct)
        }
        val latest = Alias(aggFn.toAggregateExpression(), "graft_latest")()
        val agg = Aggregate(partitionAttrs, partitionAttrs :+ latest, child)
        val latestRef = latest.toAttribute
        val partitionIds = partitionAttrs.map(_.exprId).toSet
        // reproduce the window's full output schema with original expr ids
        val projected: Seq[NamedExpression] = child.output.zipWithIndex.map {
          case (attr, i) =>
            if (partitionIds.contains(attr.exprId)) attr
            else Alias(GetStructField(latestRef, i, Some(attr.name)), attr.name)(
              exprId = attr.exprId, qualifier = attr.qualifier)
        } :+ Alias(Literal(1), rnAlias.name)(
          exprId = rnAlias.exprId, qualifier = rnAlias.qualifier)
        Some(Project(projected, agg))
      }
    }
  }
}
