package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, TimestampType}

/** Optimizer rule: rewrite a timestamp interval join — an inner join whose
  * only cross-side predicates are range bounds
  *
  * {{{ points JOIN intervals ON p >= lo AND p < hi }}}
  *
  * into the bucketed grid equi-join (the j9_range_join construction):
  *
  * {{{
  * Project(original output,
  *   Join(Project(points, cell(p)),
  *        Generate(explode(sequence(cell(lo), cell(hi))), intervals),
  *        Inner, cell = cell(p) AND <original condition>))
  * }}}
  *
  * Spark plans the raw form as BroadcastNestedLoopJoin — O(|points| ×
  * |intervals|) and broadcast-bounded, the first thing that dies when the
  * interval side outgrows a dimension table. The grid form is a hash
  * join: each interval explodes to the (len/width + 1) grid cells it
  * overlaps, each point maps to exactly one cell, and the ORIGINAL
  * condition rides along as the residual, so the rewrite is exact for
  * any combination of strict/inclusive bounds. A (point, interval) pair
  * shares at most the point's single cell — no duplicate pairs, no
  * post-join dedup.
  *
  * Guards (rewrite only when provably equivalent and useful):
  *   - inner join; no cross-side equality conjunct already present (if
  *     one exists Spark hash-joins on it and the loop join never forms —
  *     this also makes the rule's own output, which contains a cell
  *     equality, a non-match for the fixed-point re-run)
  *   - one conjunct bounds p from below, another from above, with p the
  *     SAME attribute in both, p from one side and both bounds plain
  *     attributes of the other side, all of ONE type among timestamp /
  *     long / int (timestamps are the j9 shape; integral positions are
  *     the b5 shape — token offsets, epoch numbers, sequence ids; the
  *     construction only needs truncated division's monotonicity, which
  *     holds for negative values too)
  *   - NULL bounds/points fall out exactly as the inner join's
  *     three-valued logic does: a NULL cell equi-matches nothing, and a
  *     NULL-bounded interval generates an empty cell array
  *   - an inverted interval (lo > hi) generates no cells (the guarded
  *     sequence), matching the always-false original predicate
  *
  * Bucket width: `spark.graft.rangejoin.bucket.seconds` (default 300) —
  * seconds for timestamps, raw units for integral points; size it to the
  * typical interval length so fan-out stays ~2-3 cells per interval
  * (j9's sizing rule; `Relational.cellSecondsForTable` derives it from
  * persisted stats).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangejoin.bucket.seconds"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner, Some(_), _) => rewrite(j).getOrElse(j)
  }

  /** Normalize a conjunct to "p is bounded below by lo": (p, lo). */
  private def asLower(c: Expression): Seq[(Expression, Expression)] = c match {
    case GreaterThanOrEqual(p, lo) => Seq((p, lo))
    case GreaterThan(p, lo)        => Seq((p, lo))
    case LessThan(lo, p)           => Seq((p, lo))
    case LessThanOrEqual(lo, p)    => Seq((p, lo))
    case _                         => Seq.empty
  }

  /** Normalize a conjunct to "p is bounded above by hi": (p, hi). */
  private def asUpper(c: Expression): Seq[(Expression, Expression)] = c match {
    case LessThan(p, hi)           => Seq((p, hi))
    case LessThanOrEqual(p, hi)    => Seq((p, hi))
    case GreaterThan(hi, p)        => Seq((p, hi))
    case GreaterThanOrEqual(hi, p) => Seq((p, hi))
    case _                         => Seq.empty
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitAnd(a) ++ splitAnd(b)
    case other     => Seq(other)
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val cond = j.condition.get
    val conjuncts = splitAnd(cond)
    def fromOnly(e: Expression, side: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet)
    def crossSide(a: Expression, b: Expression): Boolean =
      (fromOnly(a, j.left) && fromOnly(b, j.right)) ||
        (fromOnly(a, j.right) && fromOnly(b, j.left))
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b)       => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _                   => false
    }
    if (hasEqui) return None

    // find a (lower, upper) conjunct pair over the same timestamp point
    // attribute, bounds both attributes of the opposite side
    val candidates = for {
      cl <- conjuncts; (p1, lo) <- asLower(cl)
      cu <- conjuncts if cu ne cl
      (p2, hi) <- asUpper(cu)
      p <- Seq(p1).collect { case a: AttributeReference => a }
      if p2.semanticEquals(p)
      loA <- Seq(lo).collect { case a: AttributeReference => a }
      hiA <- Seq(hi).collect { case a: AttributeReference => a }
      // timestamps (the j9 shape) or integral positions (the b5 shape:
      // token offsets, epoch numbers, sequence ids). Monotonicity of
      // truncated division is all the construction needs — cell(lo) ≤
      // cell(p) ≤ cell(hi) for any p in [lo, hi] holds for negatives too
      if Seq(TimestampType, LongType, IntegerType).contains(p.dataType) &&
        loA.dataType == p.dataType && hiA.dataType == p.dataType
      pointIsLeft <- (fromOnly(p, j.left), fromOnly(loA, j.right) &&
        fromOnly(hiA, j.right)) match {
        case (true, true) => Seq(true)
        case _ =>
          if (fromOnly(p, j.right) && fromOnly(loA, j.left) &&
            fromOnly(hiA, j.left)) Seq(false)
          else Seq.empty
      }
    } yield (p, loA, hiA, pointIsLeft)

    candidates.headOption.map { case (p, lo, hi, pointIsLeft) =>
      val width = Literal(
        conf.getConfString(WidthConf, "300").toLong)
      // TimeZoneAwareExpressions (Sequence, Cast) are unresolved until a
      // timeZoneId is bound — the analyzer normally does this, but an
      // optimizer-built tree must bind it itself
      val tz = Some(conf.sessionLocalTimeZone)
      def cellOf(e: Expression): Expression =
        IntegralDivide(Cast(e, LongType, tz), width)
      val (pointPlan, intervalPlan) =
        if (pointIsLeft) (j.left, j.right) else (j.right, j.left)
      // guarded sequence: empty for inverted or NULL-bounded intervals
      val cellLo = cellOf(lo)
      val cellHi = cellOf(hi)
      val seq = If(LessThanOrEqual(cellLo, cellHi),
        Sequence(cellLo, cellHi, Some(Literal(1L)), tz),
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
      val cellAttr = AttributeReference("graft_range_cell", LongType,
        nullable = false)()
      val gen = Generate(Explode(seq), Nil, outer = false, None,
        Seq(cellAttr), intervalPlan)
      val pCell = Alias(cellOf(p), "graft_range_pcell")()
      val proj = Project(pointPlan.output :+ pCell, pointPlan)
      val newCond = And(EqualTo(cellAttr, pCell.toAttribute), cond)
      val (newL, newR) = if (pointIsLeft) (proj, gen) else (gen, proj)
      Project(j.left.output ++ j.right.output,
        Join(newL, newR, Inner, Some(newCond), j.hint))
    }
  }
}
