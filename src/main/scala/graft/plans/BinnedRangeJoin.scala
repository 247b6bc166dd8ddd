package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite an equi-keyless BOUNDED range join into a bin
  * equi-join — c10's manual rewrite, promoted into the engine so a user
  * who writes the naive predicate gets the scalable plan automatically.
  *
  * Pattern (both comparison orientations, both conjunct orders, either
  * join side as the point side):
  *
  * {{{ point >= base AND point < base + W }}}
  *
  * with `point` referencing exactly one join side, `base` the other, both
  * integral (the day-index/bucket-id shape; timestamps don't match — cast
  * to an index first, which is also what keeps the arithmetic overflow-
  * free), and `W` a positive integer literal. Without this rule the only
  * physical plan Spark has is BroadcastNestedLoopJoin — O(n·m) predicate
  * evaluations, the 100 TB scale-killer. With it: the base side explodes
  * to the ≤ 2 bins its width-W window can touch (window length = bin
  * width), the point side computes its single bin, the join becomes an
  * equi-join on the bin with the ORIGINAL predicate kept as residual —
  * exact by construction (each point has one bin, so no match can
  * duplicate; the residual re-checks every candidate). A final Project
  * restores the original output, so nothing above the join sees the bin.
  *
  * The rule runs inside the operator-optimization fixed point: its output
  * condition has an equi conjunct in front, which the pattern rejects —
  * one application per join, guaranteed convergence. Kill switch:
  * `spark.graft.binnedRangeJoin=false` (read per optimization, so a
  * session can A/B the rewrite — the spec differentials do).
  *
  * floor-division is implemented as `(v - pmod(v, W)) div W`, exact for
  * negative indexes too (plain integral division truncates toward zero
  * and would split the [-W, 0) bin in half).
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.binnedRangeJoin"

  /** point >= base (either spelling). */
  private def asGe(e: Expression): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(x, y) => Some((x, y))
      case LessThanOrEqual(y, x) => Some((x, y))
      case _ => None
    }

  /** point < base + W (either spelling), W a positive int/long literal. */
  private def asLtPlus(e: Expression)
      : Option[(Expression, Expression, Long)] = {
    def width(l: Literal): Option[Long] = l.value match {
      case i: java.lang.Integer => Some(i.toLong)
      case l2: java.lang.Long => Some(l2)
      case _ => None
    }
    e match {
      case LessThan(x, Add(y, lit: Literal, _)) =>
        width(lit).filter(_ > 0).map((x, y, _))
      case GreaterThan(Add(y, lit: Literal, _), x) =>
        width(lit).filter(_ > 0).map((x, y, _))
      case _ => None
    }
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** The band (point, base, width) if the whole condition is exactly the
    * two-conjunct window predicate.
    */
  private def matchBand(cond: Expression)
      : Option[(Expression, Expression, Long)] = {
    val parts = cond match {
      case And(a, b) => Seq((a, b), (b, a))
      case _ => Nil
    }
    parts.flatMap { case (geSide, ltSide) =>
      for {
        (x1, y1) <- asGe(geSide)
        (x2, y2, w) <- asLtPlus(ltSide)
        if x1.semanticEquals(x2) && y1.semanticEquals(y2) &&
          integral(x1) && integral(y1)
      } yield (x1, y1, w)
    }.headOption
  }

  private def floorDiv(e: Expression, w: Long): Expression = {
    val v = Cast(e, LongType)
    val wl = Literal(w, LongType)
    IntegralDivide(Subtract(v, Pmod(v, wl)), wl)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (org.apache.spark.sql.internal.SQLConf.get
        .getConfString(ConfKey, "true") != "true") return plan
    plan transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        matchBand(cond) match {
          // base on the left, point on the right (c10's orientation)
          case Some((x, y, w))
              if y.references.nonEmpty &&
                y.references.subsetOf(left.outputSet) &&
                x.references.nonEmpty &&
                x.references.subsetOf(right.outputSet) =>
            rewrite(j, baseSide = left, pointSide = right,
              base = y, point = x, w = w, baseIsLeft = true, hint = hint,
              cond = cond)
          // mirrored orientation
          case Some((x, y, w))
              if y.references.nonEmpty &&
                y.references.subsetOf(right.outputSet) &&
                x.references.nonEmpty &&
                x.references.subsetOf(left.outputSet) =>
            rewrite(j, baseSide = right, pointSide = left,
              base = y, point = x, w = w, baseIsLeft = false, hint = hint,
              cond = cond)
          case _ => j
        }
    }
  }

  private def rewrite(j: Join, baseSide: LogicalPlan,
      pointSide: LogicalPlan, base: Expression, point: Expression,
      w: Long, baseIsLeft: Boolean,
      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint,
      cond: Expression): LogicalPlan = {
    // base side: explode the <= 2 bins the [base, base + w) window touches
    val binBase = AttributeReference("__graft_bin", LongType,
      nullable = false)()
    // Sequence is TimeZoneAware — it stays UNRESOLVED until the zone id is
    // set, even for pure integer sequences (the analyzer normally sets it;
    // an optimizer rule must do so itself)
    val seq = new Sequence(
      floorDiv(base, w),
      floorDiv(Add(Cast(base, LongType), Literal(w - 1, LongType)), w),
      Some(Literal(1L, LongType)),
      Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binBase),
      child = baseSide)
    // point side: its single bin
    val binPointAlias = Alias(floorDiv(point, w), "__graft_bin_p")()
    val proj = Project(pointSide.output :+ binPointAlias, pointSide)
    val newCond = And(EqualTo(binBase, binPointAlias.toAttribute), cond)
    val joined =
      if (baseIsLeft) Join(gen, proj, Inner, Some(newCond), hint)
      else Join(proj, gen, Inner, Some(newCond), hint)
    Project(j.output, joined)
  }
}
