package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rewrite: a PURE interval join — `Join(a, b)` whose only
  * condition is `x >= lo AND x < hi` (x from one side, lo/hi from the
  * other) — compiles by default to a broadcast-nested-loop join that
  * compares every row against every interval: the join shape that
  * cannot hash-partition and dies first at scale. This rule rewrites it
  * into the standard binned equi-join the engine's hand-written range
  * join uses ([[graft.operators.EventOps.rangeJoin]]): bucket the value
  * side by a fixed bin width, replicate each interval to every bin it
  * overlaps, equi-join on the bin, and keep the ORIGINAL predicate as
  * the residual filter — so users write the natural non-equi condition
  * and still get a shuffle-partitionable plan.
  *
  * Deliberately narrow (the rewrite must never fire where it could
  * lose): inner joins only; the condition must be EXACTLY one lower and
  * one strict-upper bound on the same double-typed expression, with the
  * bounds from the opposite side; any equality conjunct disqualifies
  * (the join is already hash-partitionable — and that check is also the
  * fixpoint guard, since the rewritten join carries a bin equality).
  * Correctness does not depend on the bin width: the replicated bin
  * range `[floor(lo/w), floor(hi/w)]` covers every bin a matching value
  * can land in (a superset — an empty interval even yields a descending
  * Sequence whose junk rows the residual filter removes), NULLs on
  * either side fail both the bin equality and the original predicate
  * alike, and the rewritten join is wrapped in a projection back to the
  * original output. Width tunes only performance: bins ≈ interval width
  * keeps replication ≈ 1-2 rows per interval.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Kill switch (default ON — the rule only ever fires on the exact
    * pure-interval shape).
    */
  val EnabledKey = "graft.rangeJoin.rewrite"

  /** Bin width in value units. */
  val WidthKey = "graft.rangeJoin.binWidth"

  /** Replication cap: an interval wider than this many bins is routed to
    * the nested-loop FALLBACK arm instead of being exploded (an unbounded
    * Sequence over e.g. a catch-all `[x, ∞)` tier would materialize a
    * multi-million-element array per row, or overflow outright).
    */
  val MaxBinsKey = "graft.rangeJoin.maxBinsPerInterval"

  private def enabled: Boolean =
    SQLConf.get.getConfString(EnabledKey, "true").toBoolean
  private def width: Double =
    SQLConf.get.getConfString(WidthKey, "50.0").toDouble
  private def maxBins: Long =
    SQLConf.get.getConfString(MaxBinsKey, "256").toLong

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        rewrite(j, l, r, cond, hint).getOrElse(j)
    }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      cond: Expression, hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.length != 2) return None

    // normalize each conjunct to (value, bound, isLower) with value and
    // bound on OPPOSITE sides; bail on anything else
    def bound(e: Expression): Option[(Expression, Expression, Boolean)] =
      e match {
        case GreaterThanOrEqual(x, lo) => Some((x, lo, true))
        case LessThanOrEqual(lo, x)    => Some((x, lo, true))
        case LessThan(x, hi)           => Some((x, hi, false))
        case GreaterThan(hi, x)        => Some((x, hi, false))
        case _                         => None
      }

    (bound(conjuncts(0)), bound(conjuncts(1))) match {
      case (Some((x1, lo, true)), Some((x2, hi, false)))
          if x1.semanticEquals(x2) =>
        buildBinned(j, l, r, x1, lo, hi, cond, hint)
      case (Some((x1, hi, false)), Some((x2, lo, true)))
          if x1.semanticEquals(x2) =>
        buildBinned(j, l, r, x1, lo, hi, cond, hint)
      case _ => None
    }
  }

  private def buildBinned(j: Join, l: LogicalPlan, r: LogicalPlan,
      x: Expression, lo: Expression, hi: Expression, cond: Expression,
      hint: JoinHint): Option[LogicalPlan] = {
    if (x.dataType != DoubleType || lo.dataType != DoubleType ||
      hi.dataType != DoubleType) return None
    val xLeft =
      if (x.references.subsetOf(l.outputSet)) true
      else if (x.references.subsetOf(r.outputSet)) false
      else return None
    val (valuePlan, intervalPlan) = if (xLeft) (l, r) else (r, l)
    if (!lo.references.subsetOf(intervalPlan.outputSet) ||
      !hi.references.subsetOf(intervalPlan.outputSet)) return None

    val w = Literal(width)
    def binOf(e: Expression): Expression =
      Cast(Floor(Divide(e, w)), LongType)

    // Interval width is DATA, so the replication bound cannot be checked
    // at plan time: split the interval side by span instead. Narrow
    // intervals (≤ maxBins bins — the overwhelming majority in any sane
    // dim) take the binned equi-join; the rare wide/open-ended ones keep
    // the original nested-loop shape over just that sliver. NULL or NaN
    // bounds fall out of BOTH filters — exactly matching the original
    // join, where such rows can never satisfy the range condition.
    val spanCap = Literal(width * maxBins)
    val narrowPred = LessThanOrEqual(Subtract(hi, lo), spanCap)
    val widePred   = GreaterThan(Subtract(hi, lo), spanCap)
    val narrowIntervals = Filter(narrowPred, intervalPlan)
    val wideIntervals   = Filter(widePred, intervalPlan)

    val valueBin = Alias(binOf(x), "graft_range_bin")()
    val valueSide = Project(valuePlan.output :+ valueBin, valuePlan)
    val binElem = AttributeReference("graft_range_bin_i", LongType,
      nullable = false)()
    // Sequence is TimeZoneAwareExpression: without an explicit zone it
    // reports unresolved even over longs, and the optimizer rejects the
    // "resolved became unresolved" transition
    val intervalSide = Generate(
      Explode(new Sequence(binOf(lo), binOf(hi), None,
        Some(SQLConf.get.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(binElem), child = narrowIntervals)

    val (newL, newR) =
      if (xLeft) (valueSide, intervalSide) else (intervalSide, valueSide)
    val newCond = And(EqualTo(valueBin.toAttribute, binElem), cond)
    val binnedArm = Project(j.output, Join(newL, newR, Inner,
      Some(newCond), hint))
    // fallback arm: original join over the wide intervals only. Its
    // condition carries the span guard as a third conjunct — redundant
    // over the filtered child, but it keeps the conjunct count at 3 so
    // this rule can never re-fire on its own output.
    val (wideL, wideR) = if (xLeft) (l, wideIntervals) else (wideIntervals, r)
    val wideArm = Project(j.output,
      Join(wideL, wideR, Inner, Some(And(widePred, cond)), hint))
    Some(Union(Seq(binnedArm, wideArm)))
  }
}
