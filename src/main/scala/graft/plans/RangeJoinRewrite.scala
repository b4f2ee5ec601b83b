package graft.plans

import scala.util.Try

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
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

  /** Fixpoint guard. The rule runs inside the operator-optimization
    * FIXED-POINT batch, so its output is re-visited every iteration —
    * and the conjunct-count guard alone is defeated by
    * `PushDownPredicates`, which moves the fallback arm's span-guard
    * conjunct (it references only the interval side) into a child
    * Filter, re-exposing the exact 2-conjunct pure-interval shape the
    * rule matches. Both generated joins are therefore tagged; the
    * transform machinery (`TreeNode.transformDown` calls `copyTagsFrom`
    * whenever a rule returns a new node) carries the tag across the
    * Join nodes that pushdown rebuilds, and [[apply]] skips tagged
    * joins. [[containsOwnArtifacts]] is the structural backstop for any
    * rewrite that drops tags.
    */
  private[plans] val generatedTag: TreeNodeTag[Boolean] =
    TreeNodeTag[Boolean]("graft.rangeJoin.generated")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUpWithPruning(
      // r16 optimization: tree-pattern pruning. This rule sits in the
      // operator-optimization FIXED-POINT batch, so without pruning it
      // walked every node of every plan on every iteration — for the
      // 200+ join-free plans (and each recursive-CTE iteration's
      // re-optimization) that is pure per-query planning tax. The
      // JOIN-bit check makes join-free subtrees skip in O(1), exactly
      // how Spark's own join rules are written (guide §1.2: per-task —
      // here per-PLAN — work only where it can matter).
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.JOIN)) {
      case j @ Join(l, r, Inner, Some(cond), hint)
          if j.getTagValue(generatedTag).isEmpty =>
        rewrite(j, l, r, cond, hint).getOrElse(j)
    }

  /** True when the interval side already carries this rule's own
    * fallback-arm artifact: a top-of-child Filter (possibly under
    * Projects, after pushdown/CombineFilters) with a
    * `hi - lo > spanCap` conjunct against the CURRENT span cap. After
    * pushdown merges the span guard into that Filter, the join
    * condition is back to two conjuncts and the tag is the only other
    * defense — this makes the bail decision structural as well. The
    * check is deliberately scoped to the top Filter/Project chain, not
    * the whole subtree, so an ENCLOSING interval join above an
    * already-rewritten one is still eligible. Skipping a rewrite is
    * always safe (the original join stays correct, just
    * nested-loop-shaped).
    */
  @annotation.tailrec
  private def containsOwnArtifacts(p: LogicalPlan, cap: Double): Boolean =
    p match {
      case f: Filter =>
        val hit = splitConjunctivePredicates(f.condition).exists {
          case GreaterThan(Subtract(_, _, _), Literal(c: Double, DoubleType)) =>
            c == cap
          case _ => false
        }
        if (hit) true else containsOwnArtifacts(f.child, cap)
      case pr: Project => containsOwnArtifacts(pr.child, cap)
      case _ => false
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

    // Interval width is DATA, so in general the replication bound cannot
    // be checked at plan time: split the interval side by span instead.
    // Narrow intervals (≤ maxBins bins — the overwhelming majority in
    // any sane dim) take the binned equi-join; the rare wide/open-ended
    // ones keep the original nested-loop shape over just that sliver.
    // NULL bounds fall out of BOTH filters — matching the original join,
    // where NULL can never satisfy the range condition. NaN bounds are
    // the opposite case: under Spark's total ordering NaN compares
    // GREATER than every double, so an interval with hi = NaN matches
    // every x >= lo in the original join — and because hi - lo = NaN
    // makes widePred (NaN > spanCap) true, exactly those intervals
    // route through the fallback arm, which preserves the original
    // semantics (the binned arm could never replicate them).
    val cap = width * maxBins
    val spanCap = Literal(cap)
    val narrowPred = LessThanOrEqual(Subtract(hi, lo), spanCap)
    val widePred   = GreaterThan(Subtract(hi, lo), spanCap)
    if (containsOwnArtifacts(intervalPlan, cap)) return None

    // When the interval side is already a materialized LocalRelation
    // (literal dims — `Seq(...).toDF` after ConvertToLocalRelation), the
    // span guard IS checkable at plan time: evaluate it per row. No wide
    // rows → emit the binned arm alone (no Union, no fallback re-scan of
    // the value side); ALL rows wide → the rewrite buys nothing, leave
    // the join untouched. `eval == true` is the route-to-fallback test,
    // so NaN spans (NaN > cap is true under Spark's NaN ordering) and
    // NULL bounds (eval null → not true, and the narrow filter drops
    // them just like the original join) both land on the correct side.
    val localSpans: Option[Seq[Any]] = intervalPlan match {
      case lr: LocalRelation if lr.data.length <= 65536 =>
        Try {
          val bound = BindReferences.bindReference(widePred, lr.output)
          lr.data.map(row => bound.eval(row))
        }.toOption
      case _ => None
    }
    val anyWide = localSpans.forall(_.exists(_ == true))
    val allWide = localSpans.exists(evals =>
      evals.nonEmpty && evals.forall(_ == true))
    if (allWide) return None

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
    val binnedJoin = Join(newL, newR, Inner, Some(newCond), hint)
    binnedJoin.setTagValue(generatedTag, true)
    val binnedArm = Project(j.output, binnedJoin)
    if (!anyWide) return Some(binnedArm)
    // fallback arm: original join over the wide intervals only. Its
    // condition carries the span guard as a third conjunct — redundant
    // over the filtered child, but cheap; the REAL re-fire defenses are
    // the generatedTag set on both joins and containsOwnArtifacts
    // (pushdown strips this conjunct within the same fixed-point batch,
    // so the conjunct count alone is not a guard).
    val (wideL, wideR) = if (xLeft) (l, wideIntervals) else (wideIntervals, r)
    val wideJoin = Join(wideL, wideR, Inner, Some(And(widePred, cond)), hint)
    wideJoin.setTagValue(generatedTag, true)
    val wideArm = Project(j.output, wideJoin)
    Some(Union(Seq(binnedArm, wideArm)))
  }
}
