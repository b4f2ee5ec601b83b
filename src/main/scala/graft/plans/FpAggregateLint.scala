package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Injected optimizer rule: the engine's determinism discipline as a
  * PLAN-LEVEL lint. Every graft aggregate sums exact integers (cents,
  * micro-units, counts) precisely because a floating-point `sum`/`avg`
  * is order-dependent — each shuffle layout, each retry, each AQE
  * re-plan can produce a different last-ulp result, which breaks the
  * oracle hash gate, cross-run reproducibility, and incremental-view
  * merges alike. This rule makes that discipline ENFORCEABLE: with
  * `graft.lint.fpAggregates=true` (off by default), any grouped
  * `Sum`/`Average` over Float/Double fails analysis loudly with the
  * offending expression, instead of shipping a query whose results
  * silently wobble at the 16th digit.
  *
  * Windowed FP sums are deliberately NOT flagged: a window frame has a
  * pinned traversal order, so its accumulation is deterministic for a
  * deterministic sort key. Registered as an analysis CHECK rule
  * (`injectCheckRule`), not an optimizer rule: checks fire at
  * analysis time on every plan and — unlike optimizer batches — cannot
  * be switched off via `spark.sql.optimizer.excludedRules`, so the
  * guard cannot silently vanish from a tuned session.
  */
case class FpAggregateLint(spark: SparkSession)
    extends (LogicalPlan => Unit) {

  override def apply(plan: LogicalPlan): Unit = {
    if (spark.conf.getOption(FpAggregateLint.ConfKey).contains("true")) {
      plan.foreach {
        case agg: Aggregate =>
          agg.aggregateExpressions.foreach(_.foreach {
            case s: Sum
                if s.child.dataType == DoubleType ||
                  s.child.dataType == FloatType =>
              fail("sum", s.child.sql)
            case a: Average
                if a.child.dataType == DoubleType ||
                  a.child.dataType == FloatType =>
              fail("avg", a.child.sql)
            case _ => ()
          })
        case _ => ()
      }
    }
  }

  private def fail(fn: String, child: String): Nothing =
    throw new IllegalStateException(
      s"[graft.lint.fpAggregates] order-dependent floating-point " +
        s"aggregate: $fn($child) over Float/Double. Grouped FP " +
        s"accumulation differs across partition layouts; aggregate " +
        s"exact integers (cents/micro-units) or DECIMAL instead, or " +
        s"disable ${FpAggregateLint.ConfKey}.")
}

object FpAggregateLint {
  /** Session conf key enabling the lint (default: disabled). */
  val ConfKey = "graft.lint.fpAggregates"
}
