package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.plans.RangeJoinRewrite

/** The injected pure-interval-join rewrite: fires only on the exact
  * shape, produces an equi-join plan, and never changes results.
  */
class RangeJoinRewriteSpec extends SparkSpecBase {
  import spark.implicits._

  private def tiers = EventOps.ValueTiers.toDF("tier", "lo", "hi")

  private def intervalJoin = {
    val e = Tables.events(spark, sfDir).select(col("value"))
    e.join(tiers, col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"))
  }

  test("pure interval join rewrites to a binned equi-join — no nested " +
      "loop — and matches the unrewritten result exactly") {
    val df = intervalJoin
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(900))
    assert(plan.contains("graft_range_bin"), plan.take(900))
    // ground truth from the rule DISABLED (the nested-loop plan)
    spark.conf.set(RangeJoinRewrite.EnabledKey, "false")
    try {
      val off = intervalJoin
      val want = off.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(off.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(got === want)
    } finally spark.conf.unset(RangeJoinRewrite.EnabledKey)
  }

  test("a join carrying an equality conjunct is left alone") {
    val e = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
    val dim = Seq(("click", 0.0, 1000.0), ("view", 0.0, 1000.0))
      .toDF("event_type", "lo", "hi")
    val df = e.join(dim, Seq("event_type"))
      .filter(col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    df.collect()
    assert(!df.queryExecution.executedPlan.toString
      .contains("graft_range_bin"))
  }

  test("the auto query equals the hand-binned range join row for row") {
    val auto = EventOps.rangeJoinAuto(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val manual = EventOps.rangeJoin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(auto === manual)
  }
}
