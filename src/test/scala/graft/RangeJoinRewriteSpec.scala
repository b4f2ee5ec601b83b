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

  test("literal dim, all spans under the cap: binned arm ALONE — no " +
      "Union, no fallback re-scan of the value side") {
    val df = EventOps.rangeJoinAuto(spark, sfDir)
    df.collect()
    val opt = df.queryExecution.optimizedPlan
    val unions = opt.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }
    val joins = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(unions.isEmpty, s"expected single-arm plan, got:\n$opt")
    assert(joins.size == 1, s"expected exactly one join, got:\n$opt")
    assert(!df.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }

  test("parquet-backed interval side with a wide interval: one rewrite, " +
      "no fixed-point re-fire blowup, results match the rule disabled") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rj").toString
    // the wide tier (span 1e7 ≫ width·maxBins = 12800) must route to the
    // fallback arm; parquet-backed so nothing constant-folds at plan time
    // (the LocalRelation escape hatch in the rule does not apply) — this
    // is exactly the shape where PushDownPredicates used to strip the
    // span-guard conjunct and re-expose the rule to its own output.
    Seq(("t0", 0.0, 40.0), ("t1", 40.0, 120.0), ("wide", 0.0, 1e7))
      .toDF("tier", "lo", "hi").write.mode("overwrite").parquet(dir)
    def run() = {
      val tiers = spark.read.parquet(dir)
      Tables.events(spark, sfDir).select(col("value"))
        .join(tiers, col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("tier")).agg(count(lit(1)).as("n"))
    }
    val df = run()
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val opt = df.queryExecution.optimizedPlan
    val joins = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    val unions = opt.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }
    assert(joins.size == 2,
      s"expected exactly binned + fallback joins, got ${joins.size}:\n$opt")
    assert(unions.size == 1, s"expected one Union, got ${unions.size}")
    assert(opt.treeString.linesIterator.size < 60,
      s"plan blew up (${opt.treeString.linesIterator.size} lines) — " +
        "rule re-fired on its own output")
    spark.conf.set(RangeJoinRewrite.EnabledKey, "false")
    try {
      val want = run().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want)
    } finally spark.conf.unset(RangeJoinRewrite.EnabledKey)
  }

  test("the auto query equals the hand-binned range join row for row") {
    val auto = EventOps.rangeJoinAuto(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val manual = EventOps.rangeJoin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(auto === manual)
  }
}
