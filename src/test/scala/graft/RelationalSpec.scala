package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Plan-shape guarantees for the scale-critical relational operators. */
class RelationalSpec extends SparkSpecBase {

  test("bucketed join: no exchange on the join key between scans and SMJ") {
    val df = Relational.bucketedJoin(spark, sfDir)
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(500))
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      "orders side should read pre-bucketed data without a shuffle")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      "lineitem side should read pre-bucketed data without a shuffle")
  }

  test("bucketed join result equals the plain-join computation") {
    val bucketed = Relational.bucketedJoin(spark, sfDir).collect()
    val plain = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        sum(graft.operators.RefTransforms.cents(
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"))
      .orderBy(col("o_orderstatus")).collect()
    assert(bucketed.sameElements(plain))
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    val plan = Relational.topK(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("approx distinct is self-validating: every group inside the 5% bound") {
    val rows = Relational.aggApproxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"${r.getAs[String]("l_returnflag")}: approx=" +
          s"${r.getAs[Long]("approx_parts")} exact=" +
          s"${r.getAs[Long]("exact_parts")} err=${r.getAs[Double]("rel_err")}")
    }
  }
}
