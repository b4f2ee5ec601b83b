package graft

import org.apache.spark.sql.functions._

import graft.plans.FpAggregateLint

/** The injected determinism lint: grouped FP sum/avg fails loudly when
  * enabled, exact-integer engine queries pass untouched, and windowed FP
  * accumulation (pinned traversal order) is deliberately exempt.
  */
class FpAggregateLintSpec extends SparkSpecBase {
  import spark.implicits._

  private def withLint[A](body: => A): A = {
    spark.conf.set(FpAggregateLint.ConfKey, "true")
    try body finally spark.conf.unset(FpAggregateLint.ConfKey)
  }

  test("grouped double sum and avg are rejected with the offending " +
      "expression named") {
    val df = Seq(("a", 1.5), ("a", 2.5), ("b", 0.1)).toDF("k", "v")
    withLint {
      val e1 = intercept[Exception] {
        df.groupBy("k").agg(sum("v")).collect()
      }
      assert(e1.getMessage.contains("sum") && e1.getMessage.contains("v"))
      val e2 = intercept[Exception] {
        df.groupBy("k").agg(avg("v")).collect()
      }
      assert(e2.getMessage.contains("avg"))
    }
    // disabled (default): the same plan runs
    assert(df.groupBy("k").agg(sum("v")).collect().length == 2)
  }

  test("exact-integer engine queries and windowed FP frames pass the lint") {
    withLint {
      // representative engine aggregates: integer cents / long counts
      assert(graft.operators.Relational
        .aggPricingSummary(spark, sfDir).collect().nonEmpty)
      assert(graft.operators.Warehouse.dqAudit(spark, sfDir)
        .collect().nonEmpty)
      // a windowed double sum has a pinned frame order — exempt
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("v")
        .rowsBetween(Long.MinValue, 0)
      val df = Seq(("a", 1.5), ("a", 2.5)).toDF("k", "v")
      assert(df.withColumn("r", sum("v").over(w)).collect().length == 2)
    }
  }

  test("ENGINE-WIDE: every query's optimized plan is free of grouped FP " +
      "aggregation AND of partition-wise cartesian products") {
    withLint {
      SparkEntry.queries.foreach { case (name, fn) =>
        // optimizedPlan triggers analysis + optimization (where the lint
        // fires) without executing the query
        val qe = fn(spark, sfDir).queryExecution
        assert(qe.optimizedPlan != null, name)
        // scale discipline: a nested-loop join is tolerable only as a
        // BROADCAST nested loop (one side bounded by design — the
        // documented brute-force/centroid arms); a partition-wise
        // CartesianProduct is row²-scaled on BOTH sides and must never
        // appear in any registered plan. Checked on the physical plan,
        // where the join strategy is decided.
        val physical = qe.executedPlan.toString
        assert(!physical.contains("CartesianProduct"),
          s"$name plans a partition-wise cartesian product:\n" +
            physical.take(1200))
      }
    }
  }
}
