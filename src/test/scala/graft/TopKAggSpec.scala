package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKPairs
import graft.operators.{PipelineQueries, Relational}

/** The bounded-heap grouped top-k aggregate and the range-clustered
  * layout: result parity with the window formulation, the distributed
  * merge/serialize path, null handling, and the plan/layout properties
  * that carry the scale claims.
  */
class TopKAggSpec extends SparkSpecBase {
  import spark.implicits._

  private def windowTop3(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("v").desc, col("id").asc)
    df.select(col("g"), col("id"), col("v"),
        row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= 3)
      .select(col("g"), col("rnk"), col("id"), col("v"))
  }

  private def heapTop3(df: org.apache.spark.sql.DataFrame) =
    TopKPairs.explodeRanked(
      df.groupBy(col("g"))
        .agg(TopKPairs.topKPairs(col("v"), col("id"), 3).as("top")),
      Seq("g"), "id", "v")
      .select(col("g"), col("rnk"), col("id"), col("v"))

  test("grouped top-k equals the window formulation across many partitions") {
    // 40 partitions of a 2000-row frame: every partition contributes a
    // partial heap, so this exercises update, SERIALIZE (partial results
    // cross the exchange), deserialize, and merge — not just update+eval
    val df = spark.range(2000)
      .select((col("id") % 7).as("g"), col("id"),
        ((col("id") * 2654435761L) % 100003L).as("v"))
      .repartition(40)
    val got = heapTop3(df).orderBy(col("g"), col("rnk")).collect()
    val want = windowTop3(df).orderBy(col("g"), col("rnk")).collect()
    assert(got.sameElements(want))
  }

  test("ties break toward the smaller id, matching the window tie-break") {
    val df = Seq((1L, 10L, 5L), (1L, 3L, 5L), (1L, 7L, 5L), (1L, 1L, 5L))
      .toDF("g", "id", "v")
    val got = heapTop3(df).orderBy(col("rnk")).collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 3L, 7L))
  }

  test("null ord or id rows are ignored; all-null group yields no rows") {
    val df = Seq(
      (1L, Some(1L), Some(9L)), (1L, Some(2L), None), (1L, None, Some(8L)),
      (2L, None, None))
      .toDF("g", "id", "v")
    val got = heapTop3(df).collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 1L && got.head.getLong(2) == 1L)
  }

  test("Long.MinValue ord is handled (no negation overflow)") {
    val df = Seq((1L, 1L, Long.MinValue), (1L, 2L, 0L), (1L, 3L, Long.MaxValue))
      .toDF("g", "id", "v")
    val got = heapTop3(df).orderBy(col("rnk")).collect()
    assert(got.map(_.getLong(3)).toSeq ==
      Seq(Long.MaxValue, 0L, Long.MinValue))
  }

  test("grouped top-k rides ObjectHashAggregate with a partial pass " +
      "(map-side bound) and no window sort") {
    val df = Relational.topKGroup(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(!plan.contains("Window"), "must not fall back to a window sort")
    // partial + final: the aggregate appears twice around the exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(800))
  }

  test("cluster layout: per-file shipdate ranges are disjoint") {
    val dir = PipelineQueries.clusterLayoutDir(spark, sfDir)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("l_shipdate")).as("lo"), max(col("l_shipdate")).as("hi"))
      .orderBy(col("lo"))
      .collect()
    assert(ranges.length > 1, "range partitioning should emit several files")
    // STRICTLY after: b.lo == a.hi would mean two files share a date and
    // both their row groups survive a point predicate on it — the exact
    // overlap the zone-map-skipping claim rules out
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(b.getDate(1).after(a.getDate(2)),
        s"file ranges overlap: ${a.mkString(",")} vs ${b.mkString(",")}")
    }
  }

  test("cluster layout read pushes the range predicate to the scan") {
    val plan = PipelineQueries.clusterLayout(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [GreaterThanOrEqual(l_shipdate," +
      "1995-01-01), LessThan(l_shipdate,1995-04-01)]"), plan.take(1200))
  }
}
