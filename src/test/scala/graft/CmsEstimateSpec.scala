package graft

import org.apache.spark.sql.functions._

import graft.functions.{CmsEstimate, TextAnalysis}

/** The Count-Min heavy-hitter query and the native cms_estimate probe:
  * the guarantee flag on real data, a forced-collision stress (tiny
  * width) proving the probe reads a real sketch and the one-sided bound
  * still holds, and the SQL registration.
  */
class CmsEstimateSpec extends SparkSpecBase {

  private val probe = CmsEstimate.probe _

  test("every heavy hitter is within the eps*N guarantee, est >= exact") {
    val rows = TextAnalysis.heavyHitters(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("within_bound")), r.toString)
      assert(r.getLong(r.fieldIndex("est_cnt")) >=
        r.getLong(r.fieldIndex("exact_cnt")), r.toString)
    }
  }

  test("a width-starved sketch overcounts but never undercounts") {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    // eps = 0.5 -> a handful of counters for a ~30-token vocabulary:
    // collisions are structurally unavoidable, so SOME estimate must
    // exceed its exact count — which proves the probe is reading sketch
    // counters, not echoing the exact aggregation — while the CMS
    // one-sided guarantee (never undercount) must still hold everywhere
    val sketch = toks.agg(
      expr("count_min_sketch(tok, 0.5d, 0.99d, 42)").as("sk"),
      count(lit(1)).as("n_total"))
    val rows = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("exact_cnt"))
      .crossJoin(broadcast(sketch))
      .select(col("tok"), col("exact_cnt"),
        probe(col("sk"), col("tok")).as("est_cnt"))
      .collect()
    assert(rows.forall(r => r.getLong(2) >= r.getLong(1)),
      "CMS must never undercount")
    assert(rows.exists(r => r.getLong(2) > r.getLong(1)),
      "a width-starved sketch over a wider vocabulary must collide")
  }

  test("cms_estimate is SQL-registered via the session extensions") {
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .createOrReplaceTempView("cms_toks")
    val row = spark.sql(
      """SELECT cms_estimate(sk, 'the') AS est FROM
        |  (SELECT count_min_sketch(tok, 0.001d, 0.99d, 42) AS sk
        |   FROM cms_toks)""".stripMargin).collect().head
    val exact = spark.sql(
      "SELECT count(*) FROM cms_toks WHERE tok = 'the'").collect().head
    assert(row.getLong(0) >= exact.getLong(0))
  }
}
