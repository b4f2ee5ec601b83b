package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{GraftLog, GraftLogStats}

/** Per-column NDV statistics in the manifest → Spark's cost-based
  * optimizer: every connector write sketches each primitive column
  * (HLL registers in the stats JSON), the scan merges them across live
  * files and serves `columnStats().distinctCount` — the one optimizer
  * input `estimateStatistics`'s rows/bytes alone can't provide. This
  * spec pins (1) sketch accuracy and mergeability, (2) the catalyst
  * plumbing: under CBO the optimized plan's attributeStats carry the
  * connector's distinct counts, and (3) the payoff: a star join over
  * graftlog tables keeps the small-dim broadcast shape CBO picks on
  * ANALYZE'd native tables.
  */
class GraftLogCboSpec extends SparkSpecBase {

  private def conf = spark.sessionState.newHadoopConf()

  test("NdvSketch: deterministic, mergeable, within ~5% on 10k " +
      "distinct longs and strings; linear counting handles the small " +
      "range exactly enough") {
    import GraftLogStats.NdvSketch._
    val a = empty(); val b = empty()
    (0 until 5000).foreach(i => update(a, mix64(i.toLong)))
    (2500 until 10000).foreach(i => update(b, mix64(i.toLong)))
    val est = estimate(merge(a, b)).toDouble
    assert(math.abs(est - 10000) / 10000 < 0.08, est)
    val s = empty()
    (0 until 40).foreach(i =>
      update(s, hashBytes(s"key_$i".getBytes("UTF-8"))))
    val small = estimate(s)
    assert(small >= 36 && small <= 44, small) // small-range correction
    // duplicates change nothing: registers are max-only
    val s2 = s.clone()
    (0 until 40).foreach(i =>
      update(s2, hashBytes(s"key_$i".getBytes("UTF-8"))))
    assert(estimate(s2) === small)
  }

  test("the manifest carries per-column ndv registers for every " +
      "connector-written AND rewrite-written file; the scan's merged " +
      "distinctCount lands in the optimized plan's attributeStats " +
      "under CBO, with exact null counts beside it") {
    val root = Files.createTempDirectory("graft_cbo").toString
    // two appends: ids globally distinct, k repeats (50 distinct)
    Seq(0, 1).foreach { p =>
      spark.range(0, 2000).filter(pmod(col("id"), lit(2)) === p)
        .selectExpr("id", "id % 50 AS k",
          "IF(id % 10 = 0, CAST(NULL AS DOUBLE), CAST(id AS DOUBLE)) AS v")
        .write.format("graftlog").option("path", root)
        .option("schema", "id BIGINT, k BIGINT, v DOUBLE")
        .mode("append").save()
    }
    val st = GraftLog.liveState(conf, root, 2)
    assert(st.adds.nonEmpty)
    st.adds.foreach { r =>
      val cs = GraftLogStats.parseStats(r.stats.get).get
      assert(Set("id", "k", "v").subsetOf(cs.ndv.keySet), cs.ndv.keys)
    }
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val df = spark.read.format("graftlog").option("path", root).load()
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong == 2000L), stats.rowCount)
      val byName = stats.attributeStats.toSeq
        .map { case (a, cs) => (a.name, cs) }.toMap
      val idNdv = byName("id").distinctCount.get.toLong
      val kNdv = byName("k").distinctCount.get.toLong
      assert(math.abs(idNdv - 2000) < 200, idNdv)
      assert(kNdv >= 45 && kNdv <= 55, kNdv)
      assert(byName("v").nullCount.exists(_.toLong == 200L),
        byName("v").nullCount)
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
    // a ROW-LEVEL REWRITE's files sketch too (describeFile is the one
    // funnel): delete a key, then re-check the rewritten file's stats
    graft.sources.GraftLogOps.deleteFromLog(spark, root,
      col("id") === 7L)
    val st2 = GraftLog.liveState(conf, root,
      GraftLog.latestVersion(conf, root))
    st2.adds.foreach { r =>
      val cs = GraftLogStats.parseStats(r.stats.get).get
      assert(cs.ndv.contains("id"), r.file)
    }
  }

  test("the CBO payoff on a star join: with manifest NDV serving " +
      "column stats, a fact-dim-dim join over graftlog tables keeps " +
      "both small dims on broadcast build sides — the plan shape " +
      "ANALYZE'd native tables get") {
    val dir = Files.createTempDirectory("graft_cbo_star").toString
    def mk(name: String, rows: Long, expr: Seq[String],
        ddl: String): String = {
      val root = s"$dir/$name"
      spark.range(0, rows).selectExpr(expr: _*)
        .write.format("graftlog").option("path", root)
        .option("schema", ddl).mode("append").save()
      root
    }
    val fact = mk("fact", 50000,
      Seq("id AS f_id", "id % 100 AS d1_key", "id % 20 AS d2_key"),
      "f_id BIGINT, d1_key BIGINT, d2_key BIGINT")
    val d1 = mk("d1", 100, Seq("id AS d1_key", "id * 2 AS d1_attr"),
      "d1_key BIGINT, d1_attr BIGINT")
    val d2 = mk("d2", 20, Seq("id AS d2_key", "id * 3 AS d2_attr"),
      "d2_key BIGINT, d2_attr BIGINT")
    def t(root: String) =
      spark.read.format("graftlog").option("path", root).load()
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val prevJr = spark.conf.get("spark.sql.cbo.joinReorder.enabled",
      "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val q = t(fact).join(t(d1), "d1_key").join(t(d2), "d2_key")
        .groupBy(col("d1_attr")).agg(sum(col("d2_attr")).as("s"))
      val plan = q.queryExecution.executedPlan.toString
      val broadcasts = "BroadcastHashJoin".r
        .findAllMatchIn(plan).size
      assert(broadcasts === 2, plan.take(2500))
      // and it runs correctly end to end
      assert(q.count() === 100L)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevJr)
    }
  }

  test("a STRUCT-KEYED join keeps the broadcast shape: a small dim " +
      "joined through its nested leaf broadcasts (manifest rows/bytes " +
      "drive the size), and the nested leaf's NDV is served through " +
      "describe_stats — Spark's attributeStats speak top-level " +
      "attributes only, so that is the nested sketches' surface") {
    val dir = Files.createTempDirectory("graft_cbo_nest").toString
    val fact = s"$dir/factn"
    spark.range(0, 50000)
      .selectExpr("id AS f_id", "id % 64 AS jkey")
      .write.format("graftlog").option("path", fact)
      .option("schema", "f_id BIGINT, jkey BIGINT").mode("append").save()
    val dim = s"$dir/dimn"
    spark.range(0, 64)
      .selectExpr(
        "named_struct('key', id, 'attr', id * 2) AS meta")
      .write.format("graftlog").option("path", dim)
      .option("schema", "meta STRUCT<key: BIGINT, attr: BIGINT>")
      .mode("append").save()
    def t(root: String) =
      spark.read.format("graftlog").option("path", root).load()
    val q = t(fact).join(t(dim), col("jkey") === col("meta.key"))
      .agg(sum(col("meta.attr")).as("s"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(q.head().getLong(0) ===
      (0L until 50000L).map(i => (i % 64) * 2).sum)
    // nested-leaf NDV: merged sketch within tolerance via the
    // procedure surface
    val parent = dim.substring(0, dim.lastIndexOf('/'))
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", parent)
    val rows = spark.sql("CALL graft.system.describe_stats('dimn')")
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(math.abs(rows("meta.key").asInstanceOf[Long] - 64L) <= 10L)
  }
}
