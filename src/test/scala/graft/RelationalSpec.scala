package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Plan-shape guarantees for the scale-critical relational operators. */
class RelationalSpec extends SparkSpecBase {

  test("AQE skew-join splits the pathological key and matches the plain " +
      "join result — the no-code alternative to manual salting") {
    import spark.implicits._
    // the salted-join scenario (EventOps.skewJoin) in miniature: one key
    // carries ~all rows, so a plain shuffle join funnels them into one
    // reducer; with AQE skew handling ON (and thresholds lowered to demo
    // scale — production keeps the 256 MB default) the runtime splits
    // that partition instead of anyone rewriting the query
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 99% of fact rows carry one key; k1..k10 get 200 rows each. The
      // consumer is a GLOBAL aggregate (partial aggregation works under
      // any partitioning) — a groupBy on the join key would REQUIRE hash
      // partitioning on it and AQE would rightly decline to split.
      val fact = spark.range(200000L)
        .select(
          when(col("id") % 1000L < 990L, lit("hot"))
            .otherwise(concat(lit("k"), (col("id") % 1000L - 989L)
              .cast("string"))).as("k"),
          col("id").as("v"))
      val dim = (Seq(("hot", 0L)) ++ (1 to 10).map(i => (s"k$i", i.toLong)))
        .toDF("k", "w")
      val joined = fact.join(dim.hint("merge"), Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("chk"))
      val row = joined.collect().head
      // AQE actually split the hot partition (the skew reader is in the
      // finalized adaptive plan)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"no skew split in plan:\n${plan.take(1200)}")
      // and the result equals the logical join, unchanged by the split:
      // every fact row matches exactly once; sum(w) adds 200·Σi = 11000
      assert(row.getLong(0) === 200000L)
      assert(row.getLong(1) === 19999900000L + 11000L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ORC pushdown: the value-range filter reaches the ORC scan") {
    val df = graft.operators.EtlQueries.orcPushdown(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [GreaterThan(price_cents,10000000)"),
      plan.take(1500))
  }

  test("tpch-q3 shape: per-table predicates pushed, top-10 is " +
      "TakeOrderedAndProject, no global sort") {
    val df = Relational.tpchQ3(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    assert(!plan.contains("Sort ["), "global sort leaked into the plan")
    assert(plan.contains("PushedFilters: [EqualTo(c_mktsegment,BUILDING)"),
      "segment filter not pushed")
  }

  test("tpch-q18 shape: fact table aggregated exactly once (no semi-join " +
      "re-aggregation), top-100 is TakeOrderedAndProject, rows populated") {
    val df = Relational.tpchQ18(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every returned order genuinely clears the quantity threshold
    rows.foreach(r =>
      assert(r.getLong(5) > Relational.Q18QtyCentsThreshold))
    // aggregate-then-join-back: lineitem is aggregated ONCE — the naive
    // `o_orderkey IN (SELECT … HAVING)` formulation re-aggregates the
    // fact table after the join; pin the plan to a single Aggregate
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    assert(aggs.size == 1, s"expected one Aggregate, got ${aggs.size}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("tpch-q13 shape: orders pre-aggregated below the outer join, " +
      "zero-order customers preserved, distribution sums to the inputs") {
    val df = Relational.tpchQ13(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the customer-preserving join must consume the per-custkey count
    // table, not raw orders: the outer join's right subtree carries the
    // first Aggregate (join moves key-count pairs, not order rows)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.size == 1)
    assert(joins.head.joinType.sql == "LEFT OUTER")
    val rightAggs = joins.head.right.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    assert(rightAggs.size == 1,
      "per-custkey pre-aggregation must sit below the outer join")
    // conservation: Σ custdist = |customer|, Σ c_count·custdist =
    // non-urgent orders whose customer exists
    val nCust = Tables.customer(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum === nCust)
    val nOrd = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === nOrd)
  }

  test("tpch-q21 shape: EXISTS/NOT EXISTS decorrelate to one LeftSemi + " +
      "one LeftAnti hash join and match the set-algebra twin") {
    val df = Relational.tpchQ21(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan
    val optS = opt.toString
    assert(!optS.contains("exists#") || !optS.contains("Subquery"),
      optS.take(1000))
    val joinTypes = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.joinType.sql }
    assert(joinTypes.count(_ == "LEFT SEMI") == 1, joinTypes.toString)
    assert(joinTypes.count(_ == "LEFT ANTI") == 1, joinTypes.toString)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.nonEmpty)
    // set-algebra twin: per order, n_supp = distinct suppliers and
    // n_rsupp = distinct suppliers with a returned line; a qualifying l1
    // row needs n_supp ≥ 2 (someone else supplied) and n_rsupp = 1 (the
    // returned set is exactly {l1.suppkey}, since l1 itself is returned)
    val fact = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val ordStats = fact.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_rsupp"))
    val want = fact.filter(col("l_returnflag") === "R")
      .join(ordStats.filter(col("n_supp") >= 2 && col("n_rsupp") === 1),
        Seq("l_orderkey"))
      .join(Tables.orders(spark, sfDir)
        .filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sfDir)
        .filter(col("n_name").isin(Relational.Q21Nations: _*)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("tpch-q17 shape: the fact-side correlated lateral aggregate " +
      "decorrelates to ONE pre-aggregated partkey join (no subquery " +
      "survives, no per-row re-execution) and matches the manual twin") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.catalyst.expressions.PlanExpression
    val df = Relational.tpchQ17(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(1) > 0, "no qualifying small-quantity lines")
    val opt = df.queryExecution.optimizedPlan
    // decorrelation is total: no subquery expression of any kind remains
    val subqueries = opt.collect {
      case p if p.expressions.exists(_.exists(_.isInstanceOf[PlanExpression[_]])) => p
    }
    assert(subqueries.isEmpty, s"subquery survived:\n${opt.toString.take(800)}")
    // the row-scaled correlated aggregate became EXACTLY ONE grouped
    // moments aggregate (count + Σqty in the same node — two scalar
    // subqueries would leave two and scan lineitem twice); the only other
    // grouped Aggregate is the function-less domain distinct the
    // decorrelator adds for empty-group preservation
    val grouped = opt.collect {
      case a: Aggregate if a.groupingExpressions.nonEmpty &&
        a.aggregateExpressions.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression])) => a
    }
    assert(grouped.size == 1,
      s"expected one grouped moments Aggregate, got ${grouped.size}")
    // semantic twin: manual pre-aggregate + join-back, exact integers
    val li = Tables.lineitem(spark, sfDir)
    val moments = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("long")).as("sq"))
    val want = li
      .join(Tables.part(spark, sfDir)
        .filter(col("p_brand") === "Brand#1" && col("p_size") <= 10),
        col("l_partkey") === col("p_partkey"))
      .join(moments, Seq("l_partkey"))
      .filter(col("l_quantity").cast("long") * 5 * col("cnt") < col("sq"))
      .agg(expr("CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) DIV 7 AS BIGINT)"),
        count(lit(1)))
      .collect().head
    assert(rows.head.getLong(0) === want.getLong(0))
    assert(rows.head.getLong(1) === want.getLong(1))
  }

  test("dpp star: the dim attribute filter reaches the fact scan as a " +
      "dynamicpruning PartitionFilter and partitions are actually skipped") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = graft.operators.PipelineQueries.dppStar(spark, sfDir)
    val rows = df.collect()
    // H2 months only — the dim filter did its job semantically
    assert(rows.map(_.getLong(0)).toSet.subsetOf((7L to 12L).toSet))
    assert(rows.nonEmpty)
    // plan half: the fact scan carries a runtime dynamicpruning subquery
    // on the partition columns (no static predicate exists — the filter
    // is on the dim's half_label attribute)
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE wraps materialized subtrees in QueryStageExec leaves — recurse
    // through them or the fact scan is invisible to collect
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.flatMap {
        case f: FileSourceScanExec => Seq(f)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case _ => Nil
      }
    val factScan = scans(exec).find(_.relation.location.rootPaths
      .exists(_.toString.contains("orders_part")))
      .getOrElse(fail(s"fact scan not found in:\n${exec.toString.take(1200)}"))
    assert(factScan.partitionFilters.exists(_.toString.contains("dynamicpruning")),
      s"no dynamicpruning filter on the fact scan: ${factScan.partitionFilters}")
    // audit half (the q_bloom_skip discipline): the scan READ fewer files
    // than the layout holds — pruning executed, not just planned
    val layout = graft.operators.PipelineQueries
      .partitionedOrdersDir(spark, sfDir)
    def parquetFiles(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(parquetFiles).sum
      else if (f.getName.endsWith(".parquet")) 1L else 0L
    val totalFiles = parquetFiles(new java.io.File(layout))
    val readFiles = factScan.metrics("numFiles").value
    assert(readFiles > 0 && readFiles < totalFiles,
      s"no skip: read $readFiles of $totalFiles files")
  }

  test("winsorize: broadcast-back clamp keeps every row, bounds hold, " +
      "and the scaled position is inside [0, 1e6]") {
    val df = Relational.winsorize(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == Tables.lineitem(spark, sfDir).count())
    // the percentile table must broadcast — the row stream never shuffles
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1000))
    rows.foreach { r =>
      val (q, c, ppm) = (r.getDouble(3), r.getDouble(4), r.getLong(5))
      assert(ppm >= 0L && ppm <= 1000000L, r.toString)
      // a row the clamp actually moved must sit at a band boundary
      assert(c == q || ppm <= 1L || ppm >= 999999L, r.toString)
    }
    // clamping only ever moves values inward: clamped is between the
    // group min and max of the raw quantity
    val byFlag = rows.groupBy(_.getString(2))
    byFlag.foreach { case (_, rs) =>
      val qs = rs.map(_.getDouble(3))
      val cs = rs.map(_.getDouble(4))
      assert(cs.min >= qs.min && cs.max <= qs.max)
      // tails are actually clipped: some rows must differ
      assert(rs.exists(r => r.getDouble(3) != r.getDouble(4)))
    }
  }

  test("argmax via struct max is one aggregate (no window, no sort " +
      "before the agg) and matches the row_number twin") {
    val df = Relational.argmaxOrder(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty, "argmax must not compile to a window")
    assert(opt.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size == 1)
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").desc,
        col("o_orderkey").desc)
    val want = Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
      .orderBy(col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("association rules: supports, confidences and lift rationals " +
      "match a sequential market-basket recomputation") {
    val got = Relational.associationRules(spark, sfDir).collect()
    assert(got.nonEmpty && got.length <= Relational.AssocTopK)
    val baskets = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = Tables.orders(spark, sfDir).count()
    val sup = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairSup = baskets.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { r =>
      val (p1, p2) = (r.getLong(0), r.getLong(1))
      val sab = pairSup((p1, p2))
      assert(r.getLong(2) == sab && sab >= Relational.AssocMinSupport)
      assert(r.getLong(3) == sup(p1) && r.getLong(4) == sup(p2))
      assert(r.getLong(5) == sab * 1000000L / sup(p1))
      assert(r.getLong(6) == sab * 1000000L / sup(p2))
      assert(r.getLong(7) == sab * nOrders)
      assert(r.getLong(8) == sup(p1) * sup(p2))
    }
    // the limit keeps the strongest rules: every returned support is ≥
    // every excluded pair's support would require a full sort; instead
    // pin the ordering contract on the returned prefix
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) > b.getLong(2) ||
          (a.getLong(2) == b.getLong(2) && a.getLong(5) >= b.getLong(5)))
      case _ =>
    }
  }

  test("recursive CTE compiles to UnionLoop equi-join iteration and " +
      "walks the full derived hierarchy") {
    val df = Relational.recursiveHierarchy(spark, sfDir)
    val rows = df.collect()
    // level sets of the binary hierarchy: depth d holds keys in
    // [2^d, 2^(d+1)) clipped to the key domain — counts must double
    // until the last (possibly partial) level, and every key except the
    // root-orphan 0 is reached exactly once
    val total = rows.map(_.getLong(1)).sum
    val nCust = Tables.customer(spark, sfDir).count()
    assert(total === nCust - 1) // key 0 is its own parent, never reached
    rows.dropRight(1).foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) === (1L << d), s"depth $d not a full level")
      assert(r.getLong(2) === (1L << d) && r.getLong(3) === (2L << d) - 1)
    }
    assert(df.queryExecution.optimizedPlan.toString.contains("UnionLoop"),
      "recursion did not compile to UnionLoop")
  }

  test("lateral top-n decorrelates to a WindowGroupLimit rank join — " +
      "no cartesian, no per-row subquery — and matches the window twin") {
    val df = Relational.lateralTopN(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("WindowGroupLimit"), opt.take(1000))
    assert(!opt.contains("CartesianProduct"), "lateral fell back to O(n²)")
    // parity with the directly-written window form
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
    val want = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
          .as("price_cents"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("price_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("cdcApply: deleted keys vanish, the last update wins, audit " +
      "op-counts are exact, and one hash exchange serves the whole apply") {
    val df = Relational.cdcApply(spark, sfDir)
    val got = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(1) * 100 + 0.5).toLong)
      .toMap
    assert(got.keySet === base.keySet.filterNot(_ % 7 == 0))
    base.foreach { case (k, p) =>
      if (k % 7 == 0) assert(!got.contains(k))
      else if (k % 3 == 0) assert(got(k) === ((p + 1000L, 2L)), s"key $k")
      else assert(got(k) === ((p, 1L)), s"key $k")
    }
    // count in the FINAL plan only — the AQE toString appends the initial
    // plan too, which would double-count every exchange
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      plan.take(1200))
  }

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

  test("star join: every dimension broadcasts, the date filter reaches " +
      "the orders scan, and the fact pair is the only non-broadcast join") {
    val df = Relational.starJoin(spark, sfDir)
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    // 5 joins total: 4 dimension joins broadcast, lineitem⋈orders is the
    // one join allowed to shuffle (AQE may still broadcast it at this
    // test scale, so assert the broadcast COUNT, not a shuffle)
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bhj >= 4, s"expected >=4 broadcast joins, got $bhj")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
    // the date window is pushed into the orders parquet scan
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(o_orderdate"),
      "o_orderdate range must reach the parquet scan")
    assert(plan.contains("EqualTo(r_name,ASIA)"),
      "region filter must reach the parquet scan")
  }

  test("correlated scalar subqueries decorrelate to one aggregate join " +
      "and match the window-based equivalent") {
    val df = graft.operators.Relational.correlatedSubquery(spark, sfDir)
    // decorrelation: the optimized plan contains no subquery expression
    // (per-row re-execution) — both scalar subqueries became aggregates
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("scalar-subquery"), opt.take(800))
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val want = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("cents"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("c_nationkey")))
      .withColumn("s", sum(col("cents")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("c_nationkey")))
      .filter(col("cents") * col("n") > col("s"))
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_above"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got == want && got.nonEmpty)
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

  test("shuffle joins are eligible for runtime bloom-filter pruning " +
      "(fires once the 100TB-scale size thresholds are met)") {
    // the 10 GB application-side threshold exists so the optimization only
    // pays off at real scale; lowering it (and removing the broadcast
    // escape hatch) on test data proves OUR join shape qualifies — a
    // disqualifying pattern (expression on the key, missing selective
    // filter) would leave the plan bloom-free no matter the thresholds
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val filteredOrders = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = Tables.lineitem(spark, sfDir)
        .join(filteredOrders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter"),
        "runtime bloom filter was not injected into the probe side")
      // and the pruned plan still computes the right answer
      val expected = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderpriority") === "1-URGENT")
        .count()
      assert(joined.collect().head.getAs[Long]("n") === expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("parquet footer-stats aggregate pushdown: whole-table MIN/MAX/COUNT " +
      "answered from metadata, values unchanged") {
    // the V2 parquet reader can answer un-grouped MIN/MAX/COUNT from row-
    // group statistics without scanning data — at 100 TB that is the
    // difference between a metadata read and a full-table scan. V1 is the
    // default reader, so the spec opts this one read into V2 + pushdown.
    val confs = Seq(
      "spark.sql.parquet.aggregatePushdown" -> "true",
      "spark.sql.sources.useV1SourceList" -> "")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val agg = Tables.lineitem(spark, sfDir)
        .agg(min(col("l_orderkey")).as("min_k"), max(col("l_orderkey")).as("max_k"),
          count(lit(1)).as("n"))
      assert(agg.queryExecution.executedPlan.toString
        .contains("PushedAggregation: [MIN(l_orderkey), MAX(l_orderkey), COUNT(*)]"))
      val row = agg.collect().head
      val (mn, mx, n) = (row.getAs[Long]("min_k"), row.getAs[Long]("max_k"),
        row.getAs[Long]("n"))
      confs.foreach { case (k, _) => spark.conf.unset(k) } // plain V1 scan
      val plain = Tables.lineitem(spark, sfDir)
        .agg(min(col("l_orderkey")), max(col("l_orderkey")), count(lit(1)))
        .collect().head
      assert((mn, mx, n) === (plain.getLong(0), plain.getLong(1), plain.getLong(2)))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("approx quantiles are self-validating: every probe's rank fraction " +
      "inside the 1/accuracy bound") {
    val rows = Relational.approxQuantiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"))
      // quantiles are ordered by construction
      assert(r.getAs[Double]("q25") <= r.getAs[Double]("q50"))
      assert(r.getAs[Double]("q50") <= r.getAs[Double]("q75"))
    }
  }

  test("snapshot diff classifies exactly the keys the snapshots disagree on") {
    val keys = Tables.orders(spark, sfDir)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val got = Relational.snapshotDiff(spark, sfDir).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[String]("change_type"))
      .toMap
    val expected = keys.flatMap { k =>
      val inA = k % 10 != 0
      val inB = k % 13 != 0
      (inA, inB) match {
        case (false, true)              => Some(k -> "insert")
        case (true, false)              => Some(k -> "delete")
        case (true, true) if k % 7 == 0 => Some(k -> "update")
        case _                          => None
      }
    }.toMap
    assert(got === expected)
    // updates surface the reclassification, old value intact
    Relational.snapshotDiff(spark, sfDir)
      .filter(col("change_type") === "update").collect().foreach { r =>
        assert(r.getAs[String]("new_priority") === "9-RECLASS")
        assert(r.getAs[String]("old_priority") !== "9-RECLASS")
      }
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

  test("Q15: the returned suppliers are exactly the revenue-max ties over " +
      "a recomputed windowed revenue table") {
    val got = Relational.tpchQ15(spark, sfDir).collect()
    assert(got.nonEmpty)
    val rev = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= Relational.Q15Start &&
        col("l_shipdate") < Relational.Q15End)
      .groupBy(col("l_suppkey"))
      .agg(sum(expr(
        "CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)" +
          " AS BIGINT)")).as("rev"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mx = rev.values.max
    val wantKeys = rev.filter(_._2 == mx).keySet
    assert(got.map(_.getLong(0)).toSet === wantKeys)
    got.foreach(r => assert(r.getLong(2) === mx))
  }

  test("Q22: membership rechecks — above slice average, no urgent order") {
    val got = Relational.tpchQ22(spark, sfDir).collect()
    assert(got.nonEmpty)
    val cust = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("bal"))
      .collect().map(r => (r.getLong(0), r.getInt(1) % Relational.Q22CodeMod,
        r.getLong(2)))
      .filter(t => Relational.Q22Codes.contains(t._2))
    val urgent = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val pos = cust.map(_._3).filter(_ > 0)
    val (nPos, sumPos) = (pos.length.toLong, pos.sum)
    val eligible = cust.filter(t => t._3 * nPos > sumPos)
      .filterNot(t => urgent.contains(t._1))
    val want = eligible.groupBy(_._2).view
      .mapValues(ts => (ts.length.toLong, ts.map(_._3).sum)).toMap
    assert(got.length === want.size)
    got.foreach { r =>
      val (n, tot) = want(r.getInt(0))
      assert(r.getLong(1) === n && r.getLong(2) === tot, r.toString)
    }
  }

  test("skyline equals brute-force Pareto dominance and plans without a " +
      "cartesian/nested-loop join") {
    val df = Relational.skyline(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      plan.take(1200))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    val all = graft.Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("pc"),
        col("p_size"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val want = all.filter { a =>
      !all.exists(b => b._2 <= a._2 && b._3 >= a._3 &&
        (b._2 < a._2 || b._3 > a._3))
    }.map(t => (t._1, t._2, t._3)).toSet
    assert(got.toSet === want)
    // frontier is a strict staircase once collapsed to distinct prices:
    // among frontier points, higher price never buys a smaller-or-equal
    // max size
    val stair = got.groupBy(_._2).view.mapValues(_.map(_._3).max)
      .toSeq.sortBy(_._1).map(_._2)
    stair.sliding(2).foreach {
      case Seq(a, b) => assert(a < b, s"non-strict staircase: $stair")
      case _         => ()
    }
  }

  test("fk audit: six relationships, child counts match the tables, zero " +
      "orphans on the driver's referentially-intact data") {
    val got = Relational.fkAudit(spark, sfDir).collect()
    assert(got.length === 6)
    val counts = Map(
      "lineitem"  -> graft.Tables.lineitem(spark, sfDir).count(),
      "orders"    -> graft.Tables.orders(spark, sfDir).count(),
      "customer"  -> graft.Tables.customer(spark, sfDir).count(),
      "nation"    -> graft.Tables.nation(spark, sfDir).count())
    got.foreach { r =>
      val child = r.getString(0).split("\\.").head
      assert(r.getLong(1) === counts(child), r.toString)
      assert(r.getLong(2) === 0L && r.getLong(3) === 0L, r.toString)
    }
  }

  test("market share: region slice never exceeds the total and the ppm " +
      "division is exact") {
    val got = Relational.marketShare(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (tot, reg, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(reg >= 0L && reg <= tot)
      assert(ppm === (BigInt(reg) * 1000000 / tot).toLong, r.toString)
    }
    // totals recheck against a direct yearly revenue aggregate
    val want = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("y"))
      .agg(sum(expr(
        "CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)" +
          " AS BIGINT)")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.map(_.getLong(0)).toSet === want.keySet)
    got.foreach(r => assert(r.getLong(1) === want(r.getLong(0))))
  }

  test("grouped mode matches the window-based reference with the smallest-" +
      "priority tie-break, and plans with no window exchange") {
    val df = Relational.groupedMode(spark, sfDir)
    // the whole point of the struct-max: no Window operator anywhere
    assert(!df.queryExecution.executedPlan.toString.contains("Window"))
    val got = df.collect()
    assert(got.nonEmpty)
    val counted = graft.Tables.customer(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority")).count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = counted.groupBy(_._1).view.mapValues { rows =>
      rows.minBy(t => (-t._3, t._2))
    }.toMap
    assert(got.length === want.size)
    got.foreach { r =>
      val (_, prio, cnt) = want(r.getString(0))
      assert(r.getString(1) === prio && r.getLong(2) === cnt, r.toString)
    }
  }

  test("tpch-q2 shape: ONE fact scan + window min (no CTE double-build), " +
      "top-100 is TakeOrderedAndProject, and the rows equal the " +
      "correlated-min semantics") {
    val df = Relational.tpchQ2(spark, sfDir)
    val ex = df.queryExecution.executedPlan.toString
    // the window rewrite's whole point: lineitem is scanned exactly once
    // (the correlated form inlines the cost CTE twice — two fact builds)
    assert("lineitem\\.parquet".r.findAllIn(ex).size == 1, ex.take(800))
    assert(ex.contains("Window"), ex.take(800))
    assert(ex.contains("TakeOrderedAndProject"), ex.take(800))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(4)))
    assert(got.nonEmpty)
    // correlated-min twin: per-part min over the grouped cost table,
    // keeping ties — computed with a plain groupBy + join-back
    val eu = graft.Tables.supplier(spark, sfDir)
      .join(graft.Tables.nation(spark, sfDir),
        col("n_nationkey") === col("s_nationkey"))
      .join(graft.Tables.region(spark, sfDir)
        .filter(col("r_name") === "EUROPE"),
        col("r_regionkey") === col("n_regionkey"))
    val cost = graft.Tables.lineitem(spark, sfDir)
      .join(eu, col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("l_partkey"), col("s_name"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("cost_cents"))
    val minCost = cost.groupBy(col("l_partkey"))
      .agg(min(col("cost_cents")).as("min_cost"))
    val want = cost.join(minCost, Seq("l_partkey"))
      .filter(col("cost_cents") === col("min_cost"))
      .join(graft.Tables.part(spark, sfDir).filter(col("p_size") <= 10),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("s_name"), col("cost_cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (-t._3, t._1, t._2)).take(100)
    assert(got.toSeq == want.toSeq)
  }

  test("tpch-q11 shape: the fraction-of-total scalar is ONE uncorrelated " +
      "subquery stage (never per-row), and every kept part clears the " +
      "cross-multiplied threshold") {
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    val df = Relational.tpchQ11(spark, sfDir)
    val subs = df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case s: ScalarSubquery => s })
    }.flatten
    assert(subs.size == 1, s"expected one scalar subquery, got $subs")
    // uncorrelated — no outer references, so it runs ONCE as its own
    // stage and broadcasts into the filter, never per input row
    assert(subs.head.outerAttrs.isEmpty, subs.head.toString)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    // manual twin: per-part slice values + grand total, exact cents
    val vals = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.supplier(spark, sfDir),
        col("s_suppkey") === col("l_suppkey"))
      .join(graft.Tables.nation(spark, sfDir)
        .filter(col("n_name").isin(Relational.Q11Nations: _*)),
        col("n_nationkey") === col("s_nationkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = vals.values.map(BigInt(_)).sum
    val want = vals.filter { case (_, v) => BigInt(v) * 10000 > total }
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (k, v) => assert(v == want(k)) }
  }

  test("tpch-q16 shape: NOT IN plans as a null-aware LEFT ANTI join and " +
      "matches the blacklist-filtered distinct count") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = Relational.tpchQ16(spark, sfDir)
    val antis = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType.sql == "LEFT ANTI" => j }
    assert(antis.size == 1)
    // null-awareness is the condition's IsNull disjunct — a plain
    // left_anti (isin-negation) would be a bare equality
    assert(antis.head.condition.exists(_.toString.toLowerCase
      .contains("isnull")), antis.head.condition.toString)
    val got = df.collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got.nonEmpty)
    val black = graft.Tables.supplier(spark, sfDir)
      .filter(col("s_name").like("%7"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val want = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.part(spark, sfDir)
        .filter(col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)),
        col("p_partkey") === col("l_partkey"))
      .filter(!col("l_suppkey").isin(black.toSeq: _*))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got == want)
  }

  test("tpch-q19 shape: the OR-of-conjunctions pushes the derived " +
      "disjunction into BOTH parquet scans") {
    val df = Relational.tpchQ19(spark, sfDir)
    val scans = df.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("PushedFilters"))
    val partScan = scans.find(_.contains("p_brand")).getOrElse("")
    val factScan = scans.find(_.contains("l_quantity")).getOrElse("")
    assert(partScan.contains("Or(") &&
      partScan.contains("EqualTo(p_brand,Brand#12)"), partScan)
    // the quantity disjunction reaches PushedFilters (not just
    // DataFilters) because the band compares the raw double — a bigint
    // cast would block parquet row-group skipping on the fact side
    assert(factScan.contains("PushedFilters: [Or(") ||
      factScan.contains("Or(Or(And(GreaterThanOrEqual(l_quantity"),
      factScan)
    val row = df.collect().head
    assert(row.getLong(0) > 0 && row.getLong(1) > 0)
  }

  test("tpch-q20 shape: both rewrites compose — the correlated total " +
      "pre-aggregates (no surviving subquery) under ONE LeftSemi") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.catalyst.expressions.PlanExpression
    val df = Relational.tpchQ20(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan
    val leftover = opt.collect {
      case p if p.expressions.exists(_.exists(
        _.isInstanceOf[PlanExpression[_]])) => p }
    assert(leftover.isEmpty, s"subquery survived:\n${opt.toString.take(600)}")
    val joinTypes = opt.collect { case j: Join => j.joinType.sql }
    assert(joinTypes.count(_ == "LEFT SEMI") == 1, joinTypes.toString)
    val grouped = opt.collect {
      case a: Aggregate if a.groupingExpressions.nonEmpty => a }
    assert(grouped.size == 2, s"expected ps-build + per-part total, " +
      s"got ${grouped.size} grouped aggregates")
    // semantic twin: dominant (part, supplier) pairs by plain aggregation
    val li = graft.Tables.lineitem(spark, sfDir)
    val ps = li.join(graft.Tables.part(spark, sfDir)
        .filter(col("p_type") === "SMALL"),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("q_ps"))
    val tot = li.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("q_p"))
      .withColumnRenamed("l_partkey", "t_partkey")
    val domSupp = ps.join(tot, col("l_partkey") === col("t_partkey"))
      .filter(col("q_ps") * 2 > col("q_p"))
      .select(col("l_suppkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val want = graft.Tables.supplier(spark, sfDir)
      .filter(col("s_suppkey").isin(domSupp.toSeq: _*))
      .join(graft.Tables.nation(spark, sfDir),
        col("n_nationkey") === col("s_nationkey"))
      .select(col("s_name"), col("n_name"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val got = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSet == want && got.length == want.size)
  }

  test("corr matrix: ONE fact scan feeds all ten moments, the rationals " +
      "satisfy Cauchy-Schwarz, and the recovered correlation matches " +
      "Spark's float corr()") {
    val df = Relational.corrMatrix(spark, sfDir)
    val ex = df.queryExecution.executedPlan.toString
    assert("lineitem\\.parquet".r.findAllIn(ex).size == 1,
      "moments must come from a single pass")
    val rows = df.collect()
    assert(rows.length == 6)
    val ns = rows.map(_.getLong(2)).toSet
    assert(ns.size == 1 && ns.head > 0)
    rows.foreach { r =>
      val (num, vx, vy) = (BigInt(r.getString(3)),
        BigInt(r.getString(4)), BigInt(r.getString(5)))
      assert(vx > 0 && vy > 0, r.toString)
      assert(num * num <= vx * vy, s"Cauchy-Schwarz violated: $r")
    }
    // cross-check one pair against the built-in float estimator
    val qp = rows.find(r =>
      r.getString(0) == "price" && r.getString(1) == "qty")
      .orElse(rows.find(r =>
        r.getString(0) == "qty" && r.getString(1) == "price")).get
    val wantCorr = graft.Tables.lineitem(spark, sfDir)
      .agg(corr(col("l_quantity"),
        floor(col("l_extendedprice") * 100 + lit(0.5))).as("c"))
      .collect().head.getDouble(0)
    val gotCorr = {
      val num = BigDecimal(qp.getString(3))
      val den = (BigDecimal(qp.getString(4)) *
        BigDecimal(qp.getString(5))).bigDecimal.sqrt(
        java.math.MathContext.DECIMAL64)
      (num / BigDecimal(den)).toDouble
    }
    assert(math.abs(gotCorr - wantCorr) < 1e-6, s"$gotCorr vs $wantCorr")
  }

  test("tpch-q4 shape: the EXISTS under the grouped count is ONE LeftSemi " +
      "(no double-counting of multi-line orders)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = Relational.tpchQ4(spark, sfDir)
    val joinTypes = df.queryExecution.optimizedPlan.collect {
      case j: Join => j.joinType.sql }
    assert(joinTypes == Seq("LEFT SEMI"), joinTypes.toString)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.values.sum > 0)
    // twin: distinct qualifying orders via inner join + distinct
    val want = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") < "1996-04-01")
      .join(graft.Tables.lineitem(spark, sfDir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("tpch-q5 shape: the nation cycle folds into the supplier join " +
      "condition (no post-join filter) and matches the filter twin") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val df = Relational.tpchQ5(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan
    // the c_nationkey = s_nationkey cycle must ride a Join condition,
    // never survive as a Filter above one
    val badFilters = opt.collect {
      case f: Filter if f.condition.toString.contains("c_nationkey") &&
        f.condition.toString.contains("s_nationkey") => f }
    assert(badFilters.isEmpty, badFilters.toString)
    val cycleJoins = opt.collect {
      case j: Join if j.condition.exists(c =>
        c.toString.contains("c_nationkey") &&
          c.toString.contains("s_nationkey")) => j }
    assert(cycleJoins.size == 1, s"cycle not in a join: $opt")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty)
    // twin: plain inner joins + explicit post-filter
    val want = graft.Tables.customer(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") >= "1996-01-01" &&
          col("o_orderdate") < "1997-01-01"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.lineitem(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(graft.Tables.nation(spark, sfDir),
        col("n_nationkey") === col("s_nationkey"))
      .join(graft.Tables.region(spark, sfDir)
        .filter(col("r_name") === "ASIA"),
        col("r_regionkey") === col("n_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100 + lit(0.5)).cast("long")).as("rc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(t => (-t._2, t._1))
    assert(got.toSeq == want.toSeq)
  }

  test("tpch-q6 shape: all three banded predicates reach PushedFilters " +
      "on the single scan (no join anywhere)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = Relational.tpchQ6(spark, sfDir)
    assert(df.queryExecution.optimizedPlan.collect {
      case j: Join => j }.isEmpty)
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    // the untruncated pushed-filter list lives in the scan's metadata
    // (the plan's string render clips it)
    val scan = root.collectFirst {
      case s: FileSourceScanExec => s.metadata("PushedFilters") }.get
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(scan.contains(s"($c,"), s"$c not pushed: $scan")
    val row = df.collect().head
    assert(row.getLong(0) > 0 && row.getLong(1) > 0)
  }

  test("tpch-q7 shape: each nation alias gets its derived region " +
      "disjunction pushed, and the bilateral volume matches the " +
      "union-of-directions twin") {
    val df = Relational.tpchQ7(spark, sfDir)
    val nationScans = df.queryExecution.executedPlan.toString
      .split("\n").filter(l => l.contains("nation.parquet") &&
        l.contains("PushedFilters"))
    assert(nationScans.length == 2, nationScans.mkString("\n"))
    nationScans.foreach(l => assert(
      l.contains("Or(EqualTo(n_regionkey,2),EqualTo(n_regionkey,3))") ||
        l.contains("Or(EqualTo(n_regionkey,3),EqualTo(n_regionkey,2))"), l))
    val got = df.collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
        r.getLong(3))).toMap
    assert(got.nonEmpty, "region pair must be populated at sf0.001")
    def direction(suppRegion: Int, custRegion: Int) = {
      val n1 = graft.Tables.nation(spark, sfDir)
        .filter(col("n_regionkey") === suppRegion)
        .select(col("n_nationkey").as("nk1"), col("n_name").as("sn"))
      val n2 = graft.Tables.nation(spark, sfDir)
        .filter(col("n_regionkey") === custRegion)
        .select(col("n_nationkey").as("nk2"), col("n_name").as("cn"))
      graft.Tables.supplier(spark, sfDir)
        .join(n1, col("nk1") === col("s_nationkey"))
        .join(graft.Tables.lineitem(spark, sfDir),
          col("s_suppkey") === col("l_suppkey"))
        .join(graft.Tables.orders(spark, sfDir),
          col("o_orderkey") === col("l_orderkey"))
        .join(graft.Tables.customer(spark, sfDir),
          col("c_custkey") === col("o_custkey"))
        .join(n2, col("nk2") === col("c_nationkey"))
        .groupBy(col("sn"), col("cn"),
          year(col("l_shipdate")).cast("long").as("y"))
        .agg(sum(floor(col("l_extendedprice") *
          (lit(1.0) - col("l_discount")) * 100 + lit(0.5)).cast("long"))
          .as("rc"))
        .collect()
        .map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
          r.getLong(3)))
    }
    val want = (direction(2, 3) ++ direction(3, 2)).toMap
    assert(got == want)
  }

  test("tpch-q10 shape: custkey-wide aggregate under TakeOrderedAndProject") {
    val df = Relational.tpchQ10(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    val got = df.collect()
    assert(got.length > 0 && got.length <= 20)
    // ordering: revenue desc, custkey asc
    val keys = got.map(r => (-r.getLong(3), r.getLong(0)))
    assert(keys.sameElements(keys.sorted))
  }

  test("tpch-q9 shape: the infix LIKE prunes the part dim AT ITS SCAN " +
      "(before the broadcast), and profit matches the two-sided money twin") {
    val df = Relational.tpchQ9(spark, sfDir)
    val partScan = df.queryExecution.executedPlan.toString
      .split("\n").find(_.contains("part.parquet")).getOrElse("")
    // %bolt% can't become a parquet predicate, but it must still sit in
    // the scan's DataFilters — not above a join
    assert(partScan.contains("Contains(p_name, bolt)") ||
      partScan.contains("p_name") && partScan.contains("bolt"), partScan)
    val got = df.collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.nonEmpty)
    val want = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.part(spark, sfDir)
        .filter(col("p_name").contains("bolt")),
        col("p_partkey") === col("l_partkey"))
      .join(graft.Tables.supplier(spark, sfDir),
        col("s_suppkey") === col("l_suppkey"))
      .join(graft.Tables.nation(spark, sfDir),
        col("n_nationkey") === col("s_nationkey"))
      .join(graft.Tables.orders(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("y"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100 + lit(0.5)).cast("long") -
        col("l_quantity").cast("long") *
          floor(col("p_retailprice") * 100 + lit(0.5)).cast("long"))
        .as("p"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(got == want)
  }

  test("tpch-q12 shape: both priority-class counts come from ONE " +
      "orderkey join pass") {
    val df = Relational.tpchQ12(spark, sfDir)
    val ex = df.queryExecution.executedPlan.toString
    assert("lineitem\\.parquet".r.findAllIn(ex).size == 1, "one fact scan")
    assert("orders\\.parquet".r.findAllIn(ex).size == 1, "one orders scan")
    val got = df.collect()
    assert(got.length == 3) // A / N / R
    val totals = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") < "1997-01-01")
      .join(graft.Tables.orders(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == totals(r.getString(0)),
        s"high+low must cover every joined line: $r")
    }
  }

  test("tpch-q14 shape: both conditional sums come from ONE fact pass " +
      "and the ppm share is the exact rational") {
    val df = Relational.tpchQ14(spark, sfDir)
    val ex = df.queryExecution.executedPlan.toString
    assert("lineitem\\.parquet".r.findAllIn(ex).size == 1,
      "promo + total must share one scan")
    val r = df.collect().head
    val (promo, total, ppm) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(promo >= 0 && promo <= total && total > 0)
    assert(ppm == promo * 1000000L / total)
  }

  test("CBO evidence: with ANALYZE-computed column stats and join " +
      "reordering enabled, the 5-table Q9 dial keeps the hand-shaped " +
      "fact-first join order and the identical result") {
    import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val tables = Seq("lineitem", "part", "supplier", "nation", "orders")
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS cbo_$t")
      spark.sql(s"CREATE TABLE cbo_$t USING parquet " +
        s"LOCATION '$sfDir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE cbo_$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val sql = Relational.tpchQ9Sql
      .replaceAll("\\b(lineitem|part|supplier|nation|orders)\\b", "cbo_$1")
      // the oracle-dialect cast survives Spark SQL unchanged
    val prev = Seq("spark.sql.cbo.enabled",
      "spark.sql.cbo.joinReorder.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val df = spark.sql(sql)
      val opt = df.queryExecution.optimizedPlan
      // stats are real: every scanned relation reports a CBO row count
      val scans = opt.collect {
        case r: LogicalRelation => r
        case h: HiveTableRelation => h: LogicalPlan
      }
      assert(scans.size == 5, opt.toString.take(1500))
      scans.foreach(r => assert(r.stats.rowCount.isDefined,
        s"missing CBO rowCount on ${r.simpleString(60)}"))
      // join order: depth-first leaf order of the join tree — the
      // hand-shaped dial order is fact-first with the filtered part
      // dimension joined earliest (it cuts lineitem hardest); with
      // honest stats present, reordering must keep that shape
      def leafOrder(p: LogicalPlan): Seq[String] = p.collectLeaves().map {
        l => l.toString.split("\\n").head }
      val joins = opt.collect { case j: Join => j }
      assert(joins.size == 4, s"expected 4 joins, got ${joins.size}")
      val order = leafOrder(joins.head)
        .map(s => tables.find(t => s.contains(s"cbo_$t")).getOrElse("?"))
      assert(order.head == "lineitem" && order(1) == "part",
        s"CBO reordered the dial away from fact⋈filtered-part first: " +
          order.mkString(" ⋈ "))
      // and the CBO-planned result is value-identical to the DataFrame
      // dial (the SQL year() is int where the dial casts long — compare
      // through numeric values, not row encodings)
      val got = df.collect().map(r =>
        (r.getString(0), r.get(1).toString.toLong, r.get(2).toString.toLong))
      val want = Relational.tpchQ9(spark, sfDir).collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == want.toSeq)
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS cbo_$t"))
    }
  }
}
