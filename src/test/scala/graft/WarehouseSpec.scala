package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Warehouse

/** Structural and reference-parity checks for the warehouse-modeling
  * operators: SCD2 interval algebra, unpivot mass conservation, and the
  * data-quality audit's violation counting on deliberately dirty data.
  */
class WarehouseSpec extends SparkSpecBase {

  test("scd2 builds well-formed history: abutting intervals, one current " +
      "row per key, update counts conserved") {
    val dim = Warehouse.scd2(spark, sfDir).collect()
    assert(dim.nonEmpty)
    val orders = Tables.orders(spark, sfDir)
    val nOrders = orders.count()
    // every source update lands in exactly one version row
    assert(dim.map(_.getLong(6)).sum == nOrders)
    dim.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // versions are 1..k dense
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      // exactly one open interval, and it is the last version
      val current = sorted.filter(_.getInt(5) == 1)
      assert(current.length == 1 && (current.head eq sorted.last))
      assert(current.head.getLong(4) == Warehouse.EndOfTimeMs)
      // intervals abut: valid_to(v) == valid_from(v+1), and never empty
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) == b.getLong(3))
          // consecutive versions must actually change the tracked attribute
          assert(a.getString(2) != b.getString(2))
        case _ => ()
      }
      // same-instant supersession (two updates sharing an effective ts,
      // ordered by the orderkey tiebreak) legitimately yields a zero-width
      // interval for the superseded version; never negative
      sorted.foreach(r => assert(r.getLong(3) <= r.getLong(4)))
    }
  }

  test("unpivot conserves each measure's mass against direct aggregation") {
    import graft.operators.RefTransforms.cents
    val li = Tables.lineitem(spark, sfDir)
    val n = li.count()
    val direct = li.agg(
      sum(cents(col("l_quantity"))), sum(cents(col("l_extendedprice"))),
      sum(cents(col("l_discount"))), sum(cents(col("l_tax")))).head()
    val got = Warehouse.unpivotMeasures(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet ==
      Set("quantity", "extendedprice", "discount", "tax"))
    got.values.foreach(r => assert(r.getLong(1) == n))
    assert(got("quantity").getLong(2) == direct.getLong(0))
    assert(got("extendedprice").getLong(2) == direct.getLong(1))
    assert(got("discount").getLong(2) == direct.getLong(2))
    assert(got("tax").getLong(2) == direct.getLong(3))
  }

  test("dq audit is all-green on the driver testdata") {
    val audit = Warehouse.dqAudit(spark, sfDir).collect()
    assert(audit.length == 6)
    audit.foreach { r =>
      assert(r.getLong(2) == 0L, s"${r.getString(0)} violations")
      assert(r.getInt(3) == 1)
    }
  }

  test("dq audit counts violations on dirty data") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dq").toString
    // 2 null custkeys, a duplicated orderkey, a bad status, a negative price
    Seq(
      (1L, Option(10L), "O", 5.0, "2024-01-01 00:00:00", "1-URGENT"),
      (1L, Option(10L), "F", 5.0, "2024-01-02 00:00:00", "1-URGENT"),
      (2L, None,        "P", 5.0, "2024-01-03 00:00:00", "1-URGENT"),
      (3L, None,        "X", 5.0, "2024-01-04 00:00:00", "1-URGENT"),
      (4L, Option(99L), "O", -1.0, "2024-01-05 00:00:00", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "ts", "o_orderpriority")
      .withColumn("o_orderdate", col("ts").cast("timestamp")).drop("ts")
      .write.parquet(s"$dir/orders.parquet")
    Seq((10L, "c")).toDF("c_custkey", "c_name")
      .write.parquet(s"$dir/customer.parquet")
    // one discount outside [0, 1]
    Seq((1L, 0.05), (2L, 1.5)).toDF("l_orderkey", "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = Warehouse.dqAudit(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(got("orders_custkey_not_null") == ((2L, 0)))
    assert(got("orders_orderkey_unique") == ((1L, 0)))
    assert(got("orders_status_domain") == ((1L, 0)))
    assert(got("orders_totalprice_nonneg") == ((1L, 0)))
    // null custkeys cannot match the dim; 99 is a genuine orphan → 3
    assert(got("orders_custkey_fk") == ((3L, 0)))
    assert(got("lineitem_discount_range") == ((1L, 0)))
  }

  test("k-anonymity audit: cells conserve the population, the tally " +
      "matches the flags, and a planted singleton is flagged") {
    val got = Warehouse.kAnonymity(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    assert(got.map(_._3).sum == Tables.customer(spark, sfDir).count())
    got.foreach { c =>
      assert((c._4 == 1) == (c._3 < Warehouse.KAnonThreshold))
    }
    val riskyCells = got.count(_._4 == 1).toLong
    val riskyRows = got.filter(_._4 == 1).map(_._3).sum
    assert(got.forall(c => c._5 == riskyCells && c._6 == riskyRows))

    // planted fixture: one singleton cell must be flagged risky
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_kanon").toString
    (Seq.fill(6)((1, "BUILDING")) :+ ((2, "MACHINERY")))
      .toDF("c_nationkey", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val planted = Warehouse.kAnonymity(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getInt(3), r.getLong(4)))
    assert(planted.length == 2)
    assert(planted.find(_._1 == 1).get._3 == 0)
    assert(planted.find(_._1 == 2).get._3 == 1)
    assert(planted.forall(_._4 == 1L))
  }

  test("scd2 point-in-time lookup matches the naive interval join and " +
      "conserves the fact rows") {
    import graft.operators.RefTransforms.cents
    val got = Warehouse.scd2Lookup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap

    // reference: the O(fact × history) non-equi join the merge-scan avoids
    val dim = Warehouse.scd2(spark, sfDir)
      .select(col("o_custkey").as("d_custkey"), col("priority"),
        col("valid_from_ms"), col("valid_to_ms"))
    val fact = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        unix_millis(col("l_shipdate").cast("timestamp")).as("ship_ms"),
        cents(col("l_extendedprice")).as("price_cents"))
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey"),
        col("o_custkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
    val want = fact.join(dim,
        col("o_custkey") === col("d_custkey") &&
          col("valid_from_ms") <= col("ship_ms") &&
          col("ship_ms") < col("valid_to_ms"), "left")
      .withColumn("priority", coalesce(col("priority"), lit("NONE")))
      .groupBy(col("priority"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == want)

    // every lineitem resolves to exactly one regime
    val nLineitem = Tables.lineitem(spark, sfDir).count()
    assert(got.values.map(_._1).sum == nLineitem)
    // regime changes are real: some volume ships under a different regime
    // than it was ordered with (sf0.001 has multi-version customers)
    assert(got.keys.exists { case (regime, orig) => regime != orig })
  }

  test("columnProfile: per-column exact counts match direct computation " +
      "and the plan has no Expand / multi-distinct spine") {
    val df = Warehouse.columnProfile(spark, sfDir)
    val got = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val li = Tables.lineitem(spark, sfDir)
    val n = li.count()
    for (c <- Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag",
        "l_shipdate")) {
      val nn = li.filter(col(c).isNotNull).count()
      val nd = li.select(col(c)).na.drop().distinct().count()
      assert(got(c) == ((n, n - nn, nd)), s"column $c")
    }
    // the scale contract: k independent two-stage aggregates, NOT one
    // aggregate whose multi-countDistinct compiles to an Expand (6× row
    // replication) feeding a row-scaled (gid, value) exchange — pin the
    // executed plan so a refactor back to the slow shape fails loudly
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(1200))
  }

  test("columnProfileSketch: one-pass HLL arm stays Expand-free, every " +
      "estimate inside the gate, and the gate itself has teeth") {
    val df = Warehouse.columnProfileSketch(spark, sfDir)
    val rows = df.collect()
    assert(rows.length === 5)
    rows.foreach(r => assert(r.getBoolean(2), s"gate blown: $r"))
    // the whole point of the sketch form: multi-column approx distinct
    // compiles to HLL partials, never to the Expand spine
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(1200))
    // teeth: a deliberately-wrong "estimate" (exact·2) must trip the
    // same gate arithmetic — guards against a vacuous always-true flag
    val broken = rows.map(_.getLong(1) * 2).zip(rows.map(_.getLong(1)))
      .forall { case (est, exact) =>
        math.abs(est - exact) * 100L <=
          exact * Warehouse.ProfileSketchGatePct }
    assert(!broken)
  }
}
