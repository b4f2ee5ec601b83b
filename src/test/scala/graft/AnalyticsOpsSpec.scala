package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{EventOps, Relational}

/** Sequential in-memory reference parity for the product-analytics funnel
  * and BM25 retrieval scoring — both are exact integer constructions, so
  * the distributed result must match a straight single-threaded fold
  * bit-for-bit.
  */
class AnalyticsOpsSpec extends SparkSpecBase {

  test("funnel matches a sequential per-user scan") {
    val events = EventOps.withTsMs(Tables.events(spark, sfDir))
      .select(col("user_id"), col("event_type"), col("ts_ms"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    // per user: walk stages in order, each arrival strictly after the last
    val reached = Array.fill(EventOps.FunnelStages.length)(0L)
    byUser.values.foreach { es =>
      var t = Long.MinValue
      var stage = 0
      var advanced = true
      while (advanced && stage < EventOps.FunnelStages.length) {
        val want = EventOps.FunnelStages(stage)
        val nxt = es.filter(e => e._2 == want && (stage == 0 || e._3 > t))
        if (nxt.nonEmpty) {
          t = nxt.map(_._3).min
          reached(stage) += 1
          stage += 1
        } else advanced = false
      }
    }
    val got = EventOps.funnel(spark, sfDir).collect()
    assert(got.length == EventOps.FunnelStages.length)
    got.foreach { r =>
      val i = r.getLong(0).toInt - 1
      assert(r.getString(1) == EventOps.FunnelStages(i))
      assert(r.getLong(2) == reached(i),
        s"stage ${i + 1} users: got ${r.getLong(2)} want ${reached(i)}")
      assert(r.getLong(3) == r.getLong(2) * 1000000L / reached(0))
    }
    // funnel counts are non-increasing by construction
    got.map(_.getLong(2)).sliding(2).foreach {
      case Array(a, b) => assert(b <= a)
      case _           => ()
    }
  }

  test("retention matrix matches a sequential per-user scan") {
    val weekMs = 7L * 24 * 3600 * 1000
    val weeks = EventOps.withTsMs(Tables.events(spark, sfDir))
      .select(col("user_id"), col("ts_ms")).collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), weekMs)))
      .distinct
    val cohort = weeks.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = cohort.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val matrix = weeks
      .groupBy { case (u, w) => (cohort(u), w - cohort(u)) }.view
      .mapValues(_.size.toLong).toMap
    val got = EventOps.retention(spark, sfDir).collect()
    assert(got.length == matrix.size && got.nonEmpty)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == matrix(key), s"active at $key")
      assert(r.getLong(3) == sizes(key._1))
      assert(r.getLong(4) == matrix(key) * 1000000L / sizes(key._1))
    }
    // offset 0 is every cohort member by construction
    got.filter(_.getLong(1) == 0L).foreach(r =>
      assert(r.getLong(4) == 1000000L))
  }

  test("transitions match a sequential per-user walk") {
    val events = EventOps.withTsMs(Tables.events(spark, sfDir))
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = events.groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._3, e._2)).map(_._4)
      ordered.zip(ordered.drop(1))
    }.toSeq
    val want = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val outN = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = EventOps.transitions(spark, sfDir).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == want(k), s"count at $k")
      assert(r.getLong(3) == want(k) * 1000000L / outN(k._1))
    }
    // each from-type's shares account for (nearly) the whole ppm space
    got.groupBy(_.getString(0)).values.foreach { rs =>
      val total = rs.map(_.getLong(3)).sum
      assert(total > 1000000L - rs.length && total <= 1000000L)
    }
  }

  test("exact 3-sigma outliers match a double-precision reference away " +
      "from boundaries") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).map { case (p, xs) =>
      val v = xs.map(_._2.toDouble)
      val n = v.length
      val mu = v.sum / n
      val sd = math.sqrt(v.map(x => (x - mu) * (x - mu)).sum / n)
      p -> (n.toLong, v.count(x => math.abs(x - mu) > 3 * sd).toLong)
    }
    val got = Relational.anomalyExact(spark, sfDir).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (n, nOut) = want(r.getString(0))
      assert(r.getLong(1) == n)
      // FP reference can disagree only on exact-boundary points; none
      // exist in this data, so the counts must coincide
      assert(r.getLong(2) == nOut, s"outliers for ${r.getString(0)}")
    }
    // degenerate group: zero variance → no outliers, no 0/0 hazard
    import spark.implicits._
    val flat = Seq(("Z", 5.0), ("Z", 5.0), ("Z", 5.0))
      .toDF("o_orderpriority", "o_totalprice")
    val g = flat.select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
          .cast("decimal(38,0)").as("x"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("qx"))
    val out = flat.select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
          .cast("decimal(38,0)").as("x"))
      .join(g, Seq("o_orderpriority"))
      .withColumn("dev", col("n") * col("x") - col("sx"))
      .filter((col("dev") * col("dev")) >
        lit(9) * (col("n") * col("qx") - col("sx") * col("sx")))
    assert(out.count() == 0L)
  }

  test("median/MAD robust outliers match a sequential exact reference " +
      "and resist a contaminating extreme") {
    // sequential reference in the same doubled-integer space
    def med(sorted: Array[Long]): Long = {
      val n = sorted.length
      if (n % 2 == 1) 2L * sorted(n / 2)
      else sorted(n / 2 - 1) + sorted(n / 2) // sum of two = 2 × mean, exact
    }
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).map { case (p, xs) =>
      val c = xs.map(_._2).sorted // cents
      val med2 = med(c) // 2 × median cents
      val dev4 = c.map(x => 2L * math.abs(2L * x - med2)).sorted
      // med() returns twice its input's median; dev4 medians are integral
      val mad4 = med(dev4) / 2L
      p -> (c.length.toLong, med2, mad4,
        c.count(x => 2L * math.abs(2L * x - med2) > 3L * mad4).toLong)
    }
    val got = Relational.anomalyRobust(spark, sfDir).collect()
    assert(got.nonEmpty && got.length == want.size)
    got.foreach { r =>
      val (n, med2, mad4, nOut) = want(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == med2, s"median for ${r.getString(0)}")
      assert(r.getLong(3) == mad4, s"mad for ${r.getString(0)}")
      assert(r.getLong(4) == nOut, s"outliers for ${r.getString(0)}")
    }
    // breakdown-point property: one enormous contaminant shifts μ/σ but
    // leaves the median and MAD (and thus every other row's flag) intact
    val base = (1 to 99).map(i => 100L + (i % 7)) // tight cluster
    val clean = base.toArray.sorted
    val dirty = (base :+ 100000000L).toArray.sorted
    val medC = med(clean); val medD = med(dirty)
    assert(math.abs(medC - medD) <= 2) // half-cent move at most
    val madC = med(clean.map(x => math.abs(2 * x - medC)).sorted)
    val madD = med(dirty.map(x => math.abs(2 * x - medD)).sorted)
    assert(math.abs(madC - madD) <= 4)
  }

  test("two-sample KS drift matches a sequential exact ECDF scan") {
    import graft.operators.Drift
    val rows = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus").isin("O", "F"))
      .select(col("o_orderstatus"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val aVals = rows.collect { case ("O", c) => c }.sorted
    val bVals = rows.collect { case ("F", c) => c }.sorted
    val (n1, n2) = (aVals.length.toLong, bVals.length.toLong)
    val support = (aVals ++ bVals).distinct.sorted
    var best = BigInt(0); var bestAt = Long.MaxValue
    support.foreach { v =>
      val c1 = BigInt(aVals.count(_ <= v)) * n2
      val c2 = BigInt(bVals.count(_ <= v)) * n1
      val num = (c1 - c2).abs
      if (num > best || (num == best && v < bestAt)) {
        best = num; bestAt = v
      }
    }
    val got = Drift.driftKs(spark, sfDir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(BigInt(r.getLong(2)) == best)
    assert(r.getLong(3) ==
      (best * 1000000 / (BigInt(n1) * BigInt(n2))).toLong)
    assert(r.getLong(4) == bestAt)
  }

  test("total-variation drift: per-type gaps conserve into the TV sum " +
      "and identical halves give zero") {
    import graft.operators.Drift
    val got = Drift.driftTv(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    // the TV column is one shared value, inside [0, 1e6], and the halves
    // actually split the data
    assert(got.map(_._5).distinct.length == 1)
    val tv = got.head._5
    assert(tv >= 0L && tv <= 1000000L)
    val (sumO1, sumO2) = (got.map(_._2).sum, got.map(_._3).sum)
    assert(sumO1 > 0L && sumO2 > 0L)
    // sequential recompute of the exact cross-multiplied statistic
    val num = got.map { case (_, o1, o2, _, _) =>
      (BigInt(o1) * sumO2 - BigInt(o2) * sumO1).abs
    }.sum
    assert(BigInt(tv) ==
      num * 1000000 / (BigInt(2) * BigInt(sumO1) * BigInt(sumO2)))
    // TV of a distribution against itself is zero
    val same = got.map { case (t, o1, _, _, _) => (t, o1, o1) }
    val numSame = same.map { case (_, a, b) =>
      (BigInt(a) * sumO1 - BigInt(b) * sumO1).abs
    }.sum
    assert(numSame == 0)
  }

  test("attribution matches a sequential per-user walk") {
    val events = EventOps.withTsMs(Tables.events(spark, sfDir))
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val credits = events.groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._3, e._2))
      var lastT: String = null
      var firstT: String = null
      val out = scala.collection.mutable.Buffer[(String, String, Long)]()
      ordered.foreach { e =>
        if (e._4 == "purchase") {
          val c = math.floor(e._5 * 100 + 0.5).toLong
          if (lastT != null) out += (("last_touch", lastT, c))
          if (firstT != null) out += (("first_touch", firstT, c))
        }
        if (EventOps.TouchTypes.contains(e._4)) {
          lastT = e._4
          if (firstT == null) firstT = e._4
        }
      }
      out
    }.toSeq
    val want = credits.groupBy(t => (t._1, t._2)).view
      .mapValues(v => (v.size.toLong, v.map(_._3).sum)).toMap
    val got = EventOps.attribution(spark, sfDir).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (n, rev) = want((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == n, s"purchases ${r.getString(0)}/${r.getString(1)}")
      assert(r.getLong(3) == rev, s"revenue ${r.getString(0)}/${r.getString(1)}")
    }
    // both models credit the same purchase population
    val byModel = got.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byModel("last_touch") == byModel("first_touch"))
  }

  test("cumulative uniques: conservation invariants hold and the series " +
      "matches a per-day distinct recomputation") {
    val rows = EventOps.cumulativeUniques(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val e = EventOps.withTsMs(Tables.events(spark, sfDir))
      .select(col("user_id"), expr("ts_ms div 86400000").as("day"))
      .distinct().collect().map(r => (r.get(0), r.getLong(1)))
    val nUsers = e.map(_._1).distinct.length.toLong
    // Σ new_users = |users|; the last cumulative point = |users|
    assert(rows.map(_.getLong(2)).sum === nUsers)
    assert(rows.last.getLong(3) === nUsers)
    // cumulative is non-decreasing and active ≥ new on every day
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) <= b.getLong(3))
      case _ =>
    }
    rows.foreach(r => assert(r.getLong(1) >= r.getLong(2)))
    // spot-check: cumulative through day d equals distinct users whose
    // first day is ≤ d (sequential recomputation)
    val firstDay = e.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(3) === firstDay.values.count(_ <= d).toLong,
        s"cumulative mismatch at day $d")
    }
  }

  test("gini: two-phase support computation matches the sequential " +
      "ranked formula and stays in [0, 1e6)") {
    import graft.operators.Drift
    val got = Drift.gini(spark, sfDir).collect()
    assert(got.nonEmpty)
    val vals = Tables.orders(spark, sfDir)
      .select(col("o_orderstatus"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = vals.groupBy(_._1).view.mapValues { rows =>
      val xs = rows.map(_._2).sorted
      val n = xs.length.toLong
      val t = BigInt(xs.sum)
      val sr = xs.zipWithIndex
        .map { case (x, i) => BigInt(x) * (i + 1) }.sum
      val ppm = (BigInt(2) * sr - BigInt(n + 1) * t) * 1000000 /
        (BigInt(n) * t)
      (n, xs.sum, ppm.toLong)
    }.toMap
    got.foreach { r =>
      val (n, t, ppm) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == t, r.toString)
      assert(r.getLong(3) == ppm, s"gini ${r.getString(0)}")
      assert(ppm >= 0L && ppm < 1000000L)
    }
    assert(got.length == want.size)
  }

  test("trend: exact rational OLS matches a sequential normal-equation " +
      "computation on the collected daily series") {
    val got = EventOps.trend(spark, sfDir).collect()
    assert(got.nonEmpty)
    val daily = EventOps.withTsMs(Tables.events(spark, sfDir))
      .select(col("event_type"), expr("ts_ms div 86400000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("v")).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val day0 = daily.map(_._2).min
    val want = daily.groupBy(_._1).view.mapValues { pts =>
      val xy = pts.map(p => (p._2 - day0, p._3))
      val n = xy.length.toLong
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      (n, n * sxy - sx * sy, n * sxx - sx * sx, sy * sxx - sx * sxy)
    }.toMap
    got.foreach { r =>
      val (n, num, den, inum) = want(r.getString(0))
      // the moments accumulate in decimal(38,0) (the silent-BIGINT-wrap
      // guard) but LEAVE as digit strings (the driver-hash decimal
      // canonicalization lesson) — compare through exact BigInt parse
      assert(r.getLong(1) == n && BigInt(r.getString(2)) == num &&
        BigInt(r.getString(3)) == den &&
        BigInt(r.getString(4)) == inum, r.toString)
      assert(den > 0, "degenerate denominator")
    }
    assert(got.length == want.size)
  }

  test("interval overlap join is a binned equi-join (no nested loop), " +
      "each pair counted once, and matches the direct theta join") {
    val df = EventOps.intervalOverlap(spark, sfDir)
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    // the join must be the equi-keyed (custkey, bin) hash join — the
    // naive theta form compiles to a nested loop that dies at scale
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      plan.take(1200))
    // span ≤ bin width ⇒ every interval lands in at most 2 bins
    assert(EventOps.OverlapSpanDays <= EventOps.OverlapBinDays)
    // parity with the direct theta join (small data makes it affordable)
    val iv = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1990-01-01")).cast("long")
          .as("s"))
      .withColumn("e", col("s") + EventOps.OverlapSpanDays)
    val a = iv.select(col("o_custkey"), col("o_orderkey").as("k1"),
      col("s").as("s1"), col("e").as("e1"))
    val b = iv.select(col("o_custkey").as("ck2"), col("o_orderkey").as("k2"),
      col("s").as("s2"), col("e").as("e2"))
    val want = a.join(b, col("o_custkey") === col("ck2") &&
        col("k1") < col("k2") &&
        col("s1") <= col("e2") && col("s2") <= col("e1"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(least(col("e1"), col("e2")) -
          greatest(col("s1"), col("s2")) + lit(1L)).as("overlap_days"))
      .orderBy(col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("bm25 matches a sequential reference in exact fixed point") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val n = docs.length.toLong
    val lTot = docs.map(_._2.length.toLong).sum
    val q = TextAnalysis.Bm25Query
    val tf = for {
      (id, toks) <- docs
      t <- q
      c = toks.count(_ == t).toLong if c > 0
    } yield (id, t, c, toks.length.toLong)
    val df = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val scores = tf.groupBy(_._1).map { case (id, rows) =>
      val s = rows.map { case (_, t, c, dl) =>
        ((n - df(t) + 1) * 100 / (df(t) + 1)) *
          (44 * c * lTot * 100 /
            (20 * c * lTot + 6 * lTot + 18 * dl * n))
      }.sum
      (id, s, rows.size.toLong)
    }.toSeq
    val want = scores.sortBy { case (id, s, _) => (-s, id) }
      .take(TextAnalysis.Bm25TopK)
    val got = TextAnalysis.bm25(spark, sfDir).collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).zipWithIndex.foreach { case ((g, (id, s, nt)), i) =>
      assert(g.getLong(0) == id, s"rank ${i + 1} doc: ${g.getLong(0)} vs $id")
      assert(g.getLong(1) == nt)
      assert(g.getLong(2) == s, s"rank ${i + 1} score")
      assert(g.getLong(3) == i + 1)
    }
  }

  test("active window: the coverage-block decomposition equals a brute " +
      "force trailing-7-day distinct, the spine is dense, and no " +
      "day-times-window self-join appears in the plan") {
    val df = EventOps.activeWindow(spark, sfDir)
    // the decomposition's point: no range/theta join anywhere — the
    // brute-force form would be a BroadcastNestedLoopJoin on BETWEEN
    assert(!df.queryExecution.executedPlan.toString
      .contains("NestedLoopJoin"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    // dense spine
    val days = rows.map(_._1)
    assert(days.toSeq == (days.min to days.max).toSeq)
    // brute force twin
    val e = EventOps.withTsMs(Tables.events(spark, sfDir))
      .select(col("user_id"), expr("ts_ms div 86400000").as("day"))
      .distinct().collect().map(r => (r.get(0), r.getLong(1)))
    val byDay = rows.toMap
    days.foreach { d =>
      val want = e.filter(t => t._2 >= d - 6 && t._2 <= d)
        .map(_._1).distinct.length.toLong
      assert(byDay(d) == want, s"day $d")
    }
  }
}
