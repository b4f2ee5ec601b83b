package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.plans.AsOfJoin

/** The native as-of operator: physical-node presence, equality with the
  * composed merge-scan form, and the edge semantics (ties, nulls, no
  * prior match) against a brute-force reference.
  */
class AsOfJoinSpec extends SparkSpecBase {

  test("native as-of join plans as AsOfJoinExec with a hash exchange and " +
      "sort per side, and equals the composed form row for row") {
    val df = EventOps.asofJoinNative(spark, sfDir)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the plan string strips the Exec suffix: the node prints as AsOfJoin
    assert(plan.contains("AsOfJoin "), plan.take(1500))
    assert("hashpartitioning".r.findAllIn(plan).size >= 2, plan.take(1500))
    assert(!plan.contains("Window"), "the native form must not fall back " +
      "to the composed window plan")
    val want = EventOps.asofJoin(spark, sfDir).collect()
    assert(rows.length === want.length)
    rows.zip(want).foreach { case (a, b) => assert(a === b) }
  }

  test("edge semantics: ties take the greatest tie-break, exact-time " +
      "orders count, null keys/times never match, keyless rows pad null") {
    import spark.implicits._
    val left = Seq[(java.lang.Long, java.lang.Long, Long)](
      (1L, 10L, 100L),  // between two orders
      (2L, 10L, 205L),  // exactly at an order's time (counts) + tie pair
      (3L, 10L, 50L),   // before every order -> null
      (4L, 11L, 500L),  // key with no right rows -> null
      (5L, null, 100L), // null key -> null
      (6L, 12L, 100L)   // right rows for this key have null time -> null
    ).toDF("event_id", "k", "t")
    val right = Seq[(java.lang.Long, Long, java.lang.Long)](
      (10L, 7L, 90L), (10L, 8L, 205L), (10L, 9L, 205L), (10L, 6L, 300L),
      (12L, 1L, null)
    ).toDF("rk", "ok", "rt")
      .filter(col("rt").isNotNull) // the null-rejecting precondition
    val got = AsOfJoin(left, right, "k", "rk", "t", "rt", "ok")
      .select(col("event_id"), col("ok"), col("rt"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L) === Some(7L))  // 90 <= 100 < 205
    assert(got(2L) === Some(9L))  // both 205s qualify; greatest ok wins
    assert(got(3L) === None)
    assert(got(4L) === None)
    assert(got(5L) === None)
    assert(got(6L) === None)
  }

  test("native as-of matches a brute-force reference on a dense random " +
      "grid (every key x time against every order)") {
    import spark.implicits._
    // deterministic pseudo-random fixture: 40 keys, ~25 left rows each,
    // ~12 right rows each, colliding times on purpose (mod 97)
    val left = (0 until 1000).map { i =>
      (i.toLong, (i % 40).toLong, (ScaleData.mix(i.toLong) % 97 + 97) % 97)
    }.toDF("event_id", "k", "t")
    val right = (0 until 480).map { j =>
      ((j % 40).toLong, j.toLong, (ScaleData.mix(j + 7919L) % 97 + 97) % 97)
    }.toDF("rk", "ok", "rt")
    val got = AsOfJoin(left, right, "k", "rk", "t", "rt", "ok")
      .select(col("event_id"), col("ok"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val rightRows = (0 until 480).map { j =>
      ((j % 40).toLong, j.toLong, (ScaleData.mix(j + 7919L) % 97 + 97) % 97)
    }
    (0 until 1000).foreach { i =>
      val k = (i % 40).toLong
      val t = (ScaleData.mix(i.toLong) % 97 + 97) % 97
      val cand = rightRows.filter(r => r._1 == k && r._3 <= t)
      val want =
        if (cand.isEmpty) -1L
        else cand.maxBy(r => (r._3, r._2))._2
      assert(got(i.toLong) === want, s"event $i key $k t $t")
    }
  }

  test("STRING keys survive buffering: the retained match key must be a " +
      "copy, not a view into the sorter's reused row") {
    import spark.implicits._
    // Dense per-partition streams of string keys force the right cursor
    // to advance many times after each buffering — if lastMatchKey were
    // the raw UTF8String view, the advance would re-point it to a later
    // key and the final keyOrd compare would mis-match.
    val left = (0 until 2000).map { i =>
      (i.toLong, f"key-${i % 50}%04d", (ScaleData.mix(i.toLong) % 89 + 89) % 89)
    }.toDF("event_id", "k", "t")
    val right = (0 until 1500).map { j =>
      (f"key-${j % 50}%04d", j.toLong, (ScaleData.mix(j + 104729L) % 89 + 89) % 89)
    }.toDF("rk", "ok", "rt")
    val got = AsOfJoin(left, right, "k", "rk", "t", "rt", "ok")
      .select(col("event_id"), col("ok"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val rightRows = (0 until 1500).map { j =>
      (f"key-${j % 50}%04d", j.toLong, (ScaleData.mix(j + 104729L) % 89 + 89) % 89)
    }
    (0 until 2000).foreach { i =>
      val k = f"key-${i % 50}%04d"
      val t = (ScaleData.mix(i.toLong) % 89 + 89) % 89
      val cand = rightRows.filter(r => r._1 == k && r._3 <= t)
      val want = if (cand.isEmpty) -1L else cand.maxBy(r => (r._3, r._2))._2
      assert(got(i.toLong) === want, s"event $i key $k t $t")
    }
  }

  test("self-as-of-join: overlapping attribute IDs are deduplicated, so " +
      "each row matches the latest EARLIER row of the same key") {
    import spark.implicits._
    val base = (0 until 300).map { i =>
      ((i % 10).toLong, i.toLong, (i * 7 % 101).toLong)
    }.toDF("k", "seq", "v")
    // left derives from base by withColumn — k/seq/v KEEP base's attr
    // IDs; right IS base, so without the apply-side re-alias the node
    // would carry duplicate IDs and mis-bind
    val left = base.withColumn("t_prev", col("seq") - 1)
    val df = AsOfJoin(left, base, "k", "k", "t_prev", "seq", "seq")
    // output = left.output ++ right.output; names collide, so read the
    // right side's seq positionally (index 5 of k,seq,v,t_prev,k,seq,v)
    assert(df.columns.toSeq ===
      Seq("k", "seq", "v", "t_prev", "k", "seq", "v"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
    (0 until 300).foreach { i =>
      val k = (i % 10).toLong
      // the latest seq of the same key that is <= i-1 is i-10 (stride 10)
      val want = if (i >= 10) (i - 10).toLong else -1L
      assert(got((k, i.toLong)) === want, s"row $i key $k")
    }
  }
}
