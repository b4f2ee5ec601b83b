package graft

import org.apache.spark.sql.functions._

import graft.operators.Timeseries

/** Gap-fill invariants: dense contiguous spine per user, observed rows
  * untouched, and forward-fill parity with a sequential carry.
  */
class TimeseriesSpec extends SparkSpecBase {

  test("gap fill produces a dense per-user spine and carries the last " +
      "observation forward") {
    val got = Timeseries.gapFill(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(got.nonEmpty)

    // sequential reference from the raw events
    val raw = graft.operators.EventOps
      .withTsMs(Tables.events(spark, sfDir))
      .select(col("user_id"), expr(s"ts_ms div ${Timeseries.DayMs}"),
        floor(col("value") * 100 + lit(0.5)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val daily = raw.groupBy(t => (t._1, t._2)).view
      .mapValues(ts => (ts.length.toLong, ts.map(_._3).sum)).toMap

    got.groupBy(_._1).foreach { case (user, rows) =>
      val sorted = rows.sortBy(_._2)
      val days = sorted.map(_._2)
      // contiguous [lo, hi], endpoints observed
      assert(days.toSeq == (days.head to days.last).toSeq)
      assert(daily.contains((user, days.head)))
      assert(daily.contains((user, days.last)))
      var carry = Long.MinValue
      sorted.foreach { case (_, day, nEvents, filled, isGap) =>
        daily.get((user, day)) match {
          case Some((n, cents)) =>
            assert(isGap == 0 && nEvents == n)
            carry = cents
          case None =>
            assert(isGap == 1 && nEvents == 0L)
        }
        assert(filled == carry, s"fill at ($user, $day)")
      }
    }

    // the fill is only ever needed when gaps exist at this sf
    assert(got.exists(_._5 == 1))
    // no row precedes its user's first observation (carry is always set)
    assert(got.forall(_._4 != Long.MinValue))
  }

  test("paa segments tile each user's series and conserve its mass; " +
      "symbols are monotone in the segment mean") {
    val series = Timeseries.gapFill(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val got = Timeseries.paa(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    assert(got.nonEmpty)
    val W = Timeseries.PaaSegments

    // sequential reference: per user, integer segment bucketing
    val wantCells = series.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(_._2)
      val lo = sorted.head._2
      val n = sorted.last._2 - lo + 1
      sorted.groupBy(t => (t._2 - lo) * W / n).map { case (seg, cell) =>
        (u, seg) -> (cell.length.toLong, cell.map(_._3).sum)
      }
    }
    assert(got.length == wantCells.size)
    got.foreach { case (u, seg, nDays, sum, mean, _) =>
      val (wn, ws) = wantCells((u, seg))
      assert(nDays == wn && sum == ws)
      assert(mean == ws / wn)
    }
    // mass conservation: segment sums add back to the filled series
    assert(got.map(_._4).sum == series.map(_._3).sum)
    // symbols: 0..3, monotone in mean (sorting by mean never decreases
    // the symbol), and all four classes appear on real data
    assert(got.forall(t => t._6 >= 0 && t._6 <= 3))
    val byMean = got.sortBy(_._5).map(_._6)
    byMean.sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _           => ()
    }
    assert(byMean.distinct.length == 4)
  }

  test("rolling stats: dense day spine, trailing-7 frames and the dyadic " +
      "EWMA numerator match a sequential recompute") {
    val got = Timeseries.rollingStats(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7)), r.getLong(8)))
    assert(got.nonEmpty)
    // dense, consecutive, sorted spine
    got.map(_._1).sliding(2).foreach {
      case Array(a, b) => assert(b == a + 1, s"gap in spine at $a -> $b")
      case _           => ()
    }
    val v = got.map(_._3)
    got.zipWithIndex.foreach { case (r, i) =>
      val frame = v.slice(math.max(0, i - 6), i + 1)
      assert(r._4 == frame.sum && r._5 == frame.min && r._6 == frame.max &&
        r._7 == frame.length.toLong, s"frame mismatch at day ${r._1}")
      val delta = if (i == 0) None else Some(v(i) - v(i - 1))
      assert(r._8 == delta, s"delta at day ${r._1}")
      val ewma = (0 until Timeseries.EwmaTerms).map { j =>
        (if (i - j >= 0) v(i - j) else 0L) *
          (1L << (Timeseries.EwmaTerms - 1 - j))
      }.sum
      assert(r._9 == ewma, s"ewma at day ${r._1}")
    }
  }

  test("seasonal decomposition: residual numerators cancel within every " +
      "weekday — the additive-profile identity") {
    val got = Timeseries.seasonalDecompose(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(got.nonEmpty)
    assert(got.forall(t => t._2 >= 0 && t._2 < 7))
    // Σ_{days of weekday w} (day_cents·n_w − sum_w) = n_w·sum_w − n_w·sum_w
    got.groupBy(_._2).foreach { case (wd, rows) =>
      assert(rows.map(_._6).sum == 0L, s"weekday $wd residuals don't cancel")
      assert(rows.length.toLong == rows.head._4)
      assert(rows.map(_._3).sum == rows.head._5)
    }
    // weekday tag is the epoch-day arithmetic, not an engine dayofweek
    got.foreach(t => assert(((t._1 + 4) % 7).toInt == t._2))
  }
}
