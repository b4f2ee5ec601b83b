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
}
