package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RefTransforms.cents

/** Time-series regularization: gap-fill a per-user daily series onto a
  * dense spine and carry the last observation forward.
  *
  * The reference lands per-day transaction files ( s3_uploader.py:204-226
  * writes one file per day) and its warehouse queries assume a continuous
  * daily series; real event data has silent days. Resampling onto a dense
  * calendar spine with forward-fill is the standard regularization step
  * every downstream time-series consumer (feature windows, retention
  * curves, forecasting) needs.
  *
  * Scale shape: the only full-data pass is the first `groupBy(user, day)`
  * — after it, everything operates on the |users|·|days| aggregate, so
  * the spine explode, the left join, and the fill window all move the
  * small table. The spine is generated per user from that aggregate
  * (`sequence(lo, hi)` + explode — a narrow operator, no driver loop),
  * and the fill is ONE window over `user_id`. Day arithmetic is integer
  * epoch-ms `div`, money is integer cents, so every value is hash-exact
  * cross-engine; the fill column is never NULL because each user's spine
  * starts at a day with observations.
  */
object Timeseries {

  val DayMs = 86400000L

  def gapFill(s: SparkSession, d: String): DataFrame =
    filledSeries(s, d).orderBy(col("user_id"), col("day"))

  /** [[gapFill]] without the presentation sort — shared with [[paa]],
    * which immediately re-aggregates on the same user partitioning.
    */
  private def filledSeries(s: SparkSession, d: String): DataFrame = {
    val e = EventOps.withTsMs(Tables.events(s, d))
      .select(col("user_id"), expr(s"ts_ms div $DayMs").as("day"),
        cents(col("value")).as("v"))
    val daily = e.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"), sum(col("v")).as("day_cents"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("is_gap", col("day_cents").isNull.cast("int"))
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_cents",
        last(col("day_cents"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("day"), col("n_events"),
        col("filled_cents"), col("is_gap"))
  }

  val gapFillSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_ms(ts) // $DayMs AS day,
       |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
       |  FROM events
       |), daily AS (
       |  SELECT user_id, day, COUNT(*) AS n_events, SUM(v) AS day_cents
       |  FROM e GROUP BY user_id, day
       |), b AS (
       |  SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
       |  FROM daily GROUP BY user_id
       |), spine AS (
       |  SELECT user_id, unnest(generate_series(lo, hi)) AS day FROM b
       |), j AS (
       |  SELECT s.user_id, s.day,
       |         COALESCE(d.n_events, 0) AS n_events, d.day_cents
       |  FROM spine s LEFT JOIN daily d USING (user_id, day)
       |)
       |SELECT user_id, day, CAST(n_events AS BIGINT) AS n_events,
       |       CAST(last_value(day_cents IGNORE NULLS) OVER (
       |         PARTITION BY user_id ORDER BY day
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS BIGINT) AS filled_cents,
       |       CAST(CASE WHEN day_cents IS NULL THEN 1 ELSE 0 END AS INT)
       |         AS is_gap
       |FROM j ORDER BY user_id, day""".stripMargin

  // ---------- piecewise aggregate approximation + SAX symbols ----------

  /** PAA segment count per user series. */
  val PaaSegments = 8

  /** Piecewise Aggregate Approximation over the gap-filled series (the
    * time-series-indexing primitive of Keogh et al.: a length-n series
    * compressed to W segment means), plus a SAX-style symbol per segment
    * from global quartile breakpoints — the representation similarity
    * search and motif mining run on when the raw series is too long to
    * compare pointwise.
    *
    * Exactness: day index i and segment `(i·W) div n` are pure integers
    * (a series shorter than W legitimately hits only n of the W segment
    * ids — the standard integer bucketing); segment means floor to
    * integer cents; the quartile breakpoints are the shared sort-based
    * interpolated percentile at position fractions 0.25/0.5/0.75 —
    * QUARTER-valued over integer inputs, i.e. dyadic fractions exactly
    * representable in a double, so every symbol comparison is exact
    * cross-engine (a non-dyadic fraction like decile 0.1 would NOT be —
    * do not generalize the breakpoints without revisiting this). Shape: the fill window's
    * user partitioning serves the index window and the segment rollup
    * with no new exchange; the breakpoint table is ONE 1-row broadcast;
    * output is |users|·W rows. The segment table feeds BOTH the
    * breakpoint aggregate and the final projection — left declarative,
    * Spark recomputes the whole series build per branch (measured 2×
    * the gap-fill cost at the 100× scale point), so the |users|·W-row
    * segment table is `localCheckpoint`ed once (same precedent as the
    * dedup connected-components rounds) and the corpus-sized input is
    * scanned exactly as often as the gap fill itself.
    */
  def paa(s: SparkSession, d: String): DataFrame = {
    val W = PaaSegments
    val wUser = Window.partitionBy(col("user_id"))
    val segPlan = filledSeries(s, d)
      .withColumn("idx", col("day") - min(col("day")).over(wUser))
      .withColumn("n", max(col("day")).over(wUser)
        - min(col("day")).over(wUser) + 1L)
      .withColumn("seg", expr(s"(idx * $W) div n"))
      .groupBy(col("user_id"), col("seg"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("filled_cents")).as("sum_cents"))
      .withColumn("mean_cents",
        expr("sum_cents div n_days"))
    val seg = segPlan.localCheckpoint()
    val breaks = seg.agg(
      expr("percentile(mean_cents, 0.25)").as("q1"),
      expr("percentile(mean_cents, 0.5)").as("q2"),
      expr("percentile(mean_cents, 0.75)").as("q3"))
    seg.crossJoin(broadcast(breaks))
      .withColumn("symbol",
        ((col("mean_cents") > col("q1")).cast("int") +
          (col("mean_cents") > col("q2")).cast("int") +
          (col("mean_cents") > col("q3")).cast("int")))
      .select(col("user_id"), col("seg"), col("n_days"), col("sum_cents"),
        col("mean_cents"), col("symbol"))
      .orderBy(col("user_id"), col("seg"))
  }

  val paaSql: String = {
    val W = PaaSegments
    s"""WITH filled AS ($gapFillSql
       |), idxd AS (
       |  SELECT user_id, filled_cents,
       |         day - MIN(day) OVER (PARTITION BY user_id) AS idx,
       |         MAX(day) OVER (PARTITION BY user_id)
       |           - MIN(day) OVER (PARTITION BY user_id) + 1 AS n
       |  FROM filled
       |), seg AS (
       |  SELECT user_id, (idx * $W) // n AS seg, COUNT(*) AS n_days,
       |         CAST(SUM(filled_cents) AS BIGINT) AS sum_cents
       |  FROM idxd GROUP BY user_id, (idx * $W) // n
       |), m AS (
       |  SELECT *, sum_cents // n_days AS mean_cents FROM seg
       |), breaks AS (
       |  SELECT quantile_cont(mean_cents, 0.25) AS q1,
       |         quantile_cont(mean_cents, 0.5)  AS q2,
       |         quantile_cont(mean_cents, 0.75) AS q3
       |  FROM m
       |)
       |SELECT user_id, seg, n_days, sum_cents, mean_cents,
       |       CAST(CASE WHEN mean_cents > q1 THEN 1 ELSE 0 END
       |          + CASE WHEN mean_cents > q2 THEN 1 ELSE 0 END
       |          + CASE WHEN mean_cents > q3 THEN 1 ELSE 0 END AS INT)
       |         AS symbol
       |FROM m CROSS JOIN breaks
       |ORDER BY user_id, seg""".stripMargin
  }

  // ---------- rolling window statistics over the daily revenue series ----

  /** EWMA window length (terms) and the implied weight denominator
    * Σ 2^j, j<8 = 255: ewma = ewma_num / 255.
    */
  val EwmaTerms = 8

  /** Rolling daily-revenue statistics: the company-wide order series on a
    * DENSE day spine (silent days become explicit zero rows — frame
    * semantics over a gappy series silently shrink the window), with a
    * trailing 7-day sum/min/max/count, day-over-day delta, and an
    * EXPONENTIALLY weighted moving average in exact integers: the EWMA
    * with α = 1/2 truncated to [[EwmaTerms]] terms has dyadic weights
    * 2^(7-j), so the NUMERATOR `Σ rev(t-j)·2^(7-j)` is an exact BIGINT
    * and the consumer divides by 255 — no float ever accumulates (the
    * trend/gini discipline applied to smoothing).
    *
    * Scale shape: the one row-scaled pass is the (day) hash aggregate
    * with map-side combine; everything after operates on the
    * calendar-bounded daily table (~2,400 rows for the driver's 7-year
    * span at ANY SF — this is the same bounded-domain argument as
    * [[graft.operators.EventOps.trend]]), so the dense spine generation
    * and the single-series windows are domain-bounded, not row-scaled.
    */
  def rollingStats(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(expr(s"unix_millis(CAST(o_orderdate AS TIMESTAMP)) div $DayMs").as("day"),
        cents(col("o_totalprice")).as("v"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_orders"), sum(col("v")).as("day_cents"))
    val spine = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val dense = spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("day_cents"), lit(0L)).as("day_cents"))
    val w7 = Window.orderBy(col("day")).rowsBetween(-6, 0)
    val wLag = Window.orderBy(col("day"))
    val ewmaNum = (0 until EwmaTerms).map { j =>
      val term = if (j == 0) col("day_cents")
        else coalesce(lag(col("day_cents"), j).over(wLag), lit(0L))
      term * lit(1L << (EwmaTerms - 1 - j))
    }.reduce(_ + _)
    dense.select(col("day"), col("n_orders"), col("day_cents"),
        sum(col("day_cents")).over(w7).as("ma7_cents"),
        min(col("day_cents")).over(w7).as("min7_cents"),
        max(col("day_cents")).over(w7).as("max7_cents"),
        count(lit(1)).over(w7).as("n7"),
        (col("day_cents") - lag(col("day_cents"), 1).over(wLag))
          .as("delta_cents"),
        ewmaNum.as("ewma_num"))
      .orderBy(col("day"))
  }

  val rollingStatsSql: String = {
    val ewma = (0 until EwmaTerms).map { j =>
      val w = 1L << (EwmaTerms - 1 - j)
      if (j == 0) s"day_cents * $w"
      else s"COALESCE(lag(day_cents, $j) OVER (ORDER BY day), 0) * $w"
    }.mkString(" + ")
    s"""WITH daily AS (
       |  SELECT epoch_ms(o_orderdate) // $DayMs AS day,
       |         COUNT(*) AS n_orders,
       |         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
       |           AS BIGINT) AS day_cents
       |  FROM orders GROUP BY 1),
       |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
       |spine AS (SELECT unnest(generate_series(lo, hi)) AS day FROM b),
       |dense AS (
       |  SELECT s.day, COALESCE(d.n_orders, 0) AS n_orders,
       |         COALESCE(d.day_cents, 0) AS day_cents
       |  FROM spine s LEFT JOIN daily d USING (day))
       |SELECT day, CAST(n_orders AS BIGINT) AS n_orders, day_cents,
       |       CAST(SUM(day_cents) OVER w7 AS BIGINT) AS ma7_cents,
       |       CAST(MIN(day_cents) OVER w7 AS BIGINT) AS min7_cents,
       |       CAST(MAX(day_cents) OVER w7 AS BIGINT) AS max7_cents,
       |       CAST(COUNT(*) OVER w7 AS BIGINT) AS n7,
       |       CAST(day_cents - lag(day_cents, 1) OVER (ORDER BY day)
       |         AS BIGINT) AS delta_cents,
       |       CAST($ewma AS BIGINT) AS ewma_num
       |FROM dense
       |WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
       |ORDER BY day""".stripMargin
  }

  // ---------- weekday seasonality decomposition ----------

  /** Additive seasonal decomposition of daily revenue by WEEKDAY in
    * exact rational form: each day's revenue against its weekday's mean,
    * with the residual cross-multiplied (`resid_num = day_cents·n_w −
    * sum_w`; the consumer divides by n_w) so no float division decides a
    * value — the [[graft.operators.EventOps.trend]] exactness discipline
    * applied to the classic trend/seasonal/residual split. Weekday is
    * pure integer arithmetic on the epoch-day (`(day + 4) mod 7`, 0 =
    * Sunday — engine-neutral, where dayofweek() conventions differ
    * between Spark and DuckDB). One row-scaled (day) aggregate; the
    * weekday profile is a 7-row broadcast joined back to the
    * calendar-bounded daily table.
    */
  def seasonalDecompose(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(expr(s"unix_millis(CAST(o_orderdate AS TIMESTAMP)) div $DayMs").as("day"),
        cents(col("o_totalprice")).as("v"))
      .groupBy(col("day"))
      .agg(sum(col("v")).as("day_cents"))
      .withColumn("weekday", ((col("day") + 4) % 7).cast("int"))
    val profile = daily.groupBy(col("weekday"))
      .agg(count(lit(1)).as("n_w"), sum(col("day_cents")).as("sum_w"))
    daily.join(broadcast(profile), Seq("weekday"))
      .select(col("day"), col("weekday"), col("day_cents"), col("n_w"),
        col("sum_w"),
        (col("day_cents") * col("n_w") - col("sum_w")).as("resid_num"))
      .orderBy(col("day"))
  }

  val seasonalDecomposeSql: String =
    s"""WITH daily AS (
       |  SELECT epoch_ms(o_orderdate) // $DayMs AS day,
       |         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
       |           AS BIGINT) AS day_cents
       |  FROM orders GROUP BY 1),
       |wd AS (SELECT *, CAST((day + 4) %% 7 AS INT) AS weekday FROM daily),
       |profile AS (
       |  SELECT weekday, COUNT(*) AS n_w,
       |         CAST(SUM(day_cents) AS BIGINT) AS sum_w
       |  FROM wd GROUP BY weekday)
       |SELECT day, weekday, day_cents, n_w, sum_w,
       |       CAST(day_cents * n_w - sum_w AS BIGINT) AS resid_num
       |FROM wd JOIN profile USING (weekday)
       |ORDER BY day""".stripMargin
      .replace("%%", "%")
}
