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

  def gapFill(s: SparkSession, d: String): DataFrame = {
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
      .orderBy(col("user_id"), col("day"))
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
}
