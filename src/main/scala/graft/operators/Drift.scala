package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.Column

import graft.Tables
import graft.operators.RefTransforms.cents

/** Distribution-drift statistics — the monitoring tier a training-data
  * pipeline runs between corpus snapshots, sources, or time slices
  * before trusting a refresh: a numeric two-sample Kolmogorov–Smirnov
  * distance and a categorical total-variation distance, both EXACT.
  *
  * Both statistics are rationals with denominator N₁·N₂ (the KS sup and
  * the TV half-sum cross-multiplied), so the whole report is integer
  * arithmetic — no FP ECDF, no engine-dependent sup location — with
  * products accumulated in DECIMAL(38,0) ≡ HUGEINT, BIGINT-safe past
  * 10⁹-row groups (the same precision discipline as the 3σ gate).
  *
  * Scale shapes:
  *  - KS: one (value) groupBy collapses the fact table to its SUPPORT
  *    (distinct cents values). For a near-continuous measure like
  *    o_totalprice that support is row-count-sized, so the ECDF prefix
  *    sum is DISTRIBUTED as a classic two-phase scan: range-bucket the
  *    support, per-bucket running-sum windows (parallel, bounded), then
  *    a global window over only the ≤1024 bucket TOTALS to produce the
  *    per-bucket offsets, broadcast back and added. No task ever sees a
  *    row-scaled single-partition window; the sup is a TakeOrdered head.
  *  - TV: one (category) groupBy to ≤|domain| rows, a 1-row totals
  *    broadcast, one fold. Nothing wide anywhere.
  */
object Drift {

  /** Exact floor division on non-negative decimals: Spark's decimal `/`
    * rounds HALF_UP at the result scale (a boundary hazard against
    * DuckDB's flooring `//`), but subtracting the remainder first makes
    * the division exact — no rounding can occur on a zero-remainder
    * quotient, so the result is the true floor in both engines.
    *
    * A zero divisor (a degenerate input where one population is empty)
    * yields NULL — explicitly, so both engines agree: the oracles guard
    * with NULLIF where an unguarded DuckDB `//` would raise a
    * division-by-zero error while Spark returned silent NULLs, turning
    * the hash gate into a crash-vs-NULL divergence.
    */
  private def floorDiv(a: Column, b: Column): Column =
    when(b === lit(0L).cast("decimal(38,0)"), lit(null))
      .otherwise((a - pmod(a, b)) / b).cast("long")

  /** Exact two-sample KS between 'O' and 'F' order-status populations on
    * o_totalprice. Ties are handled by evaluating the ECDF AFTER each
    * distinct value (right-continuous, the textbook definition) — the
    * per-value groupBy makes that exact by construction. Output one row:
    * group sizes, the integer sup numerator `max|c₁N₂ − c₂N₁|`, its
    * ppm form `10⁶·sup div (N₁N₂)`, and the smallest value attaining
    * the sup (deterministic argmax).
    */
  def driftKs(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("O", "F"))
      .select((col("o_orderstatus") === "O").cast("long").as("g"),
        cents(col("o_totalprice")).as("c"))
    val support = base.groupBy(col("c"))
      .agg(sum(col("g")).as("d1"), sum(lit(1L) - col("g")).as("d2"))
    // Two-phase distributed prefix sum over the support. A bare
    // `Window.orderBy(c)` would funnel every distinct value through ONE
    // task — fatal when the measure is near-continuous and the support
    // approaches the row count. Instead: (1) hash each value into one of
    // nBuckets equal-width ranges of [cmin, cmax] (the range agg is a
    // 1-row broadcast), (2) run the running sum per bucket — parallel,
    // each task sees ~|support|/nBuckets rows, (3) compute each bucket's
    // EXCLUSIVE offset with a global window over only the bucket totals
    // (≤nBuckets rows — domain-sized by construction, never row-scaled),
    // (4) broadcast the offsets back and add. Values are identical to
    // the single-window form, so the oracle keeps the textbook ECDF SQL.
    val nBuckets = 1024L
    // r16 optimization: the bucket range AND the population totals come
    // from ONE 1-row aggregate over the base scan (min/max over the
    // support equal min/max over the base by definition; the totals were
    // previously a SEPARATE full base scan cross-joined in at the end) —
    // n1/n2 ride the same broadcast row as cmin/cmax, so the tot arm's
    // extra pass over orders is gone (guide §1.2). The support's own
    // aggregation exchange is referenced by both the running-sum and the
    // bucket-totals arm; AQE stage reuse computes it once.
    val rt = base.agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"),
      sum(col("g")).cast("decimal(38,0)").as("n1"),
      sum(lit(1L) - col("g")).cast("decimal(38,0)").as("n2"))
    val bucketed = support.crossJoin(broadcast(rt))
      .withColumn("bkt",
        floor((col("c") - col("cmin")) * nBuckets /
          (col("cmax") - col("cmin") + 1L)).cast("long"))
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = bucketed
      .withColumn("p1", sum(col("d1")).over(wIn))
      .withColumn("p2", sum(col("d2")).over(wIn))
    val wOff = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // r16 optimization note: deriving these offsets from INTRA's running
    // sums (bucket total = max of the inclusive prefix) was built,
    // verified, and A/B-measured SLOWER (0.86 s vs 0.66 s isolated at
    // sf0.1): AQE stage reuse ALREADY dedupes the support aggregation
    // under both arms (ReusedExchange confirmed in the final plan), so
    // the rewrite only replaced a parallel partial-aggregate arm with a
    // serial dependency on the window stage. Kept the bucketed-side
    // groupBy deliberately; the heavy support exchange is computed once
    // either way.
    val offs = bucketed.groupBy(col("bkt"))
      .agg(sum(col("d1")).as("t1"), sum(col("d2")).as("t2"))
      .select(col("bkt"),
        coalesce(sum(col("t1")).over(wOff), lit(0L)).as("off1"),
        coalesce(sum(col("t2")).over(wOff), lit(0L)).as("off2"))
    val ecdf = intra.join(broadcast(offs), Seq("bkt"))
      .withColumn("c1", (col("p1") + col("off1")).cast("decimal(38,0)"))
      .withColumn("c2", (col("p2") + col("off2")).cast("decimal(38,0)"))
    ecdf
      .withColumn("num", abs(col("c1") * col("n2") - col("c2") * col("n1")))
      .orderBy(col("num").desc, col("c"))
      .limit(1)
      .select(
        col("n1").cast("long").as("n1"),
        col("n2").cast("long").as("n2"),
        col("num").cast("long").as("ks_num"),
        floorDiv(col("num") * lit(1000000L).cast("decimal(38,0)"),
          col("n1") * col("n2")).as("ks_ppm"),
        col("c").as("at_cents"))
  }

  val driftKsSql: String =
    """WITH base AS (
      |  SELECT CAST(o_orderstatus = 'O' AS BIGINT) AS g,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      |  FROM orders WHERE o_orderstatus IN ('O', 'F')
      |), support AS (
      |  SELECT c, CAST(SUM(g) AS HUGEINT) AS d1,
      |         CAST(SUM(1 - g) AS HUGEINT) AS d2
      |  FROM base GROUP BY c
      |), ecdf AS (
      |  SELECT c,
      |         SUM(d1) OVER (ORDER BY c
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
      |         SUM(d2) OVER (ORDER BY c
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
      |  FROM support
      |), tot AS (
      |  SELECT CAST(SUM(g) AS HUGEINT) AS n1,
      |         CAST(SUM(1 - g) AS HUGEINT) AS n2
      |  FROM base
      |)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |       CAST(abs(c1 * n2 - c2 * n1) AS BIGINT) AS ks_num,
      |       CAST(1000000 * abs(c1 * n2 - c2 * n1) // NULLIF(n1 * n2, 0)
      |         AS BIGINT) AS ks_ppm,
      |       c AS at_cents
      |FROM ecdf CROSS JOIN tot
      |ORDER BY abs(c1 * n2 - c2 * n1) DESC, c
      |LIMIT 1""".stripMargin

  /** Exact total-variation distance between the event-type distributions
    * of the first and second half of the event-time range:
    * `TV = ½ Σ|p₁ − p₂|`, cross-multiplied to the integer numerator
    * `Σ|o₁N₂ − o₂N₁|` over denominator `2·N₁N₂`. One per-type row
    * (observed counts both sides, the per-type ppm gap) plus the
    * verdict available from the same integers — the categorical-mix
    * shift monitor (source/language/type composition) every corpus
    * refresh gate needs. The midpoint derives from min/max epoch-ms
    * (one tiny agg, broadcast); all downstream work is |domain|-sized.
    */
  def driftTv(s: SparkSession, d: String): DataFrame = {
    val e = EventOps.withTsMs(Tables.events(s, d))
      .select(col("event_type"), col("ts_ms"))
    val mid = e.agg(((min(col("ts_ms")) + max(col("ts_ms"))) / 2L)
      .cast("long").as("mid_ms"))
    val sided = e.crossJoin(broadcast(mid))
      .select(col("event_type"),
        (col("ts_ms") < col("mid_ms")).cast("long").as("g"))
    val byType = sided.groupBy(col("event_type"))
      .agg(sum(col("g")).as("o1"), sum(lit(1L) - col("g")).as("o2"))
    // r16 optimization: the population totals are the COLUMN SUMS of the
    // per-type table (every event carries exactly one event_type), so
    // they ride the same |domain|-sized single-partition window the
    // tv_ppm half-sum already pays — the predecessor's separate
    // whole-scan aggregate + cross join re-read the event table a third
    // time for two numbers (guide §1.2).
    val wAll = Window.partitionBy()
    byType
      .withColumn("n1", sum(col("o1")).over(wAll).cast("decimal(38,0)"))
      .withColumn("n2", sum(col("o2")).over(wAll).cast("decimal(38,0)"))
      .withColumn("gap",
        abs(col("o1").cast("decimal(38,0)") * col("n2") -
          col("o2").cast("decimal(38,0)") * col("n1")))
      .select(col("event_type"), col("o1"), col("o2"),
        floorDiv(col("gap") * lit(1000000L).cast("decimal(38,0)"),
          col("n1") * col("n2")).as("gap_ppm"),
        floorDiv(sum(col("gap")).over(Window.partitionBy()) *
          lit(1000000L).cast("decimal(38,0)"),
          lit(2L).cast("decimal(38,0)") * col("n1") * col("n2"))
          .as("tv_ppm"))
      .orderBy(col("event_type"))
  }

  val driftTvSql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_ms(ts) AS ts_ms FROM events
      |), mid AS (
      |  SELECT (MIN(ts_ms) + MAX(ts_ms)) // 2 AS mid_ms FROM e
      |), sided AS (
      |  SELECT event_type,
      |         CAST(ts_ms < mid_ms AS BIGINT) AS g
      |  FROM e CROSS JOIN mid
      |), bytype AS (
      |  SELECT event_type, CAST(SUM(g) AS BIGINT) AS o1,
      |         CAST(SUM(1 - g) AS BIGINT) AS o2
      |  FROM sided GROUP BY event_type
      |), tot AS (
      |  SELECT CAST(SUM(g) AS HUGEINT) AS n1,
      |         CAST(SUM(1 - g) AS HUGEINT) AS n2
      |  FROM sided
      |)
      |SELECT event_type, o1, o2,
      |       CAST(1000000 * abs(o1 * n2 - o2 * n1) // NULLIF(n1 * n2, 0)
      |         AS BIGINT) AS gap_ppm,
      |       CAST(1000000 * SUM(abs(o1 * n2 - o2 * n1)) OVER ()
      |            // NULLIF(2 * n1 * n2, 0) AS BIGINT) AS tv_ppm
      |FROM bytype CROSS JOIN tot
      |ORDER BY event_type""".stripMargin

  /** Exact per-group GINI coefficient of order value — the inequality
    * statistic (`G = (2Σᵢ i·xᵢ − (n+1)Σx) / (n·Σx)` over ascending
    * ranks) in pure integer arithmetic, emitted as exact ppm. The
    * rank-weighted sum is computed WITHOUT a global per-group sort:
    * values collapse to their (group, value, multiplicity) support
    * first, and a tied block of m copies of x starting after exclusive
    * prefix count r₀ contributes `x·(m·r₀ + m(m+1)/2)` — tie-order
    * independent, so ranks never need materializing per row. The
    * exclusive prefix count reuses the [[driftKs]] two-phase pattern:
    * per-(group, range-bucket) running sums in parallel, bucket offsets
    * from a window over ≤nBuckets totals per group, broadcast back.
    * Accumulation rides DECIMAL(38,0) (rank·value products overflow
    * int64 past ~10⁷ rows); the oracle states the textbook row_number
    * form, equal by the tie-block identity.
    */
  def gini(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderstatus").as("st"),
        cents(col("o_totalprice")).as("c"))
    val support = base.groupBy(col("st"), col("c"))
      .agg(count(lit(1)).as("m"))
    val nBuckets = 1024L
    val rng = base.agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"))
    val bucketed = support.crossJoin(broadcast(rng))
      .withColumn("bkt",
        floor((col("c") - col("cmin")) * nBuckets /
          (col("cmax") - col("cmin") + 1L)).cast("long"))
    val wIn = Window.partitionBy(col("st"), col("bkt")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val intra = bucketed
      .withColumn("p", coalesce(sum(col("m")).over(wIn), lit(0L)))
    val wOff = Window.partitionBy(col("st")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // r16 optimization note (same A/B as driftKs): offsets-from-INTRA
    // (max(p + m) = bucket total) measured slower (1.17 s vs 0.96 s
    // isolated at sf0.1) because AQE already reuses the support
    // exchange under both arms; the independent groupBy arm overlaps
    // with the window stage instead of waiting on it. Kept.
    val offs = bucketed.groupBy(col("st"), col("bkt"))
      .agg(sum(col("m")).as("t"))
      .select(col("st"), col("bkt"),
        coalesce(sum(col("t")).over(wOff), lit(0L)).as("off"))
    val dec = "decimal(38,0)"
    intra.join(broadcast(offs), Seq("st", "bkt"))
      .withColumn("r0", (col("p") + col("off")).cast(dec))
      .withColumn("md", col("m").cast(dec))
      .withColumn("cd", col("c").cast(dec))
      // m(m+1)/2 stays in long (`div` exact — m(m+1) is always even);
      // multiplicity of one exact cent value within one group above
      // ~3·10⁹ rows would overflow it, the same documented bound as the
      // association-rules lift rational
      .withColumn("s_block",
        col("cd") * (col("md") * col("r0") +
          expr("m * (m + 1) div 2").cast(dec)))
      .groupBy(col("st"))
      .agg(sum(col("m")).as("n"),
        sum(col("cd") * col("md")).as("t"),
        sum(col("s_block")).as("sr"))
      .select(col("st").as("o_orderstatus"), col("n"),
        col("t").cast("long").as("sum_cents"),
        floorDiv(
          (lit(2).cast(dec) * col("sr") -
            (col("n") + 1).cast(dec) * col("t")) *
            lit(1000000L).cast(dec),
          col("n").cast(dec) * col("t")).as("gini_ppm"))
      .orderBy(col("o_orderstatus"))
  }

  val giniSql: String =
    """WITH vals AS (
      |  SELECT o_orderstatus AS st,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      |  FROM orders
      |), ranked AS (
      |  SELECT st, c,
      |         row_number() OVER (PARTITION BY st ORDER BY c) AS i
      |  FROM vals
      |), agg AS (
      |  SELECT st, COUNT(*) AS n, CAST(SUM(c) AS HUGEINT) AS t,
      |         CAST(SUM(CAST(i AS HUGEINT) * c) AS HUGEINT) AS s
      |  FROM ranked GROUP BY st
      |)
      |SELECT st AS o_orderstatus, n, CAST(t AS BIGINT) AS sum_cents,
      |       CAST((2 * s - (n + 1) * t) * 1000000 // NULLIF(n * t, 0)
      |         AS BIGINT) AS gini_ppm
      |FROM agg ORDER BY o_orderstatus""".stripMargin
}
