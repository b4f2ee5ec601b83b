package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RefTransforms.cents

/** Event-time operators over the `events` table — the batch-equivalent forms
  * of the streaming windows (SURVEY.md §2k), plus JSON column extraction.
  *
  * The reference's streaming model is event-per-file micro-batch
  * (README.md:155-187); the true Structured Streaming path (file source +
  * Trigger.AvailableNow, watermarks, session windows) lives in
  * graft.streaming.Streams and is exercised by its spec. These batch forms
  * compute the identical answers and are what the DuckDB oracle can check.
  *
  * All window bucketing is done in epoch-millis integer arithmetic so
  * Spark and DuckDB agree bit-for-bit regardless of timestamp physical
  * precision (events.ts is parquet timestamp[ns]; both engines read it
  * at micro precision, and ms arithmetic is exact in both).
  */
object EventOps {

  /** Adds `ts_ms: long`. Tolerates every physical encoding the parquet
    * writer may have used for `ts`: TIMESTAMP(NANOS) read as raw long
    * (nanosAsLong mode), naive TIMESTAMP_NTZ (isAdjustedToUTC=false, the
    * shape `unix_millis` rejects outright), and instant TIMESTAMP.
    */
  def withTsMs(events: DataFrame): DataFrame =
    events.withColumn("ts_ms", events.schema("ts").dataType.typeName match {
      case "long" => // nanosAsLong mode; integer div keeps 64-bit exact
        expr("ts div 1000000")
      case "timestamp_ntz" =>
        // the cast interprets the naive wall clock in the session timezone —
        // pinned to UTC in Sessions.build, so this equals DuckDB's
        // epoch_ms(ts) on the same naive column
        unix_millis(col("ts").cast("timestamp"))
      case _ =>
        unix_millis(col("ts"))
    })

  private val HourMs  = 3600000L
  private val SlideMs = 1800000L
  private val GapMs   = 1800000L

  /** Tumbling 1-hour event-time windows via the native `window()` function
    * (same operator Structured Streaming uses with a watermark).
    */
  def tumbling(s: SparkSession, d: String): DataFrame = {
    val e = withTsMs(Tables.events(s, d))
      .withColumn("ts_t", timestamp_millis(col("ts_ms")))
    e.groupBy(window(col("ts_t"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("n"), col("value_cents"))
      .orderBy(col("window_start_ms"))
  }

  val tumblingSql: String =
    s"""SELECT (epoch_ms(ts) // $HourMs) * $HourMs AS window_start_ms,
       |       COUNT(*) AS n,
       |       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
       |FROM events GROUP BY 1 ORDER BY window_start_ms""".stripMargin

  /** Sliding windows: 1 hour long, every 30 minutes — each event lands in
    * exactly two windows.
    */
  def sliding(s: SparkSession, d: String): DataFrame = {
    val e = withTsMs(Tables.events(s, d))
      .withColumn("ts_t", timestamp_millis(col("ts_ms")))
    e.groupBy(window(col("ts_t"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("n"), col("value_cents"))
      .orderBy(col("window_start_ms"))
  }

  val slidingSql: String =
    s"""WITH exploded AS (
       |  SELECT (epoch_ms(ts) // $SlideMs) * $SlideMs AS s, value FROM events
       |  UNION ALL
       |  SELECT (epoch_ms(ts) // $SlideMs) * $SlideMs - $SlideMs AS s, value
       |  FROM events)
       |SELECT s AS window_start_ms, COUNT(*) AS n,
       |       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
       |FROM exploded GROUP BY s ORDER BY window_start_ms""".stripMargin

  /** Session windows (30-minute inactivity gap) per user, batch form:
    * lag → gap flag → running-sum session id → per-session rollup. The
    * streaming twin is `session_window()` / flatMapGroupsWithState in
    * graft.streaming.Streams.
    */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val e  = withTsMs(Tables.events(s, d))
    val w  = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("prev_ms", lag(col("ts_ms"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > GapMs, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(wr))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("start_ms"),
        max(col("ts_ms")).as("end_ms"),
        sum(cents(col("value"))).as("value_cents"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  val sessionizeSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value,
       |         CASE WHEN lag(epoch_ms(ts), 1) OVER w IS NULL
       |                OR epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER w > $GapMs
       |              THEN 1 ELSE 0 END AS new_sess
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
       |), sessions AS (
       |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
       |                                ORDER BY ts_ms, event_id
       |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
       |  FROM flagged)
       |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, COUNT(*) AS n_events,
       |       MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
       |       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
       |FROM sessions GROUP BY user_id, sess_id
       |ORDER BY user_id, sess_id""".stripMargin

  /** As-of join — for each event, the user's most recent order at or
    * before the event time. Spark has no native ASOF operator; this is the
    * merge-scan formulation every time-series engine uses: union both
    * sides on the key, sort each key's timeline once, and let a running
    * `last(..., ignoreNulls)` carry the most recent order forward past
    * each event row. ONE shuffle on the key, O(rows) work, no
    * event×order-history intermediate at any scale (the previous non-equi
    * left join paired every event with the user's whole prior history
    * before row_number kept one). Sort order (t, is_order DESC, orderkey):
    * an order at exactly the event time counts ("at or before"), and equal
    * order timestamps resolve to the highest orderkey — same tie-break as
    * the oracle. Events with no prior order keep null order columns,
    * matching ASOF LEFT semantics.
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val e = withTsMs(Tables.events(s, d))
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val o = Tables.orders(s, d).select(
      col("o_custkey").as("user_id"),
      col("o_orderkey"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms"))
      // null-dated orders can never satisfy "at or before" (the join form's
      // order_ms <= ts is null-rejecting, and so is the oracle); without
      // this they'd sort first and leak their orderkey into last()
      .filter(col("order_ms").isNotNull)
    val merged = e.select(col("user_id"), col("ts_ms").as("t"),
        lit(0L).as("is_order"), col("event_id"), col("ts_ms"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("long").as("order_ms"))
      .unionByName(o.select(col("user_id"), col("order_ms").as("t"),
        lit(1L).as("is_order"), lit(null).cast("long").as("event_id"),
        lit(null).cast("long").as("ts_ms"),
        col("o_orderkey"), col("order_ms")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("is_order").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("asof_key", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_ms", last(col("order_ms"), ignoreNulls = true).over(w))
      .filter(col("is_order") === 0L)
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("asof_key").as("o_orderkey"), col("asof_ms").as("order_ms"))
      .orderBy(col("event_id"))
  }

  val asofJoinSql: String =
    """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, o_orderkey, order_ms
      |FROM events LEFT JOIN
      |  (SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS order_ms
      |   FROM orders) o
      |  ON user_id = o_custkey AND order_ms <= epoch_ms(ts)
      |QUALIFY row_number() OVER (PARTITION BY event_id
      |                           ORDER BY order_ms DESC NULLS LAST,
      |                                    o_orderkey DESC NULLS LAST) = 1
      |ORDER BY event_id""".stripMargin

  /** [[asofJoin]] through the NATIVE operator
    * ([[graft.plans.AsOfJoinExec]] — custom LogicalPlan + Strategy +
    * SparkPlan, the whole-operator extension tier): one hash exchange
    * and one sort per side, then a single forward merge pass per
    * partition with no timeline union, no null padding, no window
    * state. Identical semantics and oracle as the composed form;
    * AsOfJoinSpec pins the physical node and row-for-row equality.
    */
  def asofJoinNative(s: SparkSession, d: String): DataFrame = {
    val e = withTsMs(Tables.events(s, d))
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val o = Tables.orders(s, d).select(
        col("o_custkey").as("r_user_id"),
        col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms"))
      .filter(col("order_ms").isNotNull)
    graft.plans.AsOfJoin(e, o, "user_id", "r_user_id", "ts_ms",
        "order_ms", "o_orderkey")
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("o_orderkey"), col("order_ms"))
      .orderBy(col("event_id"))
  }

  /** Fixed event-type domain (deterministic schema — at scale you never
    * want pivot's value-discovery scan anyway). Declared before its users:
    * object vals initialize in declaration order.
    */
  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  val SaltFactor = 8

  /** Salted skew join: events carry only `EventTypes.size` = 5 distinct
    * join keys — a shuffle join on the raw key funnels the whole table
    * into 5 reducers no matter how many executors exist. The dimension
    * side is replicated `SaltFactor`× with a salt column, the fact side
    * draws a deterministic salt from event_id, and the join runs on
    * (key, salt) — each hot key now spreads over SaltFactor reducers. The
    * result provably equals the unsalted join (the oracle IS the unsalted
    * join). The merge hint forces the shuffle path the technique exists
    * for; at 100 TB AQE's skew split handles moderate SMJ skew
    * automatically, and explicit salting is the remedy when single keys
    * dominate whole partitions. The no-code AQE alternative is pinned in
    * RelationalSpec ("AQE skew-join splits the pathological key"): with
    * `spark.sql.adaptive.skewJoin` on, the runtime splits the hot
    * partition and the result is unchanged — but ONLY when no downstream
    * operator requires hash partitioning on the join key (a groupBy on
    * the key, as here, blocks the split; salting keeps working).
    */
  def skewJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = EventTypes.zipWithIndex
      .map { case (t, i) => (t, i + 1L) }.toDF("event_type", "weight")
    val salted = dim.withColumn("salt",
      explode(sequence(lit(0L), lit(SaltFactor - 1L))))
    val e = Tables.events(s, d)
      .select(col("event_type"), col("value"),
        // coalesce: a null event_id must still join (the oracle joins on
        // event_type alone) — park such rows in salt 0
        coalesce(pmod(col("event_id"), lit(SaltFactor.toLong)), lit(0L))
          .as("salt"))
    e.join(salted.hint("merge"), Seq("event_type", "salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("value")) * col("weight")).as("weighted_cents"))
      .orderBy(col("event_type"))
  }

  val skewJoinSql: String = {
    val values = EventTypes.zipWithIndex
      .map { case (t, i) => s"('$t', ${i + 1})" }.mkString(", ")
    s"""WITH dim(event_type, weight) AS (VALUES $values)
       |SELECT e.event_type, COUNT(*) AS n,
       |       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT) * weight)
       |            AS BIGINT) AS weighted_cents
       |FROM events e JOIN dim USING (event_type)
       |GROUP BY e.event_type ORDER BY event_type""".stripMargin
  }

  /** Tier dimension for the range join: (tier, lo, hi), half-open [lo, hi). */
  val ValueTiers: Seq[(String, Double, Double)] = Seq(
    ("t0", 0.0, 5.0), ("t1", 5.0, 25.0), ("t2", 25.0, 75.0),
    ("t3", 75.0, 150.0), ("t4", 150.0, 250.0), ("t5", 250.0, 400.0),
    ("t6", 400.0, 1000.0))

  val RangeBinWidth = 50.0

  /** Range join — each event matched to the tier whose [lo, hi) interval
    * contains its value, WITHOUT a non-equi join: both sides are binned
    * (each tier replicated to every `RangeBinWidth` bin it overlaps, each
    * event assigned its one bin), the join is a plain equi-join on the bin,
    * and the residual range predicate filters the joined rows. This is the
    * standard trick that keeps interval joins hash-partitionable at any
    * scale — the naive `value BETWEEN lo AND hi` condition compiles to a
    * nested-loop join that compares every event to every interval.
    */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tiers = ValueTiers.toDF("tier", "lo", "hi")
      .withColumn("bin", explode(sequence(
        floor(col("lo") / RangeBinWidth).cast("long"),
        floor((col("hi") - lit(1e-9)) / RangeBinWidth).cast("long"))))
    val e = Tables.events(s, d)
      .select(col("value"),
        floor(col("value") / RangeBinWidth).cast("long").as("bin"))
    e.join(tiers, Seq("bin"))
      .filter(col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
      .orderBy(col("tier"))
  }

  val rangeJoinSql: String = {
    val values = ValueTiers
      .map { case (t, lo, hi) => s"('$t', $lo, $hi)" }.mkString(", ")
    s"""WITH tiers(tier, lo, hi) AS (VALUES $values)
       |SELECT tier, COUNT(*) AS n,
       |       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
       |         AS value_cents
       |FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
       |GROUP BY tier ORDER BY tier""".stripMargin
  }

  /** The interval join written the NATURAL way — a plain non-equi
    * condition, no manual binning — relying on the injected
    * [[graft.plans.RangeJoinRewrite]] optimizer rule to compile it into
    * the binned equi-join shape (RangeJoinRewriteSpec pins the rewrite:
    * no nested-loop join in the plan, bin width from
    * `graft.rangeJoin.binWidth`). Same semantics and oracle as the
    * hand-binned [[rangeJoin]]; the pair demonstrates that the rewrite
    * and the manual form produce identical results.
    */
  def rangeJoinAuto(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tiers = ValueTiers.toDF("tier", "lo", "hi")
    Tables.events(s, d).select(col("value"))
      .join(tiers, col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
      .orderBy(col("tier"))
  }

  /** Order-interval length in days for [[intervalOverlap]]: every order
    * spans [orderdate, orderdate + 7] inclusive in day space.
    */
  val OverlapSpanDays = 7

  /** Bin width (days) for the overlap join — ≥ the interval span, so each
    * interval touches at most 2 bins and the replication factor is ≤ 2.
    */
  val OverlapBinDays = 8L

  /** Interval×interval OVERLAP join — the genomics/telemetry shape the
    * point-in-interval [[rangeJoin]] doesn't cover: pairs of orders from
    * the SAME customer whose 7-day fulfillment windows intersect. The
    * naive form is a θ-self-join (`s1 <= e2 AND s2 <= e1`) — a per-key
    * cartesian. The distributed form bins BOTH sides: each interval is
    * replicated to every [[OverlapBinDays]]-day bin it touches (≤ 2 bins,
    * span ≤ bin width), the join is a plain equi-join on
    * (custkey, bin) — hash-partitionable at any scale — the overlap
    * predicate runs as a residual, and the classic duplicate-elimination
    * rule keeps each pair exactly once: a pair is REPORTED only in the
    * bin containing the overlap's start `max(s1, s2)` (both copies exist
    * in that bin by construction, and in no earlier one). Day arithmetic
    * is exact integers, so the θ-join oracle states identical math.
    * Output is per-customer pair counts + summed overlap days — bounded
    * by the customer count, not the pair count.
    */
  def intervalOverlap(s: SparkSession, d: String): DataFrame = {
    val iv = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1990-01-01")).cast("long")
          .as("s"))
      .withColumn("e", col("s") + OverlapSpanDays)
    val binned = iv.withColumn("bin", explode(sequence(
      (col("s") / OverlapBinDays).cast("long"),
      (col("e") / OverlapBinDays).cast("long"))))
    val a = binned.select(col("o_custkey"), col("bin"),
      col("o_orderkey").as("k1"), col("s").as("s1"), col("e").as("e1"))
    val b = binned.select(col("o_custkey"), col("bin"),
      col("o_orderkey").as("k2"), col("s").as("s2"), col("e").as("e2"))
    a.join(b, Seq("o_custkey", "bin"))
      .filter(col("k1") < col("k2") &&
        col("s1") <= col("e2") && col("s2") <= col("e1") &&
        (greatest(col("s1"), col("s2")) / OverlapBinDays).cast("long")
          === col("bin"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(least(col("e1"), col("e2")) -
          greatest(col("s1"), col("s2")) + lit(1L)).as("overlap_days"))
      .orderBy(col("o_custkey"))
  }

  val intervalOverlapSql: String =
    s"""WITH iv AS (
       |  SELECT o_custkey, o_orderkey,
       |         datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS s,
       |         datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
       |           + $OverlapSpanDays AS e
       |  FROM orders
       |)
       |SELECT a.o_custkey, COUNT(*) AS n_pairs,
       |       CAST(SUM(least(a.e, b.e) - greatest(a.s, b.s) + 1)
       |            AS BIGINT) AS overlap_days
       |FROM iv a JOIN iv b
       |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
       | AND a.s <= b.e AND b.s <= a.e
       |GROUP BY a.o_custkey
       |ORDER BY a.o_custkey""".stripMargin

  /** Pivot: one row per user, one column per event type — conditional
    * aggregation under the hood, so the oracle is plain FILTERed counts.
    */
  def pivotEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .orderBy(col("user_id"))

  val pivotEventsSql: String = {
    val cols = EventTypes.map(t =>
      s"""COUNT(*) FILTER (WHERE event_type = '$t') AS "$t"""").mkString(",\n       ")
    s"""SELECT user_id,
       |       $cols
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** 2j JSON — extract a typed value out of the `props` JSON-string column
    * (the column-level JSON surface; the reference's JSON handling is at
    * file level, lambda_function.py:285).
    */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("k_sum"), count(lit(1)).as("n"),
        max(col("k")).as("k_max"))
      .orderBy(col("event_type"))

  val jsonExtractSql: String =
    """SELECT event_type,
      |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
      |       COUNT(*) AS n,
      |       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** 2j map family — the complex-type surface the array queries don't
    * touch: per-user event-type counts built into a MapType column
    * (`map_from_entries` over collected structs), pruned in-place with
    * `map_filter` (keep types seen ≥ 2×), sized with `size` BEFORE the
    * prune (the map-cardinality audit), then exploded back to relational
    * rows via `map_entries` for the oracle. The map stage is where a
    * feature-store-style pipeline keeps per-entity key→value state in one
    * row; the oracle states the same semantics relationally (HAVING for
    * the filter, a distinct-count window for the pre-filter size).
    */
  def mapFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("event_type"), col("n"))))).as("m"))
      .select(col("user_id"),
        size(col("m")).cast("long").as("n_types"),
        map_filter(col("m"), (_, v) => v >= 2).as("m"))
      .select(col("user_id"), col("n_types"),
        explode(map_entries(col("m"))).as("e"))
      .select(col("user_id"), col("n_types"),
        col("e.key").as("event_type"), col("e.value").as("n"))
      .orderBy(col("user_id"), col("event_type"))

  val mapFuncsSql: String =
    """WITH c AS (
      |  SELECT user_id, event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_types
      |  FROM c GROUP BY 1)
      |SELECT c.user_id, s.n_types, c.event_type, c.n
      |FROM c JOIN s ON c.user_id = s.user_id
      |WHERE c.n >= 2
      |ORDER BY c.user_id, c.event_type""".stripMargin

  /** 2j JSON, modernized — Spark 4 VARIANT: `parse_json` decodes each
    * payload ONCE into the binary variant encoding, then every
    * `variant_get` is a typed descent into that binary. [[jsonExtract]]'s
    * `get_json_object` re-parses the JSON STRING per extracted path — fine
    * for one path, linear blowup for many. At 100 TB the variant column is
    * what lands in parquet at ingest (shredded binary, parsed exactly
    * once), and every downstream query does typed O(paths) access instead
    * of per-query string parsing. `n_typed` counts payloads whose `k`
    * decodes as BIGINT — the schema-drift audit a semi-structured feed
    * needs, which is why both steps are the TRY forms: a malformed
    * payload or a re-typed field surfaces as a null (and a dropped
    * `n_typed`), never as a crashed ingest. Same oracle family as
    * jsonExtract, with DuckDB's TRY_CAST stating the identical
    * coerce-to-null semantics over the JSON text.
    */
  def variantExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), try_parse_json(col("props")).as("v"))
      .select(col("event_type"),
        expr("try_variant_get(v, '$.k', 'long')").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(col("k")).as("n_typed"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
      .orderBy(col("event_type"))

  val variantExtractSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |       COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_typed,
      |       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
      |       CAST(MIN(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
      |       CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The funnel's ordered stages: a user "reaches" stage k when an event
    * of that type occurs STRICTLY AFTER their stage-(k−1) arrival time —
    * the classic product-analytics sequential funnel, here over the
    * reference's event-per-file feed generalized to an event table.
    */
  val FunnelStages: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** Sequential funnel analysis over `events`: per stage, how many users
    * progressed through the full ordered prefix, plus the conversion rate
    * vs stage 1 in exact parts-per-million (integer `div` — portable).
    *
    * Shape at scale: stage k's arrival time needs stage k−1's, so this
    * is ONE pass over the event table: one exchange on `user_id`, then a
    * chain of whole-partition window aggregates (`min(CASE type=stage_k
    * AND ts > t_{k-1})`) that all share that single partitioning — no
    * per-stage re-scan, no joins. (The r16-optimization predecessor
    * phrased each stage as its own filter + per-user aggregate + join
    * back to events; Spark shares NO common subtrees across plan
    * branches — measured on the executed plan: zero ReusedExchange — so
    * the 4-stage chain re-scanned the event table ELEVEN times. Guide
    * §1.2/§2.4: one pass, one shuffle key.) The per-user window frames
    * are unordered whole-partition aggregates, so no sort is required;
    * per-user event counts bound the window buffer exactly as they
    * bounded the old per-user joins. The |users|-sized reduction and the
    * 4-row stack are exchange-free on top.
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val e = withTsMs(Tables.events(s, d))
      .select(col("user_id"), col("event_type"), col("ts_ms"))
    val w = Window.partitionBy(col("user_id"))
    // t1..t4 attach to every event row via chained whole-partition
    // windows over ONE user_id exchange: t1 = first stage-1 arrival;
    // t_k = first stage-k arrival strictly after t_{k-1} (NULL t_{k-1}
    // nulls the comparison, so an unreached prefix can never admit a
    // later stage)
    val staged = FunnelStages.indices.tail.foldLeft(
      e.withColumn("t1", min(when(
        col("event_type") === FunnelStages.head, col("ts_ms"))).over(w))) {
      case (df, i) =>
        df.withColumn(s"t${i + 1}", min(when(
          col("event_type") === FunnelStages(i) &&
            col("ts_ms") > col(s"t$i"), col("ts_ms"))).over(w))
    }
    // one row per user (t1..t4 are per-user constants), then one tiny
    // global conditional aggregate: stage-k reach = users with t_k set
    val stageMaxes = FunnelStages.indices.map(i =>
      max(col(s"t${i + 1}")).as(s"t${i + 1}"))
    val perUser = staged
      .groupBy(col("user_id"))
      .agg(stageMaxes.head, stageMaxes.tail: _*)
    val counts = perUser.agg(
      count(col("t1")).as("u1"), count(col("t2")).as("u2"),
      count(col("t3")).as("u3"), count(col("t4")).as("u4"))
    val stages = FunnelStages.zipWithIndex.map { case (st, i) =>
      s"${i + 1}L, '$st', u${i + 1}"
    }.mkString(", ")
    counts
      .select(expr(s"stack(${FunnelStages.size}, $stages)")
        .as(Seq("stage_idx", "stage", "users")), col("u1"))
      // greatest(_, 1): an event feed with no stage-1 arrivals yields an
      // all-zero funnel, not an ANSI divide-by-zero
      .withColumn("conv_ppm",
        expr("users * 1000000 div greatest(u1, 1)"))
      .select(col("stage_idx"), col("stage"), col("users"), col("conv_ppm"))
      .orderBy(col("stage_idx"))
  }

  /** Week length for cohort bucketing: integer epoch-ms weeks. */
  private val WeekMs = 7L * 24 * 3600 * 1000

  /** Cohort retention matrix: users bucketed by their FIRST-event week
    * (the cohort), then for each (cohort_week, week_offset ≥ 0) the count
    * of cohort members active in that later week, plus retention in exact
    * ppm of the cohort size. Week arithmetic is integer epoch-ms `div`,
    * so the matrix is bit-identical cross-engine.
    *
    * Scale shape: first-event week is one per-user min-aggregate; the
    * activity join keys on `user_id` (the same single logical shuffle key
    * as the funnel chain — the cohort table is |users|-sized and
    * broadcastable); the matrix aggregate groups |users|·|active weeks|
    * pairs already deduplicated per (user, week), so nothing scales with
    * raw event volume past the first distinct.
    */
  def retention(s: SparkSession, d: String): DataFrame = {
    val e = withTsMs(Tables.events(s, d))
      .select(col("user_id"), expr(s"ts_ms div $WeekMs").as("week"))
    val cohorts = e.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val cohortSize = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_users"))
    e.distinct() // one row per (user, active week)
      .join(cohorts, Seq("user_id"))
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(broadcast(cohortSize), Seq("cohort_week"))
      .withColumn("retention_ppm",
        expr("active_users * 1000000 div cohort_users"))
      .select(col("cohort_week"), col("week_offset"), col("active_users"),
        col("cohort_users"), col("retention_ppm"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val retentionSql: String =
    s"""WITH weeks AS (
       |  SELECT DISTINCT user_id, epoch_ms(ts) // $WeekMs AS week FROM events),
       |cohorts AS (
       |  SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id),
       |sizes AS (
       |  SELECT cohort_week, COUNT(*) AS cohort_users
       |  FROM cohorts GROUP BY cohort_week),
       |matrix AS (
       |  SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
       |         COUNT(*) AS active_users
       |  FROM weeks w JOIN cohorts c USING (user_id)
       |  GROUP BY 1, 2)
       |SELECT m.cohort_week, m.week_offset, m.active_users, s.cohort_users,
       |       m.active_users * 1000000 // s.cohort_users AS retention_ppm
       |FROM matrix m JOIN sizes s USING (cohort_week)
       |ORDER BY m.cohort_week, m.week_offset""".stripMargin

  private val DayMs = 24L * 3600 * 1000

  /** Daily active / new / cumulative-unique users — the growth-dashboard
    * triple, built on the FIRST-OCCURRENCE pattern: "cumulative distinct
    * users through day d" is NOT computed as a windowed `COUNT(DISTINCT)`
    * (which would re-scan every prior day's users per output row —
    * O(days·users), and Spark rejects DISTINCT window aggregates anyway)
    * but as the running sum of per-day FIRST-SEEN counts: one user-keyed
    * aggregate finds each user's first active day, a day-keyed count
    * turns that into new-users-per-day, and the cumulative series is a
    * prefix sum over the DAY domain — which is calendar-bounded
    * (~37k rows/century), so the single-partition running-sum window is
    * constant-sized at ANY event volume; the row-scaled work is the two
    * hash aggregates, both map-side-combined. Days with actives but no
    * first-timers surface as new_users = 0 via the left join's coalesce.
    */
  def cumulativeUniques(s: SparkSession, d: String): DataFrame = {
    val e = withTsMs(Tables.events(s, d))
      .select(col("user_id"), expr(s"ts_ms div $DayMs").as("day"))
      .distinct() // one row per (user, active day)
    val daily = e.groupBy(col("day")).agg(count(lit(1)).as("active_users"))
    val news = e.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(news, Seq("day"), "left")
      .select(col("day"), col("active_users"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("cumulative_users", sum(col("new_users")).over(w))
      .orderBy(col("day"))
  }

  val cumulativeUniquesSql: String =
    s"""WITH days AS (
       |  SELECT DISTINCT user_id, epoch_ms(ts) // $DayMs AS day FROM events),
       |daily AS (
       |  SELECT day, COUNT(*) AS active_users FROM days GROUP BY day),
       |firsts AS (
       |  SELECT user_id, MIN(day) AS day FROM days GROUP BY user_id),
       |news AS (
       |  SELECT day, COUNT(*) AS new_users FROM firsts GROUP BY day)
       |SELECT d.day, d.active_users,
       |       CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
       |       CAST(SUM(coalesce(n.new_users, 0)) OVER (
       |         ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |         AS cumulative_users
       |FROM daily d LEFT JOIN news n USING (day)
       |ORDER BY d.day""".stripMargin

  /** Trailing window width (days) for [[activeWindow]]. */
  val ActiveWindowDays = 7L

  /** Trailing-7-day distinct active users per day — the windowed
    * COUNT(DISTINCT) that does NOT decompose: distinct needs retraction
    * when a day leaves the window, so neither a prefix sum (the
    * [[cumulativeUniques]] trick) nor a sliding SUM applies, and the
    * naive day×window self-join re-counts every user W times. The exact
    * decomposition used here: a user is active on day D iff some
    * activity falls in [D-6, D], so each user's (deduped) activity days
    * merge into COVERAGE BLOCKS — consecutive days whose gaps are < W
    * fuse into [first, last + W - 1] — and each block contributes +1 at
    * its start and −1 past its end. The blocks build with one
    * user-partitioned window (gap flag → running block id), and the
    * deltas prefix-sum over the calendar-bounded day spine (the
    * [[cumulativeUniques]] discipline: ~37k rows/century, so the
    * single-partition running sum is constant-sized at any event
    * volume). Row-scaled work: one distinct, one user-keyed window, one
    * tiny delta aggregate. The oracle is the INDEPENDENT brute-force
    * windowed distinct (spine × activity range join) — feasible at
    * oracle scale, and any block-merge or fencepost bug hash-fails
    * against it.
    */
  def activeWindow(s: SparkSession, d: String): DataFrame = {
    val w = ActiveWindowDays
    val e = withTsMs(Tables.events(s, d))
      .select(col("user_id"), expr(s"ts_ms div $DayMs").as("day"))
      .distinct()
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val blocks = e
      .withColumn("gap", when(col("day") - lag(col("day"), 1).over(byUser)
        >= w, 1L).otherwise(0L))
      .withColumn("block", sum(col("gap")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("block"))
      .agg(min(col("day")).as("cover_from"),
        (max(col("day")) + lit(w - 1)).as("cover_to"))
    val deltas = blocks.select(col("cover_from").as("day"), lit(1L).as("dlt"))
      .unionByName(blocks.select((col("cover_to") + 1).as("day"),
        lit(-1L).as("dlt")))
      .groupBy(col("day")).agg(sum(col("dlt")).as("dlt"))
    val spine = e.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val run = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(deltas, Seq("day"), "left")
      .select(col("day"), coalesce(col("dlt"), lit(0L)).as("dlt"))
      .withColumn("active_7d", sum(col("dlt")).over(run))
      .select(col("day"), col("active_7d"))
      .orderBy(col("day"))
  }

  val activeWindowSql: String =
    s"""WITH days AS (
       |  SELECT DISTINCT user_id, epoch_ms(ts) // $DayMs AS day
       |  FROM events),
       |spine AS (
       |  SELECT UNNEST(range((SELECT MIN(day) FROM days),
       |                      (SELECT MAX(day) FROM days) + 1)) AS day)
       |SELECT s.day,
       |       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS active_7d
       |FROM spine s
       |LEFT JOIN days d
       |  ON d.day BETWEEN s.day - ${ActiveWindowDays - 1} AND s.day
       |GROUP BY s.day
       |ORDER BY s.day""".stripMargin

  /** Per-type linear TREND of daily revenue — ordinary least squares in
    * EXACT integer arithmetic: the slope and intercept leave as rational
    * pairs (numerator, shared denominator) built from the closed-form
    * normal equations `slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`, so no
    * floating-point accumulation exists anywhere (grouped FP sums are
    * partition-order-dependent — the engine's FpAggregateLint discipline)
    * and the oracle states the identical algebra. x is the day offset
    * from the GLOBAL first active day (one 1-row broadcast, keeping
    * the moment magnitudes bounded by the observation window, not the
    * epoch); y is the exact-cents daily sum. Row-scaled work is ONE
    * (type, day) hash aggregate with map-side combine; the per-type
    * moment aggregate runs over the calendar-bounded daily series.
    * The cross moments (x·y, and the derived numerators n·Σxy − Σx·Σy)
    * accumulate in DECIMAL(38,0) ≡ HUGEINT — BIGINT would wrap SILENTLY
    * in non-ANSI Spark while the DuckDB oracle wraps loudly, the same
    * divergence gini's rank·value products guard against — so the moments
    * stay exact to ~10³⁸ regardless of daily-revenue magnitude. The
    * rationals LEAVE as digit STRINGS, not DecimalType: a plain digit
    * string hashes identically under any canonicalization, whereas wide
    * decimals are representation-unstable across hashers (the r10
    * hash-red lesson — SchemaLintSpec pins no DecimalType ever escapes
    * a registered result schema again).
    */
  def trend(s: SparkSession, d: String): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = withTsMs(Tables.events(s, d))
      .select(col("event_type"), expr(s"ts_ms div $DayMs").as("day"),
        cents(col("value")).as("v"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("v")).as("y"))
    val day0 = daily.agg(min(col("day")).as("day0"))
    daily.crossJoin(broadcast(day0))
      .withColumn("x", col("day") - col("day0"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"))
      .select(col("event_type"), col("n_days"),
        (col("n_days") * col("sxy") - col("sx").cast(dec) * col("sy"))
          .cast(dec).cast("string").as("slope_num"),
        (col("n_days") * col("sxx") - col("sx").cast(dec) * col("sx"))
          .cast(dec).cast("string").as("slope_den"),
        (col("sy") * col("sxx") - col("sx").cast(dec) * col("sxy"))
          .cast(dec).cast("string").as("intercept_num"))
      .orderBy(col("event_type"))
  }

  val trendSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_ms(ts) // $DayMs AS day,
       |         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
       |           AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |d0 AS (SELECT MIN(day) AS day0 FROM daily),
       |pts AS (SELECT event_type, day - day0 AS x, y FROM daily, d0),
       |agg AS (
       |  SELECT event_type, COUNT(*) AS n,
       |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
       |         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
       |  FROM pts GROUP BY 1)
       |SELECT event_type, n AS n_days,
       |       CAST(n * sxy - sx * sy AS VARCHAR) AS slope_num,
       |       CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS VARCHAR)
       |         AS slope_den,
       |       CAST(sy * sxx - sx * sxy AS VARCHAR) AS intercept_num
       |FROM agg ORDER BY event_type""".stripMargin

  /** Next-event transition matrix — the Markov-chain view of user
    * behavior: for each user's time-ordered event stream, count the
    * (from_type → to_type) adjacent pairs, plus each row's share of its
    * from-type's outgoing transitions in exact ppm. The lag window and
    * the count aggregate both key on user_id/event pairs (one per-user
    * shuffle, then a 25-row matrix); tie order within a timestamp is
    * pinned by event_id so the chain is deterministic.
    */
  def transitions(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val pairs = withTsMs(Tables.events(s, d))
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val outTotals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("out_n"))
    pairs.join(broadcast(outTotals), Seq("from_type"))
      .withColumn("share_ppm", expr("n * 1000000 div out_n"))
      .select(col("from_type"), col("to_type"), col("n"), col("share_ppm"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val transitionsSql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type,
      |         lead(event_type, 1) OVER
      |           (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
      |           AS to_type
      |  FROM events),
      |pairs AS (
      |  SELECT event_type AS from_type, to_type, COUNT(*) AS n
      |  FROM ordered WHERE to_type IS NOT NULL
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS out_n
      |  FROM pairs GROUP BY from_type)
      |SELECT p.from_type, p.to_type, p.n,
      |       p.n * 1000000 // t.out_n AS share_ppm
      |FROM pairs p JOIN tot t USING (from_type)
      |ORDER BY p.from_type, p.to_type""".stripMargin

  val funnelSql: String = {
    // CTE chain mirroring the stage fold: sk = first qualifying arrival
    val ctes = FunnelStages.zipWithIndex.tail.map { case (stage, i) =>
      s"""s${i + 1} AS (
         |  SELECT e.user_id, MIN(epoch_ms(e.ts)) AS t${i + 1}
         |  FROM events e JOIN s$i USING (user_id)
         |  WHERE e.event_type = '$stage' AND epoch_ms(e.ts) > s$i.t$i
         |  GROUP BY e.user_id)""".stripMargin
    }.mkString(",\n")
    val unions = FunnelStages.zipWithIndex.map { case (stage, i) =>
      s"SELECT CAST(${i + 1} AS BIGINT) AS stage_idx, '$stage' AS stage, " +
        s"CAST((SELECT COUNT(*) FROM s${i + 1}) AS BIGINT) AS users"
    }.mkString("\nUNION ALL\n")
    s"""WITH s1 AS (
       |  SELECT user_id, MIN(epoch_ms(ts)) AS t1 FROM events
       |  WHERE event_type = '${FunnelStages.head}' GROUP BY user_id),
       |$ctes,
       |stages AS (
       |$unions)
       |SELECT stage_idx, stage, users,
       |       users * 1000000 // greatest((SELECT COUNT(*) FROM s1), 1)
       |         AS conv_ppm
       |FROM stages ORDER BY stage_idx""".stripMargin
  }

  /** Touch event types that can receive purchase credit. */
  val TouchTypes: Seq[String] = Seq("click", "view")

  /** Marketing attribution: every `purchase` event's revenue is credited
    * to a touch event (`click`/`view`) under two models — `last_touch`
    * (most recent strictly-earlier touch) and `first_touch` (earliest
    * strictly-earlier touch) — then rolled up to
    * `(model, touch_type) → purchases, revenue_cents`.
    *
    * Shape: ONE per-user window pass computes both models (two
    * ignore-nulls window aggregates over the same frame share the same
    * sort+exchange), the union just relabels columns, and the final
    * rollup groups on a 4-value key. Event order within a user is pinned
    * by `(ts_ms, event_id)` so same-millisecond touches attribute
    * identically on both engines. Purchases with no prior touch drop out
    * of both models (standard attribution semantics); at 100 TB this is
    * a single hash exchange on `user_id` — no self-join, no skew hazard
    * beyond one power user's event list, which the window sort handles.
    */
  def attribution(s: SparkSession, d: String): DataFrame = {
    val e = withTsMs(Tables.events(s, d))
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        col("event_type"), col("value"))
      .withColumn("touch",
        when(col("event_type").isin(TouchTypes: _*), col("event_type")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pur = e
      .withColumn("last_touch", last(col("touch"), ignoreNulls = true).over(w))
      .withColumn("first_touch", first(col("touch"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("v_cents", cents(col("value")))
    val lastM = pur.filter(col("last_touch").isNotNull)
      .select(lit("last_touch").as("model"),
        col("last_touch").as("touch_type"), col("v_cents"))
    val firstM = pur.filter(col("first_touch").isNotNull)
      .select(lit("first_touch").as("model"),
        col("first_touch").as("touch_type"), col("v_cents"))
    lastM.union(firstM)
      .groupBy(col("model"), col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("v_cents")).as("revenue_cents"))
      .orderBy(col("model"), col("touch_type"))
  }

  val attributionSql: String = {
    val touchIn = TouchTypes.map(t => s"'$t'").mkString(", ")
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, value,
       |         CASE WHEN event_type IN ($touchIn) THEN event_type END
       |           AS touch
       |  FROM events
       |), wnd AS (
       |  SELECT *,
       |         LAST_VALUE(touch IGNORE NULLS) OVER w AS last_touch,
       |         FIRST_VALUE(touch IGNORE NULLS) OVER w AS first_touch
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |), pur AS (
       |  SELECT *, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents
       |  FROM wnd WHERE event_type = 'purchase'
       |), credited AS (
       |  SELECT 'last_touch' AS model, last_touch AS touch_type, v_cents
       |  FROM pur WHERE last_touch IS NOT NULL
       |  UNION ALL
       |  SELECT 'first_touch', first_touch, v_cents
       |  FROM pur WHERE first_touch IS NOT NULL
       |)
       |SELECT model, touch_type, COUNT(*) AS n_purchases,
       |       CAST(SUM(v_cents) AS BIGINT) AS revenue_cents
       |FROM credited GROUP BY model, touch_type
       |ORDER BY model, touch_type""".stripMargin
  }

  /** Freshness threshold: a feed silent for longer than this against the
    * global high-water mark is stale.
    */
  val StaleAfterMs: Long = 6L * 3600 * 1000

  /** Per-feed freshness + coverage monitor — the ops audit a multi-source
    * ingest runs every cycle: for each event type (standing in for a
    * source feed), its volume, last-seen event time, staleness against
    * the GLOBAL high-water mark (one 1-row broadcast — a per-feed max
    * alone cannot tell "this feed died" from "everything stopped"), a
    * stale flag, and day-level coverage (days active vs days spanned,
    * missing days = silent gaps INSIDE the feed's own history — the
    * "source went dark mid-month" signal a freshness check at the edge
    * misses). Everything is integer epoch-day/millis arithmetic; one
    * groupBy on the type domain plus a distinct-days groupBy, both
    * |domain|-bounded after the first aggregation.
    */
  def freshness(s: SparkSession, d: String): DataFrame = {
    val e = withTsMs(Tables.events(s, d))
      .select(col("event_type"), col("ts_ms"),
        expr("ts_ms div 86400000").as("day"))
    // r16 optimization: ONE scan. days_active folds into the main
    // per-type aggregate as a single countDistinct (Catalyst plans one
    // distinct mixed with plain aggregates as a two-level aggregation on
    // the same scan — no Expand, no second pass), and the global
    // high-water mark is the max of the per-type maxima, so it rides a
    // |domain|-sized window over the aggregate instead of its own
    // whole-table pass + cross join. The predecessor scanned events
    // three times (global max, distinct-days, main aggregate) with no
    // shared exchange between them (guide §1.2).
    val wAll = Window.partitionBy()
    e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("first_ms"),
        max(col("ts_ms")).as("last_ms"),
        min(col("day")).as("d0"),
        max(col("day")).as("d1"),
        countDistinct(col("day")).as("days_active"))
      .withColumn("gmax", max(col("last_ms")).over(wAll))
      .select(col("event_type"), col("n_events"),
        col("first_ms"), col("last_ms"),
        (col("gmax") - col("last_ms")).as("staleness_ms"),
        (col("gmax") - col("last_ms") > StaleAfterMs).as("stale"),
        col("days_active"),
        (col("d1") - col("d0") + 1L).as("days_span"),
        (col("d1") - col("d0") + 1L - col("days_active")).as("missing_days"))
      .orderBy(col("event_type"))
  }

  val freshnessSql: String =
    s"""WITH e AS (
       |  SELECT event_type, epoch_ms(ts) AS ts_ms,
       |         epoch_ms(ts) // 86400000 AS day
       |  FROM events),
       |g AS (SELECT MAX(ts_ms) AS gmax FROM e),
       |days AS (SELECT event_type, COUNT(DISTINCT day) AS days_active
       |         FROM e GROUP BY event_type)
       |SELECT e.event_type, COUNT(*) AS n_events,
       |       MIN(ts_ms) AS first_ms, MAX(ts_ms) AS last_ms,
       |       MAX(gmax) - MAX(ts_ms) AS staleness_ms,
       |       MAX(gmax) - MAX(ts_ms) > $StaleAfterMs AS stale,
       |       CAST(MAX(days_active) AS BIGINT) AS days_active,
       |       MAX(day) - MIN(day) + 1 AS days_span,
       |       MAX(day) - MIN(day) + 1 - MAX(days_active) AS missing_days
       |FROM e CROSS JOIN g JOIN days ON e.event_type = days.event_type
       |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin


  /** Out-of-orderness audit — the measurement that SIZES a watermark:
    * per event type, how late events arrive relative to the stream's
    * event-time high-water mark at their arrival point (arrival order =
    * event_id, the ingest sequence). `lateness = running_max(ts) − ts`
    * over arrival order; an in-order stream audits to all zeros, and the
    * max/total lateness tell you what `withWatermark` delay loses what
    * fraction of data.
    *
    * The running max over a row-scaled global order uses the same
    * two-phase distributed prefix pattern as the drift ECDF
    * ([[Drift.driftKs]]), instantiated for MAX: range-bucket the arrival
    * axis (1-row min/max broadcast), per-bucket running-max windows
    * (parallel), EXCLUSIVE per-bucket offsets from a ≤1024-row global
    * window over bucket maxima, then `greatest(intra, offset)`. No task
    * ever sees a row-scaled single-partition window.
    */
  def lateness(s: SparkSession, d: String): DataFrame = {
    val nBuckets = 1024L
    val e = withTsMs(Tables.events(s, d))
      .select(col("event_id"), col("event_type"), col("ts_ms"))
    val rng = e.agg(min(col("event_id")).as("emin"),
      max(col("event_id")).as("emax"))
    val bucketed = e.crossJoin(broadcast(rng))
      .withColumn("bkt",
        expr(s"(event_id - emin) * $nBuckets div (emax - emin + 1)"))
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = bucketed.withColumn("p_max", max(col("ts_ms")).over(wIn))
    val wOff = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // r16 optimization: each bucket's maximum is the maximum of its own
    // running max (identical by monotonicity), so the offsets derive
    // from INTRA's already-exchanged-and-sorted rows instead of
    // re-bucketing the raw events — the shared exchange+sort+window
    // subtree is then canonically identical in both arms and AQE stage
    // reuse computes it once, where the predecessor's raw-side groupBy
    // re-scanned the event table (guide §2.4).
    val offs = intra.groupBy(col("bkt"))
      .agg(max(col("p_max")).as("b_max"))
      .select(col("bkt"), max(col("b_max")).over(wOff).as("off_max"))
    intra.join(broadcast(offs), Seq("bkt"))
      .withColumn("run_max", greatest(col("p_max"),
        coalesce(col("off_max"), lit(Long.MinValue))))
      .withColumn("late_ms", col("run_max") - col("ts_ms"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("late_ms") > 0L).cast("long")).as("n_late"),
        max(col("late_ms")).as("max_late_ms"),
        sum(col("late_ms")).as("sum_late_ms"))
      .orderBy(col("event_type"))
  }

  val latenessSql: String =
    """WITH e AS (
      |  SELECT event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
      |r AS (
      |  SELECT *, MAX(ts_ms) OVER (ORDER BY event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
      |  FROM e)
      |SELECT event_type, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(run_max - ts_ms > 0 AS BIGINT)) AS BIGINT)
      |         AS n_late,
      |       MAX(run_max - ts_ms) AS max_late_ms,
      |       CAST(SUM(run_max - ts_ms) AS BIGINT) AS sum_late_ms
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

}
