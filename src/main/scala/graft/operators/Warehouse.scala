package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RefTransforms.cents

/** Warehouse-modeling operators: SCD Type 2 dimension build, measure
  * unpivot, and a declarative data-quality audit.
  *
  * The reference pipeline lands transactions into a warehouse table with
  * last-writer-wins upsert semantics (lambda_function.py:226-235); a real
  * deployment of that warehouse also needs the downstream modeling steps —
  * history-preserving dimensions (SCD2), long-form measure reshaping, and
  * constraint monitoring over the landed data. Each is built as a pure
  * declarative plan so Catalyst handles pushdown/pruning, and all money
  * and time arithmetic is integer-exact so the DuckDB oracle hash-matches.
  *
  * Scale notes (100 TB story):
  *  - SCD2: two window passes + one groupBy, ALL partitioned by the
  *    dimension key — a single hash exchange on `o_custkey` is reused by
  *    the change-flag window, the run rollup, and the interval window
  *    (Spark keeps the child partitioning; no second shuffle). No
  *    driver-side state, no iteration.
  *  - unpivot: Expand is a narrow operator (no shuffle) — k output rows
  *    per input row, then a partial-aggregated groupBy on the tiny
  *    measure-name key.
  *  - audit: each check is a full-scan conditional aggregation with
  *    map-side partials, so the whole audit costs one pass per fact
  *    table + one broadcast anti-join for the FK check; the result is a
  *    handful of rows regardless of input size.
  */
object Warehouse {

  /** End-of-time sentinel for the open validity interval (9999-01-01 UTC in
    * epoch millis) — NULL would be hostile to the driver's row-hash compare
    * and to range predicates at query time.
    */
  val EndOfTimeMs: Long = 253370764800000L

  // ---------- SCD Type 2 ----------

  /** Builds a Type-2 slowly-changing dimension of each customer's order
    * priority from the order stream: consecutive orders with the same
    * priority collapse into one version row carrying
    * `[valid_from_ms, valid_to_ms)` and an `is_current` flag.
    *
    * Update order within a customer is pinned by `(eff_ms, o_orderkey)` —
    * the orderkey tiebreak makes same-timestamp updates deterministic on
    * both engines.
    */
  def scd2(s: SparkSession, d: String): DataFrame =
    scd2Unsorted(s, d).orderBy(col("o_custkey"), col("version"))

  /** [[scd2]] without the presentation sort: the trailing global range
    * sort survives under a downstream Union + re-exchange, so any
    * consumer that immediately repartitions must start from the
    * unsorted build.
    */
  private def scd2Unsorted(s: SparkSession, d: String): DataFrame = {
    // o_orderdate arrives as TIMESTAMP_NTZ; the cast interprets the naive
    // wall clock in the session timezone (pinned UTC in Sessions.build),
    // matching DuckDB's epoch_ms on the same naive column
    val upd = Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("eff_ms"),
      col("o_orderpriority").as("priority"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("eff_ms"), col("o_orderkey"))
    val runs = upd
      .withColumn("is_chg",
        when(lag(col("priority"), 1).over(w).isNull ||
          lag(col("priority"), 1).over(w) =!= col("priority"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("is_chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("o_custkey"), col("version"))
      .agg(
        // all rows in a run share one priority; min() is a deterministic pick
        min(col("priority")).as("priority"),
        min(col("eff_ms")).as("valid_from_ms"),
        count(lit(1)).as("n_updates"))
    val wv = Window.partitionBy(col("o_custkey")).orderBy(col("version"))
    runs
      .withColumn("valid_to_ms",
        coalesce(lead(col("valid_from_ms"), 1).over(wv), lit(EndOfTimeMs)))
      .withColumn("is_current",
        (col("valid_to_ms") === EndOfTimeMs).cast("int"))
      .select(col("o_custkey"), col("version"), col("priority"),
        col("valid_from_ms"), col("valid_to_ms"), col("is_current"),
        col("n_updates"))
  }

  val scd2Sql: String =
    s"""WITH upd AS (
       |  SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS eff_ms,
       |         o_orderpriority AS priority,
       |         CASE WHEN lag(o_orderpriority) OVER w IS NULL
       |                OR lag(o_orderpriority) OVER w <> o_orderpriority
       |              THEN 1 ELSE 0 END AS is_chg
       |  FROM orders
       |  WINDOW w AS (PARTITION BY o_custkey
       |               ORDER BY epoch_ms(o_orderdate), o_orderkey)
       |), ver AS (
       |  SELECT o_custkey, priority, eff_ms,
       |         CAST(SUM(is_chg) OVER (PARTITION BY o_custkey
       |           ORDER BY eff_ms, o_orderkey
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
       |  FROM upd
       |), runs AS (
       |  SELECT o_custkey, version, MIN(priority) AS priority,
       |         MIN(eff_ms) AS valid_from_ms, COUNT(*) AS n_updates
       |  FROM ver GROUP BY o_custkey, version
       |)
       |SELECT o_custkey, version, priority, valid_from_ms,
       |       COALESCE(LEAD(valid_from_ms) OVER wv, $EndOfTimeMs)
       |         AS valid_to_ms,
       |       CAST(CASE WHEN LEAD(valid_from_ms) OVER wv IS NULL
       |            THEN 1 ELSE 0 END AS INT) AS is_current,
       |       n_updates
       |FROM runs
       |WINDOW wv AS (PARTITION BY o_custkey ORDER BY version)
       |ORDER BY o_custkey, version""".stripMargin

  // ---------- unpivot ----------

  /** Long-form reshaping of the lineitem money measures via the native
    * `Dataset.unpivot` (Catalyst `Expand` — k rows per input row, no
    * shuffle), then a rollup per measure name. The oracle recomputes the
    * same long form with a UNION ALL, proving the Expand path against a
    * flat-SQL reference.
    */
  def unpivotMeasures(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      cents(col("l_quantity")).as("quantity"),
      cents(col("l_extendedprice")).as("extendedprice"),
      cents(col("l_discount")).as("discount"),
      cents(col("l_tax")).as("tax"))
    li.unpivot(
        ids = Array.empty,
        values = Array(col("quantity"), col("extendedprice"),
          col("discount"), col("tax")),
        variableColumnName = "measure",
        valueColumnName = "v_cents")
      .groupBy(col("measure"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v_cents")).as("sum_cents"),
        min(col("v_cents")).as("min_cents"),
        max(col("v_cents")).as("max_cents"))
      .orderBy(col("measure"))
  }

  val unpivotMeasuresSql: String =
    """WITH m AS (
      |  SELECT 'quantity' AS measure,
      |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS v_cents
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'extendedprice',
      |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'discount', CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'tax', CAST(floor(l_tax * 100 + 0.5) AS BIGINT)
      |  FROM lineitem
      |)
      |SELECT measure, COUNT(*) AS n, CAST(SUM(v_cents) AS BIGINT) AS sum_cents,
      |       MIN(v_cents) AS min_cents, MAX(v_cents) AS max_cents
      |FROM m GROUP BY measure ORDER BY measure""".stripMargin

  // ---------- k-anonymity audit ----------

  /** Privacy threshold for [[kAnonymity]]: a quasi-identifier group
    * smaller than this re-identifies its members.
    */
  val KAnonThreshold = 5L

  /** K-anonymity audit over the customer table — the release gate the
    * reference's PII handling implies but never enforces: before a
    * dataset leaves the warehouse, every combination of quasi-identifiers
    * (here `(c_nationkey, c_mktsegment)` — the columns an adversary can
    * link externally) must describe at least k individuals, or the rows
    * in that cell are re-identifiable. One row per QI cell:
    * `(nation, segment, n, is_risky)` plus the global risk tally
    * (`n_risky_cells`, `n_risky_rows`) carried on every row where the
    * hash gate checks it — the same in-row-audit pattern as the
    * leak-free splitter.
    *
    * Shape: one grouped count (map-side combined, |QI-domain| result
    * rows) + a broadcast 1-row tally; the audit costs one scan at any
    * scale, and the QI domain — not the row count — bounds everything
    * downstream.
    */
  def kAnonymity(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .withColumn("is_risky", (col("n") < KAnonThreshold).cast("int"))
    val tally = cells.agg(
      coalesce(sum(col("is_risky").cast("long")), lit(0L))
        .as("n_risky_cells"),
      coalesce(sum(when(col("is_risky") === 1, col("n")).otherwise(0L)),
        lit(0L)).as("n_risky_rows"))
    cells.crossJoin(broadcast(tally))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  val kAnonymitySql: String =
    s"""WITH cells AS (
       |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
       |         CAST(COUNT(*) < $KAnonThreshold AS INT) AS is_risky
       |  FROM customer GROUP BY c_nationkey, c_mktsegment
       |), tally AS (
       |  SELECT CAST(COALESCE(SUM(is_risky), 0) AS BIGINT)
       |           AS n_risky_cells,
       |         CAST(COALESCE(SUM(CASE WHEN is_risky = 1 THEN n
       |           ELSE 0 END), 0) AS BIGINT) AS n_risky_rows
       |  FROM cells
       |)
       |SELECT c_nationkey, c_mktsegment, n, is_risky,
       |       n_risky_cells, n_risky_rows
       |FROM cells CROSS JOIN tally
       |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // ---------- data-quality audit ----------

  /** Declarative constraint audit over the warehouse tables — the
    * reference validates required fields per record before upserting
    * (lambda_function.py:96-151); this is the set-level generalization a
    * warehouse runs after each load. One row per check:
    * `(check_name, n_rows, n_violations, pass)`.
    *
    * Checks: NOT NULL on the orders business key; key uniqueness;
    * referential integrity orders→customer; domain membership of
    * `o_orderstatus`; value range on `l_discount`; non-negativity of
    * `o_totalprice`. Single-pass conditional aggregations per table plus
    * one broadcast-able anti-join semantics (expressed as a null-check
    * left join so it stays one plan).
    */
  def dqAudit(s: SparkSession, d: String): DataFrame = {
    val o  = Tables.orders(s, d)
    val c  = Tables.customer(s, d).select(col("c_custkey"))
    val li = Tables.lineitem(s, d)

    // orders checks ride ONE full scan (conditional aggregation). The
    // one aggregate row is UNPIVOTED into its four check rows with
    // stack() — the r16-optimization predecessor union'd four SELECTs
    // over the same aggregate frame, and Spark shares no common
    // subtrees across union branches (measured: zero ReusedExchange on
    // the executed plan), so "one scan" actually ran four times.
    val ordersChecks = o.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v_null"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_dup"),
        sum(when(col("o_orderstatus").isin("O", "F", "P"), 0L).otherwise(1L))
          .as("v_enum"),
        sum(when(col("o_totalprice") >= 0, 0L).otherwise(1L)).as("v_neg"))
      .select(expr(
        """stack(4,
          |  'orders_custkey_not_null', n_rows, v_null,
          |  'orders_orderkey_unique', n_rows, v_dup,
          |  'orders_status_domain', n_rows, v_enum,
          |  'orders_totalprice_nonneg', n_rows, v_neg)""".stripMargin)
        .as(Seq("check_name", "n_rows", "n_violations")))

    // FK: orders.o_custkey must exist in customer — broadcast the dim keys
    val fk = o.select(col("o_custkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L))
          .as("n_violations"))
      .select(lit("orders_custkey_fk").as("check_name"), col("n_rows"),
        col("n_violations"))

    val range = li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_discount") >= 0 && col("l_discount") <= 1, 0L)
          .otherwise(1L)).as("n_violations"))
      .select(lit("lineitem_discount_range").as("check_name"),
        col("n_rows"), col("n_violations"))

    ordersChecks.union(fk).union(range)
      .withColumn("pass", (col("n_violations") === 0L).cast("int"))
      .orderBy(col("check_name"))
  }

  // ---------- SCD2 point-in-time lookup ----------

  /** Point-in-time (temporal) join of the lineitem facts against the
    * [[scd2]] customer-priority dimension: each lineitem is attributed to
    * the priority REGIME in force at its ship time, then rolled up into a
    * (regime_priority × order_priority) matrix with exact-cents revenue —
    * the report that shows how much volume shipped under a different
    * priority regime than the one it was ordered with. This is the
    * standard consumer of an SCD2 dimension (`valid_from <= t < valid_to`
    * version resolution) that every warehouse query layer needs.
    *
    * Spark has no native temporal-join operator; the naive range join
    * pairs every fact with the customer's whole version history before
    * keeping one. This uses the same merge-scan formulation as
    * [[EventOps.asofJoin]]: union the raw priority-update rows with fact
    * rows on the customer key, sort each customer's timeline once, and
    * carry the current priority forward with `last(_, ignoreNulls)` —
    * ONE exchange on `o_custkey`, O(rows) work, no fact×history
    * intermediate and no materialized dimension at any scale. An update
    * landing exactly at ship time wins (update rows sort before fact
    * rows at equal t), and of several updates in the same millisecond
    * the highest o_orderkey wins — exactly the higher same-ms version of
    * the dim form, both matching the oracle's half-open-interval join
    * against the materialized [[scd2]]. A lineitem shipping BEFORE the
    * customer's first update (the driver's synthetic lineitem does not
    * order ship after order) has no regime; those facts keep LEFT
    * semantics and are labeled `'NONE'` — identically in the oracle's
    * LEFT interval join — rather than dropped, so the rollup still
    * conserves every fact row.
    */
  def scd2Lookup(s: SparkSession, d: String): DataFrame = {
    // r17 optimization (guide §1.2/§2.4): the regime in force at ship
    // time is, by SCD2 construction, the priority of the LAST update row
    // with eff_ms <= ship_ms (runs collapse consecutive equal priorities,
    // so the last update's priority equals its run's priority; at equal
    // eff_ms the higher o_orderkey wins, exactly the higher same-ms
    // version of the dim form). Merging the RAW update rows with the
    // facts therefore resolves versions in the SAME single timeline pass
    // WITHOUT materializing the dimension first — which removes the
    // whole scd2 build from this query's plan: one Exchange on
    // o_custkey and two Window passes (lag/run-id + lead valid_to) plus
    // a hash aggregate, all over the full orders table, for the price
    // of |orders| vs |versions| rows riding the one merged exchange.
    // The oracle still computes the explicit interval join against the
    // materialized dim, so the equivalence is hash-checked, not argued.
    val upd = Tables.orders(s, d).select(
      col("o_custkey"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("t"),
      col("o_orderkey").as("tie"),
      col("o_orderpriority").as("priority"))
    val fact = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        unix_millis(col("l_shipdate").cast("timestamp")).as("ship_ms"),
        cents(col("l_extendedprice")).as("price_cents"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority").as("order_priority")),
        col("l_orderkey") === col("o_orderkey"))
    val merged = upd
      .select(col("o_custkey"), col("t"), lit(1L).as("is_dim"),
        col("tie"), col("priority"),
        lit(null).cast("string").as("order_priority"),
        lit(null).cast("long").as("price_cents"))
      .unionByName(fact.select(col("o_custkey"), col("ship_ms").as("t"),
        lit(0L).as("is_dim"), lit(null).cast("long").as("tie"),
        lit(null).cast("string").as("priority"),
        col("order_priority"), col("price_cents")))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("t"), col("is_dim").desc, col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("regime_priority",
        coalesce(last(col("priority"), ignoreNulls = true).over(w),
          lit("NONE")))
      .filter(col("is_dim") === 0L)
      .groupBy(col("regime_priority"), col("order_priority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("price_cents")).as("price_cents"))
      .orderBy(col("regime_priority"), col("order_priority"))
  }

  val scd2LookupSql: String =
    s"""WITH scd AS ($scd2Sql
       |), fact AS (
       |  SELECT o.o_custkey, epoch_ms(l.l_shipdate) AS ship_ms,
       |         o.o_orderpriority AS order_priority,
       |         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
       |           AS price_cents
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |)
       |SELECT COALESCE(scd.priority, 'NONE') AS regime_priority,
       |       f.order_priority,
       |       COUNT(*) AS n_items,
       |       CAST(SUM(f.price_cents) AS BIGINT) AS price_cents
       |FROM fact f LEFT JOIN scd
       |  ON f.o_custkey = scd.o_custkey
       | AND scd.valid_from_ms <= f.ship_ms AND f.ship_ms < scd.valid_to_ms
       |GROUP BY regime_priority, f.order_priority
       |ORDER BY regime_priority, f.order_priority""".stripMargin

  val dqAuditSql: String =
    """WITH o AS (
      |  SELECT COUNT(*) AS n_rows,
      |         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
      |           AS BIGINT) AS v_null,
      |         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
      |           AS v_dup,
      |         CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
      |           THEN 0 ELSE 1 END) AS BIGINT) AS v_enum,
      |         CAST(SUM(CASE WHEN o_totalprice >= 0 THEN 0 ELSE 1 END)
      |           AS BIGINT) AS v_neg
      |  FROM orders
      |), fk AS (
      |  SELECT COUNT(*) AS n_rows,
      |         CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
      |           AS BIGINT) AS n_violations
      |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |), rng AS (
      |  SELECT COUNT(*) AS n_rows,
      |         CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 1
      |           THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
      |  FROM lineitem
      |), checks AS (
      |  SELECT 'orders_custkey_not_null' AS check_name, n_rows,
      |         v_null AS n_violations FROM o
      |  UNION ALL
      |  SELECT 'orders_orderkey_unique', n_rows, v_dup FROM o
      |  UNION ALL
      |  SELECT 'orders_status_domain', n_rows, v_enum FROM o
      |  UNION ALL
      |  SELECT 'orders_totalprice_nonneg', n_rows, v_neg FROM o
      |  UNION ALL
      |  SELECT 'orders_custkey_fk', n_rows, n_violations FROM fk
      |  UNION ALL
      |  SELECT 'lineitem_discount_range', n_rows, n_violations FROM rng
      |)
      |SELECT check_name, n_rows, n_violations,
      |       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT)
      |         AS pass
      |FROM checks ORDER BY check_name""".stripMargin

  /** Column-profile report over lineitem — the `ANALYZE TABLE`-style
    * statistics pass a warehouse runs before planning and quality work:
    * one row per profiled column with row/null/distinct counts and the
    * min/max rendered as strings (one long-form schema across types).
    *
    * Plan shape (this replaced a 5-way `countDistinct` in one aggregate,
    * which compiles to a 6-projection Expand — every input row
    * replicated 6× — feeding a row-scaled `(gid, value)` exchange and a
    * SinglePartition merge; on near-PK columns that exchange carries a
    * table-sized domain and was the engine's slowest query): each column
    * is profiled by its OWN two-stage exact aggregate — a column-pruned
    * scan (parquet reads exactly one column per arm, so the k arms
    * together read no more bytes than one full scan), a partial
    * hash-aggregate on the value (map-side combine collapses duplicates
    * before the shuffle), one hash exchange of `(value, cnt, nn)`
    * partials, then a global agg whose own partials reduce to one row
    * per partition — the final single-partition exchange carries ~32
    * partial rows, not the data. No Expand, no row-scaled
    * SinglePartition spine; every arm is independently
    * shuffle-partitionable, so the report scales with the widest
    * column's distinct count, not rows × (k+1). Exact distincts keep
    * the oracle exact; a petabyte profile swaps the second stage for
    * HLL partials the same way q_mv_sketch does.
    */
  def columnProfile(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag",
      "l_shipdate")
    val li = Tables.lineitem(s, d)
    val arms = cols.map { c =>
      li.select(col(c).as("v"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("cnt"), count(col("v")).as("nn"))
        .agg(
          coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
          coalesce(sum(col("cnt")) - sum(col("nn")), lit(0L)).as("n_null"),
          count(col("v")).as("n_distinct"),
          min(col("v")).cast("string").as("min_val"),
          max(col("v")).cast("string").as("max_val"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }
    arms.reduce(_.unionAll(_)).orderBy(col("col_name"))
  }

  /** Gate for [[columnProfileSketch]]: the HLL estimate must land within
    * this percentage of the exact distinct count. approx_count_distinct's
    * default relative standard deviation is 5%, so 15% is a ~3σ bound —
    * a violation means the sketch machinery broke, not bad luck.
    */
  val ProfileSketchGatePct = 15L

  /** The SCALE form of the column profile: ONE scan computes every
    * column's HLL distinct sketch side by side (k
    * `approx_count_distinct` aggregates — HyperLogLog++ partials merge
    * map-side and the exchange carries k sketches, NOT rows; this is the
    * true one-pass plan the exact multi-`countDistinct` form can never
    * have, because exact multi-distinct compiles to an Expand). The
    * exact twin rides beside it — the same per-column two-stage arms as
    * [[columnProfile]] — and the published row carries the exact count
    * plus an in-row `within_gate` flag, so the oracle (exact + literal
    * TRUE, the q_mv_sketch contract) hash-fails the moment any estimate
    * leaves its ±[[ProfileSketchGatePct]]% envelope. At petabyte scale
    * the exact arms are dropped and the sketch column IS the profile;
    * here they are what makes the approximation auditable. HLL merge is
    * commutative and hash-based, so the estimate is identical at any
    * partitioning — WarehouseSpec re-checks the gate and pins the
    * sketch arm's plan Expand-free with a single scan.
    */
  def columnProfileSketch(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag",
      "l_shipdate")
    val li = Tables.lineitem(s, d)
    val approxAggs =
      cols.map(c => approx_count_distinct(col(c)).as(s"${c}__ad"))
    val one = li.agg(approxAggs.head, approxAggs.tail: _*)
    val est = one.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(s"${c}__ad").as("est"))): _*))
        .as("p"))
      .select(col("p.col_name"), col("p.est"))
    val exact = cols.map { c =>
      li.select(col(c).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
        .agg(count(col("v")).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_distinct"))
    }.reduce(_.unionAll(_))
    est.join(exact, Seq("col_name"))
      .select(col("col_name"), col("n_distinct"),
        (abs(col("est") - col("n_distinct")) * lit(100L) <=
          col("n_distinct") * lit(ProfileSketchGatePct)).as("within_gate"))
      .orderBy(col("col_name"))
  }

  val columnProfileSketchSql: String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag",
      "l_shipdate")
    val arms = cols.map { c =>
      s"""SELECT '$c' AS col_name,
         |       CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |       TRUE AS within_gate
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$arms
       |) ORDER BY col_name""".stripMargin
  }

  val columnProfileSql: String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag",
      "l_shipdate")
    val arms = cols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |       COUNT(*) - COUNT($c) AS n_null,
         |       CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |       CAST(MIN($c) AS VARCHAR) AS min_val,
         |       CAST(MAX($c) AS VARCHAR) AS max_val
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$arms
       |) ORDER BY col_name""".stripMargin
  }

}
