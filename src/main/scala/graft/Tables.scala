package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for the driver-provided parquet tables (TESTDATA.md).
  *
  * All operators take `(SparkSession, sfDir)` and read lazily through here so
  * Catalyst sees the parquet scan directly — column pruning and filter
  * pushdown reach the file source (check `PushedFilters`/`ReadSchema` in
  * `.explain("formatted")`). At cluster scale these paths would be
  * `s3a://` URIs; nothing else changes.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]); read it as raw long nanos instead. Downstream
    * code goes through [[graft.operators.EventOps.withTsMs]] which converts
    * with exact integer arithmetic.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")

  /** Small-input spread guard for compute-dominated per-row chains
    * (shingling, 64-lane hashing): a local single-row-group parquet file
    * yields ONE scan partition, serializing everything up to the first
    * exchange onto one core. When the scan's parallelism is well under
    * the session's (× 2 hysteresis so an already-parallel input is never
    * reshuffled), redistribute the raw rows first — the extra exchange
    * moves only the small input, not the exploded intermediate. At
    * warehouse scale inputs arrive in many splits and this is an
    * identity; the guard exists exactly for the
    * tiny-file/expensive-chain corner.
    *
    * The caller names a distribution key: HASH repartitioning exchanges
    * rows as they stream, while keyless round-robin first runs a LOCAL
    * SORT of the full rows for retry determinism — measured 3× worse
    * than no spread at all on a 600k-row single-split input, exactly the
    * case this guard targets.
    *
    * The probe is the input's catalog-statistics size (no second full
    * QueryExecution — `df.rdd` would physically plan the query twice just
    * to read its partition count): an input at or under ONE default split
    * (128 MB) is the degenerate case that serializes onto one core, and
    * re-exchanging it costs at most that one split's worth of shuffle; a
    * bigger input arrives in multiple splits and skips the guard.
    */
  val SpreadMaxBytes: Long = 128L << 20

  def spread(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes <= SpreadMaxBytes) df.repartition(target, key) else df
  }
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
