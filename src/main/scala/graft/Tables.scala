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
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
