package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed Dataset[T] surface + custom Aggregator (the UDAF story) + the
  * salting pattern for skewed aggregation keys.
  */
object TypedOps {

  /** Typed view of the lineitem columns this module touches. */
  case class LineRow(l_orderkey: Long, l_quantity: Double,
      l_extendedprice: Double, l_discount: Double, l_returnflag: String)

  /** Custom typed Aggregator: exact integer-cent sum of the discounted
    * price — the engine's cents discipline as a reusable UDAF
    * (`Aggregator[IN, BUF, OUT]`, SURVEY §2l). Commutative/associative long
    * addition ⇒ partial aggregation and any merge order are exact.
    */
  object DiscountedCents extends Aggregator[LineRow, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, r: LineRow): Long =
      b + math.floor(r.l_extendedprice * (1.0 - r.l_discount) * 100 + 0.5).toLong
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(b: Long): Long = b
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Typed pipeline: as[LineRow] → groupByKey → custom Aggregator. Same
    * answer as the untyped cents sum, via the typed API end to end.
    */
  def typedAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_returnflag"))
      .as[LineRow]
      .groupByKey(_.l_returnflag)
      .agg(DiscountedCents.toColumn.name("disc_cents"))
      .toDF("l_returnflag", "disc_cents")
      .orderBy(col("l_returnflag"))
  }

  val typedAggSql: String =
    """SELECT l_returnflag,
      |       CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS disc_cents
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Skew-resistant aggregation by salting: l_returnflag has only 3 values,
    * so a direct groupBy funnels 600k rows into 3 reducers. Stage 1 groups
    * by (key, salt) — fan-out across all partitions — stage 2 merges the 3×S
    * partials. Long sums are associative, so the result is bit-equal to the
    * direct aggregation (same oracle shape). At 100 TB this is the pattern
    * for any low-cardinality or heavy-hitter key; AQE's skew-join handling
    * covers the join-side equivalent.
    */
  val SaltBuckets = 32

  def saltedAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("salt", pmod(hash(col("l_orderkey")), lit(SaltBuckets)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(RefTransforms.cents(col("l_extendedprice"))).as("pc"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("pn")).as("n"), sum(col("pc")).as("base_cents"))
      .orderBy(col("l_returnflag"))

  val saltedAggSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS base_cents
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}
