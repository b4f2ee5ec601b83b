package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's pandas transform chain re-expressed as composable Catalyst
  * column expressions (reference: lambda_function.py:96-151).
  *
  * Every step is a built-in `org.apache.spark.sql.functions` expression, so
  * the whole chain stays inside one WholeStageCodegen span — a single narrow
  * stage with no shuffle, which is exactly how a 100 TB scan of this pipeline
  * should execute (partition-parallel map, no data movement).
  *
  * Operator tags refer to SURVEY.md §2d:
  *  - P1–P3 coercing casts (lambda_function.py:112-119, `errors='coerce'`)
  *  - P4 processing metadata (lambda_function.py:121-123)
  *  - P5 amount bucketing (lambda_function.py:154-167)
  *  - P6 absolute value (lambda_function.py:130-131)
  *  - P7–P9 date parts (lambda_function.py:134-137)
  *  - P10 text normalization (lambda_function.py:139-143)
  *  - P11 id synthesis (` s3_uploader.py`:84)
  *  - F1 critical-key null filter (lambda_function.py:107-109)
  */
object RefTransforms {

  /** P5 — bucket an amount by abs() against 25/100/500, null → 'unknown'
    * (lambda_function.py:154-167; strict `<` at the boundaries).
    * Pure when/otherwise chain: Catalyst-optimizable and codegen'd.
    */
  def categorizeAmount(amount: Column): Column =
    when(amount.isNull, lit("unknown"))
      .when(abs(amount) < 25, lit("small"))
      .when(abs(amount) < 100, lit("medium"))
      .when(abs(amount) < 500, lit("large"))
      .otherwise(lit("very_large"))

  /** P5 as a Scala UDF — covers the reference's `Series.apply` UDF surface
    * (lambda_function.py:128). The when/otherwise variant above is the
    * production path (codegen, pushdown-friendly); this one exists to prove
    * UDF parity and is exercised by its own query + the same oracle.
    */
  val categorizeAmountUdf =
    udf { (a: java.lang.Double) =>
      if (a == null) "unknown"
      else {
        val x = math.abs(a.doubleValue)
        if (x < 25) "small"
        else if (x < 100) "medium"
        else if (x < 500) "large"
        else "very_large"
      }
    }

  /** P10 — stringify, trim, title-case (lambda_function.py:139-143).
    * `initcap` splits on whitespace while pandas `str.title()` splits on any
    * non-letter; testdata values are single-token so behavior coincides
    * (documented delta, SURVEY.md §7).
    */
  def cleanText(c: Column): Column = initcap(trim(c.cast("string")))

  /** P1 — numeric cast with coercion-to-null (pd.to_numeric errors='coerce'). */
  def toNumericCoerce(c: Column): Column = c.try_cast("double")

  /** P2/P3 — date/timestamp parse with coercion-to-null. */
  def toDateCoerce(c: Column): Column      = c.try_cast("date")
  def toTimestampCoerce(c: Column): Column = c.try_cast("timestamp")

  /** P11 — deterministic id `TXN_{yyyyMMdd}_{i:04d}` (` s3_uploader.py`:84). */
  def synthesizeId(date: Column, idx: Column): Column =
    format_string("TXN_%s_%04d", date_format(date, "yyyyMMdd"), idx)

  /** The full 9-column-transaction chain, faithful to
    * lambda_function.py:96-151: F1 drop → P1-P3 coercions → P5 bucket →
    * P6 abs → P7-P9 date parts → P10 text clean → P4 metadata.
    * Input: the generator's 9-column schema (FIXTURES.md §A1), all strings
    * acceptable. Output: the 17-column shape minus the nondeterministic
    * `processed_timestamp` (excluded from oracle comparison per SURVEY §5).
    */
  def transformTransactions(df: DataFrame, sourceFile: String): DataFrame = {
    df
      .na.drop(Seq("transaction_id", "amount")) // F1
      .withColumn("amount", toNumericCoerce(col("amount"))) // P1
      .withColumn("date", toDateCoerce(col("date"))) // P2
      .withColumn("timestamp", toTimestampCoerce(col("timestamp"))) // P3
      .withColumn("amount_category", categorizeAmount(col("amount"))) // P5
      .withColumn("amount_abs", abs(col("amount"))) // P6
      .withColumn("day_of_week", date_format(col("date"), "EEEE")) // P7
      .withColumn("month", month(col("date")).cast("long")) // P8
      .withColumn("year", year(col("date")).cast("long")) // P9
      .withColumn("description", cleanText(col("description"))) // P10
      .withColumn("category", cleanText(col("category"))) // P10
      .withColumn("location", cleanText(col("location"))) // P10
      .withColumn("processed_by", lit("lambda-etl-pipeline")) // P4
      .withColumn("source_file", lit(sourceFile)) // P14
  }

  /** P14, multi-file form: per-row lineage from the file each row was
    * actually scanned from (`input_file_name()`), reduced to the basename so
    * the value is stable across mount points. This is what a partitioned
    * ingest needs — one batch can drain many landed files; the
    * `lit(path)` variant above stays in the oracle-gated queries because a
    * literal is deterministic under the hash compare.
    */
  def transformTransactionsWithLineage(df: DataFrame): DataFrame =
    transformTransactions(df, "")
      .withColumn("source_file",
        regexp_extract(input_file_name(), "[^/]+$", 0))

  /** Signed "transaction amount" derived from lineitem for the transplanted
    * chain: discounted price scaled into the reference's bucket range
    * (±25/100/500), negated for returned lines so abs()/bucketing see both
    * signs. Pure double arithmetic — bit-identical between Spark and the
    * DuckDB oracle.
    */
  def lineitemAmount: Column =
    when(col("l_returnflag") === "R", lit(-1.0)).otherwise(lit(1.0)) *
      col("l_extendedprice") * (lit(1.0) - col("l_discount")) / lit(100.0)

  /** Exact integer cents of a double amount: floor(x*100 + 0.5) — identical
    * IEEE ops in Spark and DuckDB, so SUMs over it are exact and
    * order-independent (the FP-determinism strategy for every revenue
    * aggregate in this engine).
    */
  def cents(c: Column): Column = floor(c * 100d + 0.5d).cast("long")
}
