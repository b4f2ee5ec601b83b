package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic transaction generator — the Spark re-expression of
  * the reference's data generator (` s3_uploader.py`:27-95): 70/30
  * expense/income split (line 68), income 500..5000 / expense -10..-500
  * (lines 72,75), category+description pairs (lines 42-62), intra-day time
  * jitter 06:00-22:59 (lines 78-81), ids `TXN_YYYYMMDD_%04d` (line 84).
  *
  * Instead of `random.choice`/`random.uniform` we derive every field from a
  * linear-congruential mix of the row id — `spark.range` + pure column
  * arithmetic. That keeps the generator:
  *   - distributed (no driver-side loop; `range` partitions across executors),
  *   - reproducible (same output at any parallelism/scale), and
  *   - oracle-comparable (the same integer arithmetic is expressible in
  *     ANSI SQL, so DuckDB produces bit-identical rows).
  */
object TxnGenerator {

  private val M = 2147483648L // 2^31, LCG modulus

  /** LCG-style mix: (id * mult + inc) mod 2^31, then a second scramble.
    * All intermediates fit comfortably in signed 64-bit in both engines.
    */
  private def mix(id: Column, salt: Long): Column =
    ((id + lit(salt)) * lit(1103515245L) + lit(12345L)) % lit(M)

  val incomeCategories  = Seq("salary", "freelance", "investment", "bonus")
  val expenseCategories =
    Seq("food", "transport", "utilities", "entertainment", "shopping", "healthcare")
  val accounts  = Seq("checking", "savings", "credit_card")
  val locations = Seq("Online", "New York", "Los Angeles", "Chicago", "Houston")

  private def pick(options: Seq[String], idx: Column): Column = {
    val arr = array(options.map(lit): _*)
    element_at(arr, (idx % options.size).cast("int") + 1)
  }

  /** Generate `n` deterministic transactions in the reference's 9-column
    * layout (FIXTURES.md §A1). Dates spread over July 2024 like the
    * reference's daily partitions.
    */
  def generate(spark: SparkSession, n: Long): DataFrame = {
    val df  = spark.range(n)
    val id  = col("id")
    val h1  = mix(id, 1)
    val h2  = mix(id, 2)
    val h3  = mix(id, 3)
    val h4  = mix(id, 4)
    val h5  = mix(id, 5)
    val h6  = mix(id, 6)
    val isIncome = (h1 % 100) < 30 // 30% income, ` s3_uploader.py`:68

    // income 500.00..4999.99, expense -10.00..-499.99 — exact cents
    val amountCents =
      when(isIncome, lit(50000L) + (h2 % 450000L))
        .otherwise(-(lit(1000L) + (h3 % 49000L)))
    val day     = (id % 30) + 1 // July 1..30, like upload_historical_data
    val date    = make_date(lit(2024), lit(7), day.cast("int"))
    val hour    = (lit(6L) + h4 % 17L).cast("int") // 06..22
    val minute  = (h5 % 60L).cast("int")
    val second  = (h6 % 60L).cast("int")
    val ts = make_timestamp(
      lit(2024), lit(7), day.cast("int"), hour, minute, second.cast("decimal(8,6)"))
    val catIdx  = h2 % 97L
    val category =
      when(isIncome, pick(incomeCategories, catIdx))
        .otherwise(pick(expenseCategories, catIdx))

    df.select(
      format_string("TXN_%s_%04d", date_format(date, "yyyyMMdd"), id % 10000L)
        .as("transaction_id"),
      date_format(date, "yyyy-MM-dd").as("date"),
      date_format(ts, "yyyy-MM-dd HH:mm:ss").as("timestamp"),
      (amountCents.cast("double") / 100.0).as("amount"),
      category.as("category"),
      concat(lit("Auto "), category).as("description"),
      when(isIncome, lit("income")).otherwise(lit("expense"))
        .as("transaction_type"),
      pick(accounts, h4).as("account"),
      pick(locations, h5).as("location")
    )
  }

  /** The equivalent DuckDB SQL for `generate(n)` — same LCG arithmetic, so
    * rows match bit-for-bit. Kept adjacent to the Scala so the two stay in
    * lockstep.
    */
  def oracleSql(n: Long): String = {
    def mixSql(salt: Long) =
      s"((id + $salt) * 1103515245 + 12345) % $M"
    val h1 = mixSql(1); val h2 = mixSql(2); val h3 = mixSql(3)
    val h4 = mixSql(4); val h5 = mixSql(5); val h6 = mixSql(6)
    def pickSql(options: Seq[String], idx: String) = {
      val arr = options.map(o => s"'$o'").mkString("[", ", ", "]")
      s"$arr[CAST(($idx) % ${options.size} AS INT) + 1]"
    }
    s"""
WITH g AS (
  SELECT range AS id,
         ($h1) % 100 < 30 AS is_income,
         $h2 AS h2, $h3 AS h3, $h4 AS h4, $h5 AS h5, $h6 AS h6,
         (id % 30) + 1 AS day
  FROM range(0, $n)
), g2 AS (
  SELECT *,
         CASE WHEN is_income THEN 50000 + (h2 % 450000)
              ELSE -(1000 + (h3 % 49000)) END AS amount_cents,
         make_date(2024, 7, CAST(day AS INT)) AS d,
         make_timestamp(2024, 7, CAST(day AS INT),
                        CAST(6 + h4 % 17 AS INT),
                        CAST(h5 % 60 AS INT),
                        CAST(h6 % 60 AS DOUBLE)) AS ts,
         CASE WHEN is_income
              THEN ${pickSql(incomeCategories, "h2 % 97")}
              ELSE ${pickSql(expenseCategories, "h2 % 97")} END AS category
  FROM g
)
SELECT 'TXN_' || strftime(d, '%Y%m%d') || '_' ||
         lpad(CAST(id % 10000 AS VARCHAR), 4, '0') AS transaction_id,
       strftime(d, '%Y-%m-%d') AS "date",
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS "timestamp",
       CAST(amount_cents AS DOUBLE) / 100.0 AS amount,
       category,
       'Auto ' || category AS description,
       CASE WHEN is_income THEN 'income' ELSE 'expense' END
         AS transaction_type,
       ${pickSql(accounts, "h4")} AS account,
       ${pickSql(locations, "h5")} AS location
FROM g2
ORDER BY transaction_id
"""
  }
}
