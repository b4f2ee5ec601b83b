package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.TxnGenerator

/** End-to-end reference-pipeline queries: the generator's 9-column
  * transaction schema through the full transform chain (E1+E2 composed,
  * SURVEY.md §3), and the Hive-partitioned sink/scan pair (S3/K2).
  */
object PipelineQueries {

  val N = 1000L

  /** E2→E1 composed: generate the reference's raw transactions, run the
    * complete 17-column transform chain, return the deterministic columns.
    * This is the closest thing to "the reference, end to end, as one lazy
    * Spark plan" — generation and transformation fuse into a single narrow
    * codegen stage with no input I/O at all.
    */
  def etlTransactions(s: SparkSession, d: String): DataFrame =
    RefTransforms.transformTransactions(TxnGenerator.generate(s, N), "generated")
      .select(
        col("transaction_id"), col("date"), col("timestamp"), col("amount"),
        col("category"), col("description"), col("transaction_type"),
        col("account"), col("location"), col("amount_category"),
        col("amount_abs"), col("day_of_week"), col("month"), col("year"),
        col("processed_by"), col("source_file"))
      .orderBy(col("transaction_id"))

  /** DuckDB-side multi-word title-case (pandas str.title / Spark initcap):
    * upper first letter, lower the rest, per whitespace token.
    */
  private def titleSql(x: String): String =
    s"array_to_string(list_transform(string_split(trim($x), ' '), " +
      s"w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))), ' ')"

  val etlTransactionsSql: String = {
    val bucket =
      """CASE WHEN amount IS NULL THEN 'unknown'
        |            WHEN abs(amount) < 25 THEN 'small'
        |            WHEN abs(amount) < 100 THEN 'medium'
        |            WHEN abs(amount) < 500 THEN 'large'
        |            ELSE 'very_large' END""".stripMargin
    s"""WITH gen AS (${TxnGenerator.oracleSql(N)})
       |SELECT transaction_id,
       |       TRY_CAST("date" AS DATE) AS "date",
       |       TRY_CAST("timestamp" AS TIMESTAMP) AS "timestamp",
       |       amount,
       |       ${titleSql("category")} AS category,
       |       ${titleSql("description")} AS description,
       |       transaction_type, account,
       |       ${titleSql("location")} AS location,
       |       $bucket AS amount_category,
       |       abs(amount) AS amount_abs,
       |       dayname(TRY_CAST("date" AS DATE)) AS day_of_week,
       |       CAST(month(TRY_CAST("date" AS DATE)) AS BIGINT) AS month,
       |       CAST(year(TRY_CAST("date" AS DATE)) AS BIGINT) AS year,
       |       'lambda-etl-pipeline' AS processed_by,
       |       'generated' AS source_file
       |FROM gen
       |ORDER BY transaction_id""".stripMargin
  }

  /** S3/K2 — Hive-partitioned parquet sink + partition-PRUNED scan: write
    * orders under year=YYYY/month=MM (the reference's S3 key layout,
    * ` s3_uploader.py`:113-118), read back with a partition predicate.
    * `.explain` on the re-read shows PartitionFilters + a pruned
    * InMemoryFileIndex — only matching directories are listed/scanned,
    * which is the property that matters at 100 TB. The oracle computes the
    * same answer straight off the unpartitioned source.
    */
  def partitionPrune(s: SparkSession, d: String): DataFrame = {
    val dir = partitionedOrdersDir(s, d)
    s.read.parquet(dir)
      .filter(col("year") === 1995 && col("month") <= 6)
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n"),
        sum(RefTransforms.cents(col("o_totalprice"))).as("total_cents"))
      .select(col("month").cast("long").as("month"), col("n"),
        col("total_cents"))
      .orderBy(col("month"))
  }

  /** Lays down (once per JVM) and returns the Hive-partitioned orders
    * copy under year=YYYY/month=MM — the reference's S3 key layout
    * (` s3_uploader.py`:113-118), shared by [[partitionPrune]] (static
    * pruning) and [[dppStar]] (dynamic pruning through a dim join).
    */
  private[graft] def partitionedOrdersDir(s: SparkSession, d: String): String = {
    val dir = graft.sources.SetupOnce.runtimeDir(d, "orders_part")
    // write-once layout (production shape: one ingest, many scans) — the
    // pruned READS are what these operators demonstrate and measure
    graft.sources.SetupOnce(dir) {
      Tables.orders(s, d)
        .withColumn("year", year(col("o_orderdate")))
        .withColumn("month", month(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("year", "month").parquet(dir)
    }
    dir
  }

  /** Write-once calendar dimension keyed on the fact's PARTITION columns
    * (year, month) with a derived non-partition attribute `half_label`
    * ('YYYY-H1'/'YYYY-H2') — the dim whose attribute filter can only
    * reach the fact's partitions THROUGH the join, i.e. the shape that
    * exists to exercise dynamic partition pruning. Purely derived
    * (1992-1998 × 12, no scan), so the oracle replays it as arithmetic.
    */
  private[graft] def dateDimDir(s: SparkSession, d: String): String = {
    val dir = graft.sources.SetupOnce.runtimeDir(d, "date_dim")
    graft.sources.SetupOnce(dir) {
      s.range(0, 7L * 12)
        .select((lit(1992) + (col("id") / 12).cast("int")).as("year"),
          ((col("id") % 12).cast("int") + 1).as("month"))
        .withColumn("half_label",
          concat(col("year").cast("string"),
            when(col("month") <= 6, lit("-H1")).otherwise(lit("-H2"))))
        .coalesce(1)
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** Dynamic partition pruning through a star join — THE scan
    * optimization a 100 TB partitioned fact table lives on: the filter
    * sits on a dim ATTRIBUTE (`half_label`, not a partition column), so
    * no static partition predicate exists at plan time; Catalyst's
    * PartitionPruning rule injects a runtime `dynamicpruning` subquery
    * on the fact's (year, month) partition columns, REUSING the dim's
    * broadcast exchange, and the FileSourceScan lists only the ~6 of ~84
    * matching partition directories instead of scanning 100 TB and
    * filtering post-join. RelationalSpec pins both halves: the
    * `dynamicpruning` expression in the scan's PartitionFilters, and a
    * post-execution numFiles audit proving partitions were actually
    * skipped (the q_bloom_skip audit discipline). The oracle computes
    * the same answer straight off the unpartitioned source.
    */
  def dppStar(s: SparkSession, d: String): DataFrame = {
    val fact = s.read.parquet(partitionedOrdersDir(s, d))
    val dim = s.read.parquet(dateDimDir(s, d))
      .filter(col("half_label") === "1995-H2")
    fact.join(broadcast(dim), Seq("year", "month"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n"),
        sum(RefTransforms.cents(col("o_totalprice"))).as("total_cents"))
      .select(col("month").cast("long").as("month"), col("n"),
        col("total_cents"))
      .orderBy(col("month"))
  }

  val dppStarSql: String =
    """SELECT CAST(month(o_orderdate) AS BIGINT) AS month, COUNT(*) AS n,
      |       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders
      |WHERE year(o_orderdate) = 1995 AND month(o_orderdate) > 6
      |GROUP BY 1 ORDER BY month""".stripMargin

  val partitionPruneSql: String =
    """SELECT CAST(month(o_orderdate) AS BIGINT) AS month, COUNT(*) AS n,
      |       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders
      |WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 6
      |GROUP BY 1 ORDER BY month""".stripMargin

  /** Range-clustered layout + zone-map skipping — the lakehouse `CLUSTER
    * BY` story, one level finer than [[partitionPrune]]'s directory
    * pruning. The write-once layout range-partitions lineitem on
    * `l_shipdate` ([[ClusterFiles]] disjoint date ranges, ordered within
    * each file), so every parquet row group's footer min/max covers a
    * narrow date slice; the point-range read below then skips all but the
    * file(s) covering the predicate AT THE ROW-GROUP LEVEL via the pushed
    * filter — no directory scheme needed, and (unlike Hive partitioning)
    * no small-files explosion for a high-cardinality key. At 100 TB this
    * is how a date-scoped scan touches ~1/[[ClusterFiles]] of the bytes
    * with zero extra metadata service: the stats ride in the files.
    * `.explain` shows the predicate in PushedFilters; the layout
    * properties (disjoint per-file ranges) are pinned in the spec.
    */
  val ClusterFiles = 8

  def clusterLayout(s: SparkSession, d: String): DataFrame = {
    val dir = clusterLayoutDir(s, d)
    s.read.parquet(dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("date") &&
        col("l_shipdate") < lit("1995-04-01").cast("date"))
      .groupBy(month(col("l_shipdate")).cast("long").as("month"))
      .agg(count(lit(1)).as("n"),
        sum(RefTransforms.cents(col("l_extendedprice"))).as("price_cents"))
      .orderBy(col("month"))
  }

  /** Lays down (once per JVM) and returns the clustered copy's directory —
    * shared with the spec, which asserts the per-file ranges are disjoint.
    */
  private[graft] def clusterLayoutDir(s: SparkSession, d: String): String = {
    val dir = graft.sources.SetupOnce.runtimeDir(d, "lineitem_clustered")
    graft.sources.SetupOnce(dir) {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate").cast("date").as("l_shipdate"),
          col("l_quantity"), col("l_extendedprice"))
        .repartitionByRange(ClusterFiles, col("l_shipdate"))
        .sortWithinPartitions(col("l_shipdate"))
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  val clusterLayoutSql: String =
    """SELECT CAST(month(l_shipdate) AS BIGINT) AS month, COUNT(*) AS n,
      |       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1995-04-01'
      |GROUP BY 1 ORDER BY month""".stripMargin
}
