package graft

import java.nio.file.{Files, Paths}
import java.util.Properties

import graft.operators.EtlPipeline

/** End-to-end: the composed lambda_handler equivalent — CSV in, JSON-array
  * document + metadata out, rows upserted into the JDBC warehouse.
  */
class EtlPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("processFile: csv -> transform -> json array -> jdbc upsert") {
    val dir = Files.createTempDirectory("graft_pipeline").toString
    val csv = s"$dir/raw-data/batch1.csv"
    Files.createDirectories(Paths.get(s"$dir/raw-data"))
    val header = "transaction_id,date,timestamp,amount,category,description," +
      "transaction_type,account,location"
    Files.writeString(Paths.get(csv),
      s"""$header
         |TXN_A,2024-07-01,2024-07-01 10:00:00,12.5,food,lunch,expense,checking,Online
         |TXN_B,2024-07-02,2024-07-02 11:00:00,250.0,travel,flight,expense,credit,Airport
         |TXN_C,bad-date,2024-07-03 09:00:00,-40.0,fees,charge,expense,checking,Branch
         |""".stripMargin)
    val out   = s"$dir/processed-data/batch1.json"
    val url   = "jdbc:derby:memory:graftpipe;create=true"
    val props = new Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    val (n, _) = EtlPipeline.processFile(spark, csv, out,
      "2024-07-01T12:00:00", Some((url, "pipe_txns", props)))
    assert(n === 3L)

    // JSON side: one array document, transform applied, lineage = basename
    val back = spark.read.option("multiLine", "true").json(out)
    assert(back.count() === 3)
    val rows = back.select("transaction_id", "amount_category", "date",
        "source_file")
      .as[(String, String, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("TXN_A")._2 === "small")
    assert(rows("TXN_B")._2 === "large")
    assert(rows("TXN_C")._3 === null) // coerced bad date -> null, row kept
    assert(rows.values.forall(_._4 == "batch1.csv"))
    val meta = Files.readString(Paths.get(out + ".meta.json"))
    assert(meta.contains("\"record_count\": \"3\""))
    // the caller-supplied processed_timestamp is a real column in the
    // JSON document, like the reference's per-row stamp
    assert(back.select("processed_timestamp").as[String].collect()
      .forall(_ startsWith "2024-07-01T12:00:00"))

    // JDBC side: rows landed with the stamp; re-running the same file is
    // idempotent in rows, and conflict-updates the stamp (reference's
    // ON CONFLICT SET processed_timestamp)
    val warehouse = spark.read.jdbc(url, "pipe_txns", props)
    assert(warehouse.count() === 3)
    assert(warehouse.select("processed_timestamp").as[String].collect()
      .forall(_ startsWith "2024-07-01 12:00:00"))
    EtlPipeline.processFile(spark, csv, out, "2024-07-01T13:00:00",
      Some((url, "pipe_txns", props)))
    val after = spark.read.jdbc(url, "pipe_txns", props)
    assert(after.count() === 3)
    assert(after.select("processed_timestamp").as[String].collect()
      .forall(_ startsWith "2024-07-01 13:00:00"))
  }

  test("handle: the reference handler envelope — 200 success, 200 skip, " +
      "structured 500 on failure (never a raw throw)") {
    val dir = Files.createTempDirectory("graft_handle").toString
    Files.createDirectories(Paths.get(s"$dir/raw-data"))
    Files.createDirectories(Paths.get(s"$dir/other"))
    val header = "transaction_id,date,timestamp,amount,category,description," +
      "transaction_type,account,location"
    val csv = s"$dir/raw-data/batch2.csv"
    Files.writeString(Paths.get(csv),
      s"""$header
         |TXN_H1,2024-07-05,2024-07-05 08:00:00,5.0,food,coffee,expense,checking,Cafe
         |TXN_H2,2024-07-05,2024-07-05 09:00:00,80.0,bills,power,expense,checking,Online
         |""".stripMargin)

    // success arm: 200 + message + record count + source file
    val ok = EtlPipeline.handle(spark, csv, s"$dir/out/batch2.json",
      "2024-07-05T12:00:00", watchedFolder = Some(EtlPipeline.WatchedFolder))
    assert(ok.statusCode === 200)
    assert(ok.message === "ETL pipeline completed successfully")
    assert(ok.recordsProcessed === Some(2L))
    assert(ok.sourceFile === csv)
    assert(ok.error.isEmpty)

    // skip arm: a file outside the watched folder is acknowledged, not
    // processed (lambda_function.py:29-34) — it need not even exist
    val skip = EtlPipeline.handle(spark, s"$dir/other/batch3.csv",
      s"$dir/out/batch3.json", "2024-07-05T12:00:00",
      watchedFolder = Some(EtlPipeline.WatchedFolder))
    assert(skip.statusCode === 200)
    assert(skip.message.contains("skipped"))
    assert(skip.recordsProcessed.isEmpty)
    assert(!Files.exists(Paths.get(s"$dir/out/batch3.json")))

    // failure arm: an unreadable input yields the structured 500 carrying
    // the error message AND the source file (lambda_function.py:63-71) —
    // the caller never sees a raw exception. (A merely-malformed CSV is
    // NOT an error: per-cell coercion tolerance keeps the row — the test
    // above pins that — so the canonical infrastructure failure here is a
    // missing file.)
    val missing = s"$dir/raw-data/no_such.csv"
    val bad = EtlPipeline.handle(spark, missing, s"$dir/out/no_such.json",
      "2024-07-05T12:00:00", watchedFolder = Some(EtlPipeline.WatchedFolder))
    assert(bad.statusCode === 500)
    assert(bad.message === "ETL pipeline failed")
    assert(bad.error.isDefined && bad.error.get.contains("no_such"))
    assert(bad.sourceFile === missing)
    assert(bad.recordsProcessed.isEmpty)
  }

  test("dirty CSV ingest modes: PERMISSIVE keeps + tags, DROPMALFORMED " +
      "drops, FAILFAST aborts") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_dirty").toString
    // row 2 has a non-numeric amount, row 3 too few columns
    Files.write(Paths.get(s"$dir/batch.csv"),
      ("id,amount\n" + "1,10.5\n" + "2,notanumber\n" + "3\n").getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType),
      StructField("_corrupt_record", StringType)))

    val permissive = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    // all rows survive; the broken cells are null and the raw line is
    // preserved in the corrupt-record column for a quarantine side-channel
    assert(permissive.count() === 3L)
    val byId = permissive.collect()
      .map(r => Option(r.getAs[String]("_corrupt_record")) -> r).toMap
    assert(byId.keys.flatten.toSet === Set("2,notanumber", "3"))
    permissive.unpersist()

    val dropped = spark.read
      .schema(StructType(schema.fields.take(2)))
      .option("header", "true").option("mode", "DROPMALFORMED").csv(dir)
    assert(dropped.collect().map(_.getLong(0)).toSeq === Seq(1L))

    val failFast = spark.read
      .schema(StructType(schema.fields.take(2)))
      .option("header", "true").option("mode", "FAILFAST").csv(dir)
    val err = intercept[org.apache.spark.SparkException] { failFast.collect() }
    assert(err.getMessage.contains("FAILFAST") ||
      Option(err.getCause).exists(_.getMessage.contains("Malformed")))
  }

  test("observed data-quality metrics match direct aggregation, including " +
      "the coerced-null-amount count") {
    val dir = Files.createTempDirectory("graft_obs").toString
    val csv = s"$dir/raw-data/batch.csv"
    Files.createDirectories(Paths.get(s"$dir/raw-data"))
    val header = "transaction_id,date,timestamp,amount,category,description," +
      "transaction_type,account,location"
    Files.writeString(Paths.get(csv),
      s"""$header
         |TXN_A,2024-07-01,2024-07-01 10:00:00,12.5,food,lunch,expense,checking,Online
         |TXN_B,2024-07-02,2024-07-02 11:00:00,-7.25,fees,charge,expense,credit,Branch
         |TXN_C,2024-07-03,2024-07-03 09:00:00,abc,misc,unknown,expense,checking,Online
         |""".stripMargin)
    // TXN_C's amount is a non-numeric STRING: it survives the F1 raw-null
    // drop and then coerces to null (pd.to_numeric errors='coerce') — the
    // exact dirty-data case the null-amount metric exists to count
    val (n, transformed) = EtlPipeline.processFile(spark, csv,
      s"$dir/processed-data/batch.json", "2024-07-01T12:00:00")
    assert(n === 3L)
    val m = transformed.queryExecution
      .observedMetrics(EtlPipeline.MetricsName)
    assert(m.getAs[Long]("n_rows") === 3L)
    // exact cents over the non-null amounts: 1250 + (-725)
    assert(m.getAs[Long]("amount_cents") === 525L)
    assert(m.getAs[Long]("n_null_amount") === 1L)
  }

  test("JSON rescue quarantines exactly the mangled lines and loses none") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.EtlQueries.jsonRescue(spark, sfDir).collect()
    val events = Tables.events(spark, sfDir)
    val total = events.count()
    val nBad = events
      .filter(pmod(col("event_id"), lit(7L)) === 3).count()
    val corrupt = out.filter(_.getAs[String]("bucket") == "_corrupt")
    assert(corrupt.length === 1)
    assert(corrupt.head.getAs[Long]("n") === nBad)
    assert(corrupt.head.isNullAt(corrupt.head.fieldIndex("value_cents")),
      "quarantine bucket must not carry parsed values")
    // conservation: clean buckets + quarantine account for every line
    assert(out.map(_.getAs[Long]("n")).sum === total)
  }
}
