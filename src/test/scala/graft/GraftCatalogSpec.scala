package graft

import java.nio.file.Files

import org.apache.spark.sql.connector.catalog.Identifier

import graft.operators.Maintenance
import graft.sources.{GraftCatalog, GraftLog}

/** The SQL catalog surface: `VERSION AS OF` / `TIMESTAMP AS OF` resolve
  * through [[GraftCatalog]] to the same snapshots as the reader-option
  * path, refusals (uncommitted, vacuum-expired) surface through SQL,
  * and the catalog stays read-path-only.
  */
class GraftCatalogSpec extends SparkSpecBase {

  private def conf = spark.sessionState.newHadoopConf()

  private def register(warehouse: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
  }

  test("VERSION AS OF through SQL equals the option path at every " +
      "version; uncommitted and vacuum-expired versions refuse with " +
      "the connector's own errors") {
    val root = Maintenance.txnTableDir(spark, sfDir)
    val parent = root.substring(0, root.lastIndexOf('/'))
    val table = root.substring(root.lastIndexOf('/') + 1)
    register(parent)
    val latest = GraftLog.latestVersion(conf, root)
    (1 to latest).foreach { v =>
      val sql = spark.sql(
        s"SELECT o_orderkey FROM graft.`$table` VERSION AS OF $v")
        .collect().map(_.getLong(0)).sorted.toSeq
      val opt = Maintenance.readVersion(spark, root, v)
        .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
      assert(sql === opt, s"version $v")
    }
    // plain reads resolve latest
    assert(spark.sql(s"SELECT count(*) FROM graft.`$table`")
      .collect().head.getLong(0) ===
      Maintenance.readVersion(spark, root, latest).count())
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$table` VERSION AS OF ${latest + 9}")
        .collect()
    }
    assert(e1.getMessage.contains("not committed"), e1.getMessage)
    // the vacuumed twin: version 1 is expired — SQL must refuse at the
    // watermark, same as load()
    Maintenance.vacuumedTableDir(spark, sfDir)
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`${table}_vac` VERSION AS OF 1")
        .collect()
    }
    assert(e2.getMessage.contains("watermark"), e2.getMessage)
  }

  test("TIMESTAMP AS OF binds to the newest version committed at or " +
      "before the instant (the _ok marker's visibility time)") {
    val wh = Files.createTempDirectory("graft_cat_ts").toString
    val root = s"$wh/t"
    def append(from: Long, until: Long): Unit =
      spark.range(from, until).selectExpr("id")
        .write.format("graftlog").option("path", root)
        .option("schema", "id BIGINT").mode("append").save()
    append(0, 10)
    Thread.sleep(1100) // commit times must be distinguishable in SQL's
    Thread.sleep(1)    // second-precision timestamp literals
    append(10, 30)
    register(wh)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    def okMtime(v: Int): Long = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$root/_log/v$v._ok"))
      .getModificationTime
    val (m1, m2) = (okMtime(1), okMtime(2))
    assert(m2 > m1)
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val ident = Identifier.of(Array.empty, "t")
    def versionAt(micros: Long): Int =
      cat.loadTable(ident, micros)
        .asInstanceOf[graft.sources.GraftLogTable].asOfVersion
    assert(versionAt(m1 * 1000L) === 1)            // exactly at v1
    assert(versionAt(m2 * 1000L - 1000L) === 1)    // between commits
    assert(versionAt(m2 * 1000L) === 2)            // at v2
    assert(versionAt(m2 * 1000L + 60000000L) === 2) // after everything
    val e = intercept[IllegalArgumentException] {
      versionAt(m1 * 1000L - 1000000L)             // before v1
    }
    assert(e.getMessage.contains("no version"), e.getMessage)
    // and through actual SQL: a timestamp literal between the commits
    // reads the 10-row snapshot
    val tsLit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(m1))
    assert(spark.sql(
      s"SELECT count(*) FROM graft.t TIMESTAMP AS OF '$tsLit'")
      .collect().head.getLong(0) === 10L)
  }

  test("listTables surfaces graftlog roots under the warehouse; the " +
      "catalog is read-path-only (CREATE refuses with the write-path " +
      "pointer)") {
    val root = Maintenance.txnTableDir(spark, sfDir)
    val parent = root.substring(0, root.lastIndexOf('/'))
    val table = root.substring(root.lastIndexOf('/') + 1)
    register(parent)
    val names = spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).toSet
    assert(names.contains(table), names.toString)
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.brand_new (id BIGINT) ")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("read-path-only")),
      msgs(e).mkString(" | "))
  }
}
