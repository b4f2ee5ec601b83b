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
    // the recorded commit instants (manifest committs micros) drive
    // resolution; the marker mtimes above only anchor the SQL literal
    val t1 = GraftLog.commitMicros(conf, root, 1).get
    val t2 = GraftLog.commitMicros(conf, root, 2).get
    assert(t2 > t1)
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val ident = Identifier.of(Array.empty, "t")
    def versionAt(micros: Long): Int =
      cat.loadTable(ident, micros)
        .asInstanceOf[graft.sources.GraftLogTable].asOfVersion
    assert(versionAt(t1) === 1)                  // exactly at v1
    assert(versionAt(t1 + (t2 - t1) / 2) === 1)  // between commits
    assert(versionAt(t2) === 2)                  // at v2
    assert(versionAt(t2 + 60000000L) === 2)      // after everything
    val e = intercept[IllegalArgumentException] {
      versionAt(t1 - 1000000L)                   // before v1
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

  test("listTables surfaces graftlog roots under the warehouse; " +
      "RENAME and destructive ALTERs refuse; DROP refuses LOUDLY and " +
      "never deletes history") {
    val root = Maintenance.txnTableDir(spark, sfDir)
    val parent = root.substring(0, root.lastIndexOf('/'))
    val table = root.substring(root.lastIndexOf('/') + 1)
    register(parent)
    val names = spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).toSet
    assert(names.contains(table), names.toString)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // a TYPE change is genuinely destructive (old files would misread)
    // and refuses; RENAME/DROP COLUMN are supported via column mapping
    // since round 14 (GraftLogColumnMapSpec pins them)
    val e1 = intercept[Exception] {
      spark.sql(
        s"ALTER TABLE graft.`$table` ALTER COLUMN o_orderkey TYPE INT")
    }
    assert(msgs(e1).exists(m => m.contains("WIDENING") ||
      m.contains("NOT_SUPPORTED_CHANGE_COLUMN")), msgs(e1).mkString(" | "))
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$table` RENAME TO renamed_away")
    }
    assert(msgs(e2).exists(m => m.contains("storage layer") ||
      m.contains("RENAME")), msgs(e2).mkString(" | "))
    // DROP refuses loudly — never `false`, which would surface as a
    // misleading NoSuchTableException for a table that plainly exists —
    // and the log (every version) survives
    val e3 = intercept[Exception] {
      spark.sql(s"DROP TABLE graft.`$table`")
    }
    assert(msgs(e3).exists(_.contains("storage layer")),
      msgs(e3).mkString(" | "))
    assert(GraftLog.latestVersion(conf, root) >= 1)
  }

  test("ALTER TABLE ADD COLUMN commits a widened empty version (the " +
      "write path's WIDENING contract as SQL): old files read back " +
      "null-filled, INSERT writes the new column, time travel returns " +
      "each version's own schema; duplicates and positioned adds refuse") {
    val wh = Files.createTempDirectory("graft_cat_alter").toString
    register(wh)
    spark.sql("CREATE TABLE graft.alt (id BIGINT)")
    spark.sql("INSERT INTO graft.alt SELECT id FROM range(5)") // v2
    spark.sql("ALTER TABLE graft.alt ADD COLUMN v DOUBLE")     // v3
    assert(GraftLog.latestVersion(conf, s"$wh/alt") === 3)
    assert(spark.sql("SELECT * FROM graft.alt").schema.fieldNames.toSeq
      === Seq("id", "v"))
    // pre-widening rows null-fill the appended column
    assert(spark.sql("SELECT count(*) FROM graft.alt WHERE v IS NULL")
      .collect().head.getLong(0) === 5L)
    // the widened schema is writable immediately
    spark.sql("INSERT INTO graft.alt VALUES (100, 1.5)")       // v4
    val got = spark.sql(
      "SELECT id, v FROM graft.alt WHERE v IS NOT NULL").collect()
    assert(got.length === 1 && got.head.getLong(0) === 100L &&
      got.head.getDouble(1) === 1.5)
    // time travel returns each version's own schema
    assert(spark.sql("SELECT * FROM graft.alt VERSION AS OF 2")
      .schema.fieldNames.toSeq === Seq("id"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // a duplicate column name refuses (Spark's analyzer catches it
    // before the catalog; the catalog's own `already present` guard
    // backstops non-SQL callers)
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.alt ADD COLUMN id BIGINT")
    }
    assert(msgs(e1).exists(m => m.contains("already exists") ||
      m.contains("already present")), msgs(e1).mkString(" | "))
    // a positioned add is NOT a widening (appended columns only)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.alt ADD COLUMN w DOUBLE FIRST")
    }
    assert(msgs(e2).exists(_.contains("WIDENING")),
      msgs(e2).mkString(" | "))
    assert(GraftLog.latestVersion(conf, s"$wh/alt") === 4)
  }

  test("TIMESTAMP AS OF resolves from the manifest's committs micros, " +
      "not marker mtimes: two versions forced into the SAME marker " +
      "mtime second still resolve to their own commit instants") {
    val wh = Files.createTempDirectory("graft_cat_tie").toString
    val root = s"$wh/tie"
    def append(from: Long, until: Long): Unit =
      spark.range(from, until).selectExpr("id")
        .write.format("graftlog").option("path", root)
        .option("schema", "id BIGINT").mode("append").save()
    append(0, 10)  // v1
    append(10, 30) // v2, typically within the same wall-clock second
    register(wh)
    // recorded commit micros are strictly increasing...
    val t1 = GraftLog.commitMicros(conf, root, 1).get
    val t2 = GraftLog.commitMicros(conf, root, 2).get
    assert(t2 > t1)
    // ...even though the markers now carry ONE shared mtime second
    // (the object-store granularity that used to make resolution tie)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    Seq(1, 2).foreach { v =>
      fs.setTimes(new org.apache.hadoop.fs.Path(s"$root/_log/v$v._ok"),
        (t1 / 1000L / 1000L) * 1000L, -1)
    }
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val ident = Identifier.of(Array.empty, "tie")
    def versionAt(micros: Long): Int =
      cat.loadTable(ident, micros)
        .asInstanceOf[graft.sources.GraftLogTable].asOfVersion
    assert(versionAt(t1) === 1)
    assert(versionAt(t2 - 1) === 1)
    assert(versionAt(t2) === 2)
    assert(versionAt(t2 + 1000000L) === 2)
    val e = intercept[IllegalArgumentException] { versionAt(t1 - 1) }
    assert(e.getMessage.contains("no version"), e.getMessage)
  }

  test("CREATE TABLE / CTAS / INSERT INTO route through the ONE commit " +
      "protocol: create commits an empty v1 carrying the schema, CTAS " +
      "data lands as v2, INSERT appends v3 — every step time-travelable " +
      "and readable through the option path too") {
    val wh = Files.createTempDirectory("graft_cat_ctas").toString
    register(wh)
    spark.range(0, 50).selectExpr("id", "id * 2 AS v")
      .createOrReplaceTempView("ctas_src")
    spark.sql(
      "CREATE TABLE graft.t1 AS SELECT id, v FROM ctas_src WHERE id < 30")
    // v1 = the committed empty create (schema readable, zero rows)
    assert(spark.sql("SELECT count(*) FROM graft.t1 VERSION AS OF 1")
      .collect().head.getLong(0) === 0L)
    assert(spark.sql("SELECT * FROM graft.t1 VERSION AS OF 1")
      .schema.fieldNames.toSeq === Seq("id", "v"))
    assert(spark.sql("SELECT count(*) FROM graft.t1")
      .collect().head.getLong(0) === 30L)
    spark.sql("INSERT INTO graft.t1 SELECT id, v FROM ctas_src WHERE id >= 30")
    assert(spark.sql("SELECT count(*) FROM graft.t1")
      .collect().head.getLong(0) === 50L)
    assert(spark.sql("SELECT count(*) FROM graft.t1 VERSION AS OF 2")
      .collect().head.getLong(0) === 30L)
    assert(GraftLog.latestVersion(conf, s"$wh/t1") === 3)
    // the SQL-created table is the same log the option path reads
    assert(spark.read.format("graftlog").option("path", s"$wh/t1").load()
      .count() === 50L)
    // duplicate CREATE refuses; IF NOT EXISTS stays quiet
    intercept[org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException] {
      spark.sql("CREATE TABLE graft.t1 (id BIGINT)")
    }
    spark.sql("CREATE TABLE IF NOT EXISTS graft.t1 (id BIGINT)")
    assert(GraftLog.latestVersion(conf, s"$wh/t1") === 3) // unchanged
    // partitioned CTAS: identity PARTITIONED BY lays Hive k=v/ dirs,
    // values stay IN the files, per-file stats carry min=max=value
    spark.sql(
      "CREATE TABLE graft.t2 PARTITIONED BY (grp) AS " +
        "SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS grp " +
        "FROM ctas_src")
    val files = GraftLog.dataFiles(conf, s"$wh/t2",
      GraftLog.latestVersion(conf, s"$wh/t2"))
    assert(files.nonEmpty)
    assert(files.forall(f => f.contains("grp=a") || f.contains("grp=b")),
      files.take(3).mkString(", "))
    assert(spark.sql("SELECT grp, count(*) AS n FROM graft.t2 GROUP BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      .toSeq === Seq(("a", 25L), ("b", 25L)))
    // PARTITIONED BY survives SESSIONS: the declared layout is a
    // manifest row, so an INSERT INTO resolving through a FRESH
    // loadTable (not the createTable-returned instance) still lays
    // down Hive k=v/ directories, and partitioning() reports it
    spark.sql(
      "CREATE TABLE graft.t4 (id BIGINT, grp STRING) PARTITIONED BY (grp)")
    spark.sql(
      "INSERT INTO graft.t4 SELECT id, " +
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM ctas_src")
    val files4 = GraftLog.dataFiles(conf, s"$wh/t4",
      GraftLog.latestVersion(conf, s"$wh/t4"))
    assert(files4.nonEmpty &&
      files4.forall(f => f.contains("grp=a") || f.contains("grp=b")),
      files4.take(3).mkString(", "))
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val t4 = cat.loadTable(Identifier.of(Array.empty, "t4"))
    assert(t4.partitioning().length === 1,
      t4.partitioning().mkString(", "))
    // a CREATE losing the claim race refuses instead of silently
    // stacking an extra empty version (the commit-time gate; the
    // pre-check covers the common duplicate case above)
    val e0 = intercept[IllegalStateException] {
      graft.sources.GraftLogWrite.commitStaged(conf, s"$wh/t4",
        s"$wh/t4/data/w_race", Nil,
        Some(org.apache.spark.sql.types.StructType.fromDDL("id BIGINT")),
        expectedVersion = Some(1))
    }
    assert(e0.getMessage.contains("concurrent writer committed first"),
      e0.getMessage)
    // the refused claim was released: the table still appends cleanly
    spark.sql("INSERT INTO graft.t4 SELECT id, 'a' FROM ctas_src LIMIT 1")
    // unstorable column types refuse at CREATE, before any write
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.t3 (id BIGINT, o INTERVAL DAY)")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("unsupported type")),
      msgs(e).mkString(" | "))
    assert(GraftLog.latestVersion(conf, s"$wh/t3") === 0)
  }
}
