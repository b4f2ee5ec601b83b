package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Maintenance
import graft.sources.{GraftLog, GraftLogWrite}

/** Row-level MERGE / DELETE on the transaction log: only the files that
  * actually contain matched rows are rewritten, as ONE zero-rename
  * remove+add version; the post-op snapshot equals the LWW/DELETE
  * semantics row-for-row, and the change feed shows exactly the
  * rewritten rows. Refusals: schema drift, duplicate merge keys, and
  * legacy (stats-less) logs.
  */
class GraftLogMergeSpec extends SparkSpecBase {

  private def conf = spark.sessionState.newHadoopConf()

  /** 100 rows, Hive-partitioned on bucket = id mod 4 → 4 part-files
    * whose manifest stats carry min=max=bucket.
    */
  private def mkTable(): String = {
    val root = Files.createTempDirectory("graft_merge").toString
    spark.range(0, 100)
      .selectExpr("id", "id % 4 AS bucket", "CAST(id * 10 AS DOUBLE) AS v")
      .write.format("graftlog").option("path", root)
      .option("schema", "id BIGINT, bucket BIGINT, v DOUBLE")
      .option("partitionBy", "bucket").mode("append").save()
    root
  }

  test("mergeIntoLog rewrites ONLY the files containing matched keys, " +
      "as one zero-rename remove+add version; the snapshot equals LWW " +
      "row-for-row and the change feed shows exactly the rewritten rows") {
    import spark.implicits._
    val root = mkTable()
    // update ids 1 and 5 (both in the bucket=1 file), insert id 1001
    val source = Seq((1L, 1L, -1.0), (5L, 1L, -5.0), (1001L, 1L, -1001.0))
      .toDF("id", "bucket", "v")
    val renamesBefore = GraftLogWrite.commitRenames.get()
    val v = Maintenance.mergeIntoLog(spark, root, source, Seq("id"))
    assert(v === 2)
    // in-place publication: the merge commit performed zero renames
    assert(GraftLogWrite.commitRenames.get() === renamesBefore)
    // exactly ONE file removed — the bucket=1 file; buckets 0/2/3 keep
    // their original files untouched
    val removes = GraftLog.versionRows(conf, root, 2)
      .filter(_.action == "remove")
    assert(removes.size === 1, removes.map(_.file).mkString(", "))
    assert(removes.head.file.contains("bucket=1"), removes.head.file)
    // post-merge snapshot = the LWW result, row for row
    val got = spark.read.format("graftlog").option("path", root).load()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val want = ((0L until 100L).map(i => (i, i % 4,
      if (i == 1 || i == 5) -i.toDouble else i * 10.0)) :+
      ((1001L, 1L, -1001.0))).sortBy(_._1)
    assert(got === want)
    // change feed of the merge version: delete rows are EXACTLY the old
    // bucket=1 file's rows; insert rows its rewrite (kept + source)
    val cdc = spark.read.format("graftlog").option("path", root)
      .option("readChangeFeed", true).load()
      .filter(col(GraftLog.CommitVersionCol) === 2L)
    val deleted = cdc.filter(col(GraftLog.ChangeTypeCol) === "delete")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(deleted === (0L until 100L).filter(_ % 4 == 1))
    val inserted = cdc.filter(col(GraftLog.ChangeTypeCol) === "insert")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(inserted ===
      ((0L until 100L).filter(_ % 4 == 1) :+ 1001L).sorted)
  }

  test("merge refusals and no-ops: an empty source commits nothing; " +
      "duplicate source keys refuse; schema drift refuses; a legacy " +
      "(stats-less) log refuses row-level ops") {
    import spark.implicits._
    val root = mkTable()
    val empty = spark.range(0)
      .selectExpr("id", "id AS bucket", "CAST(id AS DOUBLE) AS v")
    assert(Maintenance.mergeIntoLog(spark, root, empty, Seq("id")) === 1)
    assert(GraftLog.latestVersion(conf, root) === 1)
    val dup = Seq((1L, 1L, 0.0), (1L, 1L, 9.0)).toDF("id", "bucket", "v")
    val e1 = intercept[IllegalArgumentException] {
      Maintenance.mergeIntoLog(spark, root, dup, Seq("id"))
    }
    assert(e1.getMessage.contains("unique"), e1.getMessage)
    assert(GraftLog.latestVersion(conf, root) === 1)
    val drift = Seq((1L, "x")).toDF("id", "name")
    val e2 = intercept[IllegalArgumentException] {
      Maintenance.mergeIntoLog(spark, root, drift, Seq("id"))
    }
    assert(e2.getMessage.contains("must match the"), e2.getMessage)
    // the legacy txn log's manifests carry no per-file statistics —
    // row-level ops refuse with the connector-written requirement
    val legacy = Maintenance.txnTableDir(spark, sfDir)
    val before = GraftLog.latestVersion(conf, legacy)
    val e3 = intercept[IllegalArgumentException] {
      Maintenance.deleteFromLog(spark, legacy, col("o_orderkey") === 1L)
    }
    assert(e3.getMessage.contains("legacy manifest entries"),
      e3.getMessage)
    assert(GraftLog.latestVersion(conf, legacy) === before)
  }

  test("SQL DELETE FROM routes through the metadata-path rewrite for " +
      "expressible predicates (one remove+add version, CDC-visible); " +
      "TRUNCATE empties the table; inexpressible predicates take the " +
      "group-based row-level plan") {
    val root = mkTable()
    val parent = root.substring(0, root.lastIndexOf('/'))
    val name = root.substring(root.lastIndexOf('/') + 1)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", parent)
    spark.sql(s"DELETE FROM graft.`$name` WHERE bucket = 2")
    assert(GraftLog.latestVersion(conf, root) === 2)
    val got = spark.sql(s"SELECT id FROM graft.`$name`")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (0L until 100L).filterNot(_ % 4 == 2))
    // the delete version is one remove (the bucket=2 file) + adds; the
    // change feed shows it
    val removes = GraftLog.versionRows(conf, root, 2)
      .filter(_.action == "remove")
    assert(removes.size === 1, removes.map(_.file).mkString(", "))
    assert(removes.head.file.contains("bucket=2"), removes.head.file)
    // an inexpressible predicate can't use the metadata path — it runs
    // as the group-based row-level rewrite instead (GraftLogSqlDmlSpec
    // pins that path's group discipline in detail)
    spark.sql(s"DELETE FROM graft.`$name` WHERE id % 2 = 0")
    assert(GraftLog.latestVersion(conf, root) === 3)
    assert(spark.sql(s"SELECT id FROM graft.`$name`")
      .collect().map(_.getLong(0)).sorted.toSeq
      === (0L until 100L).filter(i => i % 2 == 1 && i % 4 != 2))
    // TRUNCATE = delete-all: every file removed, the table reads empty,
    // history stays time-travelable
    spark.sql(s"TRUNCATE TABLE graft.`$name`")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$name`")
      .collect().head.getLong(0) === 0L)
    assert(spark.read.format("graftlog").option("path", root)
      .option("version", 1).load().count() === 100L)
  }

  test("row-level ops on a WIDENED table: the rewrite reads pre-" +
      "widening files under the TABLE schema (appended column null-" +
      "filled), for merge, delete, and compaction alike") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_merge_widen").toString
    spark.range(0, 50).selectExpr("id")
      .write.format("graftlog").option("path", root)
      .option("schema", "id BIGINT").mode("append").save()
    spark.range(50, 60).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .write.format("graftlog").option("path", root)
      .option("schema", "id BIGINT, v DOUBLE").mode("append").save()
    // the merge touches keys living in a PRE-widening file
    val source = Seq((5L, Some(-5.0)), (999L, Some(-999.0)))
      .toDF("id", "v")
    assert(Maintenance.mergeIntoLog(spark, root, source, Seq("id")) === 3)
    def snapshot(): Seq[(Long, Option[Double])] =
      spark.read.format("graftlog").option("path", root).load()
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .sortBy(_._1).toSeq
    val want = ((0L until 50L).map(i =>
      (i, if (i == 5) Some(-5.0) else None)) ++
      (50L until 60L).map(i => (i, Some(i.toDouble))) :+
      ((999L, Some(-999.0)))).sortBy(_._1)
    assert(snapshot() === want)
    // delete on the widened column: NULL-condition (pre-widening) rows
    // are kept, matching rows leave
    Maintenance.deleteFromLog(spark, root, col("v") > 55.0)
    assert(snapshot() === want.filterNot(_._2.exists(_ > 55.0)))
    // compaction across both generations preserves the null-fill
    val before = snapshot()
    graft.sources.GraftLogOps.compactLog(spark, root)
    assert(snapshot() === before)
  }

  test("compactLog bins the small files into one remove+add version " +
      "with content preserved; an already-compacted log is a no-op") {
    val root = mkTable()
    val v2 = graft.sources.GraftLogOps.compactLog(spark, root)
    assert(v2 === 2)
    assert(GraftLog.dataFiles(conf, root, 2).size <
      GraftLog.dataFiles(conf, root, 1).size)
    val got = spark.read.format("graftlog").option("path", root).load()
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1)
      .toSeq
    assert(got === (0L until 100L).map(i => (i, i * 10.0)))
    // one output file left below the small threshold → nothing to bin
    assert(graft.sources.GraftLogOps.compactLog(spark, root) === 2)
    assert(GraftLog.latestVersion(conf, root) === 2)
  }

  test("deleteFromLog: matched rows leave, NULL-condition rows are " +
      "KEPT (SQL DELETE semantics), a no-match delete commits nothing") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_del").toString
    Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
      .toDF("id", "v")
      .write.format("graftlog").option("path", root)
      .option("schema", "id BIGINT, v DOUBLE").mode("append").save()
    val v2 = Maintenance.deleteFromLog(spark, root, col("v") > 2.0)
    assert(v2 === 2)
    val got = spark.read.format("graftlog").option("path", root).load()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(1L, 2L)) // id 3 deleted; id 2 (NULL cond) kept
    // idempotent: the same delete again matches nothing → no new version
    assert(Maintenance.deleteFromLog(spark, root, col("v") > 2.0) === 2)
    assert(GraftLog.latestVersion(conf, root) === 2)
  }
}
