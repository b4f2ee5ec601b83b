package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{GraftCatalog, GraftLog}

/** Column mapping × the streaming/CDC read paths: the tail and the
  * change feed ride the SAME scan machinery as batch reads, so a
  * renamed table must stream and CDC-read correctly — old-generation
  * files decode under their physical names, output binds the logical
  * names, and a post-rename epoch interleaves.
  */
class GraftLogColumnMapStreamSpec extends SparkSpecBase {

  test("the streaming tail of a RENAMED table emits both naming " +
      "generations' rows under the logical schema") {
    val wh = Files.createTempDirectory("graft_cmap_stream").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    val root = s"$wh/st"
    spark.sql("CREATE TABLE graft.st (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.st SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(0, 5)")                                         // v2
    spark.sql("ALTER TABLE graft.st RENAME COLUMN v TO score")    // v3
    spark.sql("INSERT INTO graft.st VALUES (100, 100.0)")         // v4
    val out = Files.createTempDirectory("graft_cmap_sink").toString
    val q = spark.readStream.format("graftlog").option("path", root)
      .load()
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    // loud on timeout: a still-running query would otherwise fail the
    // content assertion with a misleading partial-sink message
    assert(q.awaitTermination(120000), "stream did not drain in 120s")
    val got = spark.read.parquet(s"$out/data")
    assert(got.schema.fieldNames.toSeq === Seq("id", "score"))
    val rows = got.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(_._1).toSeq
    assert(rows === ((0L until 5L).map(i => (i, i.toDouble)) :+
      ((100L, 100.0))))
  }

  test("the CHANGE FEED of a renamed table tags both generations' " +
      "rows and a post-rename DELETE's remove rows decode correctly") {
    val wh = Files.createTempDirectory("graft_cmap_cdc").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    val root = s"$wh/cd"
    spark.sql("CREATE TABLE graft.cd (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.cd SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(0, 5)")                                         // v2
    spark.sql("ALTER TABLE graft.cd RENAME COLUMN v TO score")    // v3
    spark.sql("DELETE FROM graft.cd WHERE id >= 3")               // v4
    val cdc = spark.read.format("graftlog").option("path", root)
      .option("readChangeFeed", true).load()
    assert(cdc.schema.fieldNames.toSeq ===
      Seq("id", "score", GraftLog.ChangeTypeCol,
        GraftLog.CommitVersionCol))
    val v4 = cdc.filter(col(GraftLog.CommitVersionCol) === 4L)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .toSeq
    // file-layout-independent: delete rows are the TOUCHED files' old
    // rows (decoded correctly through the mapping — score values
    // intact), insert rows their kept remainder, and the net change is
    // exactly the deleted keys
    val dels = v4.filter(_._3 == "delete").map(r => (r._1, r._2)).toSet
    val ins = v4.filter(_._3 == "insert").map(r => (r._1, r._2)).toSet
    assert(dels.forall { case (i, sc) => sc == i.toDouble })
    assert(ins.subsetOf(dels))
    assert(dels -- ins === Set((3L, 3.0), (4L, 4.0)), (dels, ins))
    // fold-to-snapshot sanity through the renamed schema
    val snap = spark.sql("SELECT id, score FROM graft.cd").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(snap === (0L until 3L).map(i => (i, i.toDouble)))
  }

  test("VERSION-STAMPED naming recovery: every change-feed row's " +
      "_commit_version joins against schema_history to tell which " +
      "logical name that version's rows carried — the documented " +
      "read-time-names semantics made explicit for replay consumers") {
    val wh = Files.createTempDirectory("graft_cmap_hist").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    val root = s"$wh/sh"
    spark.sql("CREATE TABLE graft.sh (id BIGINT, v DOUBLE)")       // v1
    spark.sql("INSERT INTO graft.sh VALUES (1, 1.0)")              // v2
    spark.sql("ALTER TABLE graft.sh RENAME COLUMN v TO score")     // v3
    spark.sql("INSERT INTO graft.sh VALUES (2, 2.0)")              // v4
    val hist = spark.sql("CALL graft.system.schema_history('sh')")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // one row per naming generation: CREATE's DDL (no mapping) and the
    // RENAME's DDL + colmap; unchanged versions add no rows
    assert(hist.map(_._1) === Seq(1L, 3L))
    assert(hist(0)._2.contains("v") && !hist(0)._2.contains("score"))
    assert(hist(0)._3 === "")
    assert(hist(1)._2.contains("score"))
    assert(hist(1)._3 === "score:v")
    // the replay recipe: stamp → newest generation at or below it
    def namingAt(version: Long): String =
      hist.filter(_._1 <= version).maxBy(_._1)._2
    val cdc = spark.read.format("graftlog").option("path", root)
      .option("readChangeFeed", true).load()
      .select(col(GraftLog.CommitVersionCol)).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(cdc === Seq(2L, 4L))
    assert(!namingAt(2L).contains("score")) // v2 rows wrote under `v`
    assert(namingAt(4L).contains("score"))  // v4 rows under `score`
  }
}
