package graft

import java.nio.file.Files

import graft.sources.{GraftCatalog, GraftLog}

/** The SQL maintenance surface: `CALL graft.system.optimize / vacuum /
  * checkpoint` run the same utilities the Scala surface uses, return
  * audit rows as result sets, and compose with DDL/DML so the WHOLE
  * table lifecycle runs in SQL alone.
  */
class GraftProceduresSpec extends SparkSpecBase {

  private def conf = spark.sessionState.newHadoopConf()

  private def register(warehouse: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
  }

  test("the full lifecycle in SQL alone: CREATE → INSERT ×2 → UPDATE → " +
      "CALL optimize (partition-aware, audited) → CALL checkpoint → " +
      "CALL vacuum → time travel on the retained range") {
    val wh = Files.createTempDirectory("graft_proc").toString
    register(wh)
    val root = s"$wh/lc"
    spark.sql("CREATE TABLE graft.lc (id BIGINT, bucket BIGINT, " +
      "v DOUBLE) PARTITIONED BY (bucket)")                        // v1
    spark.sql("INSERT INTO graft.lc SELECT id, id % 4, CAST(id AS " +
      "DOUBLE) FROM range(0, 50)")                                // v2
    spark.sql("INSERT INTO graft.lc SELECT id, id % 4, CAST(id AS " +
      "DOUBLE) FROM range(50, 100)")                              // v3
    spark.sql("UPDATE graft.lc SET v = -v WHERE id % 16 = 3")     // v4
    assert(GraftLog.latestVersion(conf, root) === 4)
    val before = GraftLog.liveEntries(conf, root, 4).size
    assert(before >= 8, s"$before files before optimize")
    // OPTIMIZE through SQL: audit row carries the committed version
    // and the post-compaction live file count
    val opt = spark.sql("CALL graft.system.optimize('lc')").collect()
    assert(opt.length === 1)
    assert(opt.head.getLong(0) === 5L) // the compaction version
    val liveAfter = opt.head.getLong(1)
    assert(liveAfter < before, s"$liveAfter !< $before")
    assert(GraftLog.liveEntries(conf, root, 5).size === liveAfter.toInt)
    // partition-aware: every compacted file keeps min==max on bucket
    GraftLog.liveAdds(conf, root, 5).foreach { r =>
      val st = graft.sources.GraftLogStats.parseStats(r.stats.get).get
      assert(st.min("bucket") === st.max("bucket"), r.file)
    }
    // content preserved through the whole DML+OPTIMIZE history
    val want = (0L until 100L)
      .map(i => (i, if (i % 16 == 3) -i.toDouble else i.toDouble)).toMap
    val got = spark.sql("SELECT id, v FROM graft.lc").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got === want)
    // CHECKPOINT through SQL
    val ck = spark.sql("CALL graft.system.checkpoint('lc')").collect()
    assert(ck.head.getLong(0) === 5L)
    assert(new org.apache.hadoop.fs.Path(s"$root/_log/_ckpt_v5._ok")
      .getFileSystem(conf)
      .exists(new org.apache.hadoop.fs.Path(s"$root/_log/_ckpt_v5._ok")))
    // VACUUM through SQL: versions below 5 expire; the audit row
    // reports deletions and the watermark refuses expired reads
    val vac = spark.sql("CALL graft.system.vacuum('lc', 5)").collect()
    assert(vac.head.getLong(0) === 5L)
    assert(vac.head.getLong(1) > 0L) // pre-compaction files deleted
    assert(GraftLog.vacuumWatermark(conf, root) === 5)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.lc VERSION AS OF 2").collect()
    }
    assert(e.getMessage.contains("watermark"), e.getMessage)
    // the retained snapshot still reads exactly
    assert(spark.sql("SELECT count(*) FROM graft.lc VERSION AS OF 5")
      .collect().head.getLong(0) === 100L)
  }

  test("CALL graft.system.history returns one audit row per retained " +
      "version, newest first, with commit instants and operation " +
      "classes folded from the control plane alone") {
    val wh = Files.createTempDirectory("graft_hist").toString
    register(wh)
    spark.sql("CREATE TABLE graft.h (id BIGINT, v DOUBLE)")        // v1
    spark.sql("INSERT INTO graft.h SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(0, 10)")                                         // v2
    spark.sql("ALTER TABLE graft.h ADD COLUMN note STRING")        // v3
    spark.sql("DELETE FROM graft.h WHERE id = 3")                  // v4
    val hist = spark.sql("CALL graft.system.history('h')").collect()
    assert(hist.map(_.getLong(0)).toSeq === Seq(4L, 3L, 2L, 1L))
    // round 16: the recorded operation row names the command itself —
    // a SQL DELETE audits as DELETE, not the shape-inferred REWRITE
    assert(hist.map(_.getString(2)).toSeq ===
      Seq("DELETE", "ALTER", "APPEND", "CREATE"))
    // commit instants: present and non-decreasing oldest → newest
    val ts = hist.reverse.map(_.getTimestamp(1))
    assert(ts.forall(_ != null))
    assert(ts.sliding(2).forall(p => !p(0).after(p(1))), ts.toSeq)
    // adds/removes: the delete rewrote one file into one file
    val v4 = hist.head
    assert(v4.getLong(3) === 1L && v4.getLong(4) === 1L)
    // max_versions bounds the walk: newest 2 rows only
    val top2 = spark.sql("CALL graft.system.history('h', 2)").collect()
    assert(top2.map(_.getLong(0)).toSeq === Seq(4L, 3L))
  }

  test("optimize accepts a clustering sort; procedures refuse unknown " +
      "names and missing tables loudly") {
    val wh = Files.createTempDirectory("graft_proc2").toString
    register(wh)
    spark.sql("CREATE TABLE graft.cl (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.cl SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(0, 10)")
    spark.sql("INSERT INTO graft.cl SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(10, 20)")
    val opt = spark.sql(
      "CALL graft.system.optimize('cl', 'id')").collect()
    assert(opt.head.getLong(0) === 4L)
    assert(opt.head.getLong(1) === 1L) // one unpartitioned bin
    // the clustering sort landed: the single file is id-ordered
    val ids = spark.sql("SELECT id FROM graft.cl").collect()
      .map(_.getLong(0)).toSeq
    assert(ids === ids.sorted)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e1 = intercept[Exception] {
      spark.sql("CALL graft.system.frobnicate('cl')").collect()
    }
    assert(msgs(e1).exists(_.contains("unknown procedure")),
      msgs(e1).mkString(" | "))
    val e2 = intercept[Exception] {
      spark.sql("CALL graft.system.optimize('no_such_table')").collect()
    }
    assert(msgs(e2).exists(m => m.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      m.contains("not found") || m.contains("NoSuchTable") ||
      m.contains("no_such_table")), msgs(e2).mkString(" | "))
  }

  test("CALL graft.system.detail returns the one-row DESCRIBE DETAIL " +
      "companion: format, version, files, bytes, dv state, layout, " +
      "checkpoint, watermark, colmap generation — all control-plane") {
    val wh = Files.createTempDirectory("graft_proc_detail").toString
    register(wh)
    spark.sql("CREATE TABLE graft.dt (id BIGINT, bucket BIGINT, " +
      "v DOUBLE) PARTITIONED BY (bucket)")
    spark.sql("INSERT INTO graft.dt SELECT id, id % 2, " +
      "CAST(id AS DOUBLE) FROM range(0, 100)")
    spark.sql("ALTER TABLE graft.dt RENAME COLUMN v TO score")
    spark.conf.set(graft.sources.GraftLogOps.DeleteModeConf,
      graft.sources.GraftLogOps.DeleteModeMor)
    try spark.sql("DELETE FROM graft.dt WHERE id IN (3, 7)")
    finally spark.conf.unset(graft.sources.GraftLogOps.DeleteModeConf)
    spark.sql("CALL graft.system.checkpoint('dt')").collect()
    val d = spark.sql("CALL graft.system.detail('dt')").collect()(0)
    assert(d.getAs[String]("format") === "graftlog")
    assert(d.getAs[Long]("version") === 4L)
    val root = s"$wh/dt"
    val live = graft.sources.GraftLog.liveState(conf, root, 4)
    assert(d.getAs[Long]("num_files") === live.adds.size.toLong)
    assert(d.getAs[Long]("size_bytes") ===
      live.adds.flatMap(_.bytes).sum)
    assert(d.getAs[Long]("num_dv_files") === live.dvs.size.toLong)
    assert(d.getAs[Long]("dv_masked_rows") === 2L)
    assert(d.getAs[String]("partition_columns") === "bucket")
    assert(d.getAs[Long]("checkpoint_version") === 4L)
    assert(d.getAs[Long]("vacuum_watermark") === 1L)
    assert(d.getAs[Long]("renamed_columns") === 1L)
    assert(d.getAs[Long]("tombstoned_columns") === 0L)
  }

  test("CALL graft.system.schema_history returns one row per naming " +
      "generation (schema or colmap change), oldest first — the " +
      "replay companion to the change feed's _commit_version stamp") {
    val wh = Files.createTempDirectory("graft_proc_sh").toString
    register(wh)
    spark.sql("CREATE TABLE graft.shp (id BIGINT, v DOUBLE)")   // v1
    spark.sql("INSERT INTO graft.shp VALUES (1, 1.0)")          // v2
    spark.sql("ALTER TABLE graft.shp RENAME COLUMN v TO score") // v3
    spark.sql("ALTER TABLE graft.shp ADD COLUMN tag STRING")    // v4
    spark.sql("INSERT INTO graft.shp VALUES (2, 2.0, 't')")     // v5
    val rows = spark.sql("CALL graft.system.schema_history('shp')")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2))).toSeq
    assert(rows.map(_._1) === Seq(1L, 3L, 4L))
    assert(rows(1)._3 === "score:v")
    assert(rows(2)._2.contains("tag"))
    assert(rows(2)._3 === "score:v") // mapping carried forward
  }
}
