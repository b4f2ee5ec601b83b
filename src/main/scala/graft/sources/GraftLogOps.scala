package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Row-level operations on the transaction log: MERGE (LWW key-match
  * upsert) and DELETE, each rewriting ONLY the files that actually
  * contain affected rows, committed as ONE remove+add version through
  * the connector's zero-rename publication. The SQL surface
  * (`DELETE FROM graft.t WHERE ...`, TRUNCATE) delegates here via
  * [[GraftLogTable]]'s SupportsDelete; the utility surface
  * (Maintenance.mergeIntoLog / deleteFromLog) is the same code.
  *
  * Scale shape shared by both operations:
  *  1. catalog-level candidate prune from the per-file manifest
  *     statistics (merge: source key bounds) — zero data I/O;
  *  2. exact touch detection: one distributed scan/semi-join whose
  *     driver-collected result is DISTINCT FILE NAMES — bounded by the
  *     file count, never row count;
  *  3. rewrite reads only the touched files (shuffles scale with
  *     touched data + source, not table size);
  *  4. one commit: remove touched, add rewritten — the change feed
  *     shows the version as delete(old file rows) + insert(rewrite).
  */
object GraftLogOps {

  /** Files of the latest snapshot as stats-bearing
    * [[GraftLogStats.FileEntry]]s keyed by their manifest-relative
    * path. Row-level operations REQUIRE a connector-written log:
    * per-file statistics make "which files could hold these keys" a
    * catalog read, and per-file manifest rows make "remove exactly
    * these files" representable. Empty files are skipped (nothing to
    * match).
    */
  private def statsEntries(s: SparkSession, root: String, v: Int)
      : Seq[(String, GraftLogStats.FileEntry)] = {
    val conf = s.sessionState.newHadoopConf()
    GraftLog.liveAdds(conf, root, v)
      .filter(!_.rows.contains(0L))
      .map { r =>
        require(r.rows.isDefined && r.stats.isDefined,
          s"graftlog row-level op: $root has legacy manifest entries " +
            s"(no per-file statistics for ${r.file}); row-level MERGE/" +
            "DELETE requires a connector-written log")
        (r.file, GraftLog.expandRow(conf, root, r).head)
      }
  }

  /** `input_file_name()` URIs → the manifest-relative paths they name,
    * resolved against the candidate set (URI scheme/authority rendering
    * differs across filesystems; compare canonical path forms).
    */
  private def toRelPaths(root: String, uris: Seq[String],
      candidates: Seq[String]): Seq[String] = {
    val norm = uris.map(u => new Path(u).toUri.getPath).toSet
    candidates.filter(rel =>
      norm.contains(new Path(s"$root/$rel").toUri.getPath))
  }

  /** Write `df` as this row-level operation's new data files — landed
    * DIRECTLY at their final write-scoped location (`data/w_<op>_<uuid>`,
    * the connector's zero-rename publication discipline: nothing
    * references them until the manifest does) — and commit them as one
    * remove+add version. Per-file statistics are read off each new
    * file's footer, so the rewritten snapshot plans from the manifest
    * exactly like any connector write. Empty part-files (a task whose
    * whole input was deleted) are dropped from the commit and disk.
    */
  private def commitRewrite(s: SparkSession, root: String, op: String,
      df: DataFrame, schema: StructType, removes: Seq[String]): Int = {
    val conf = s.sessionState.newHadoopConf()
    val staging = s"$root/data/w_${op}_${java.util.UUID.randomUUID()}"
    df.write.parquet(staging)
    val fs = new Path(root).getFileSystem(conf)
    // Spark's committer drops a _SUCCESS marker; it is never referenced,
    // but delete it so the write directory holds only committed files
    fs.delete(new Path(s"$staging/_SUCCESS"), false)
    // rebuild each path as staging + name (listStatus returns
    // scheme-qualified URIs; the commit compares raw root-relative
    // strings) — the rewrite staging directory is flat by construction
    val files = fs.listStatus(new Path(staging))
      .toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") &&
        !n.startsWith("_") && !n.startsWith("."))
      .sorted
      .flatMap { n =>
        val (rows, bytes, stats) =
          GraftLogStats.describeFile(conf, s"$staging/$n", schema)
        if (rows == 0L) {
          fs.delete(new Path(s"$staging/$n"), false)
          None
        } else Some(GraftLogFileCommit(s"$staging/$n", rows, bytes,
          stats))
      }
    GraftLogWrite.commitStaged(conf, root, staging, files, Some(schema),
      removes = removes)
  }

  /** MERGE INTO the log — the LWW key-match upsert as a ROW-LEVEL
    * table-format operation: every table row whose key appears in
    * `source` is replaced by the source row, every unmatched source row
    * inserts, and ONLY the files that actually contain a matched key
    * are rewritten.
    *
    * Contract: `source` columns must match the table schema (the append
    * contract), source keys must be unique (one LWW winner per key —
    * checked), and the log must be connector-written (per-file
    * statistics). A no-op merge (empty source) commits nothing.
    * Returns the committed (or current, if no-op) version.
    */
  def mergeIntoLog(s: SparkSession, root: String,
      source: DataFrame, keys: Seq[String]): Int = {
    val conf = s.sessionState.newHadoopConf()
    val latest = GraftLog.latestVersion(conf, root)
    require(latest >= 1, s"no committed versions under $root")
    val schema = GraftLog.inferSchema(conf, root, latest)
    require(keys.nonEmpty && keys.forall(schema.fieldNames.contains),
      s"merge keys ${keys.mkString(", ")} not all in [${schema.toDDL}]")
    val incoming = GraftLog.asNullable(source.schema)
      .fields.map(f => (f.name, f.dataType)).toSeq
    val table = schema.fields.map(f => (f.name, f.dataType)).toSeq
    require(incoming == table,
      s"merge source schema [${source.schema.toDDL}] must match the " +
        s"table schema [${schema.toDDL}] (names and types, in order)")
    val entries = statsEntries(s, root, latest)
    val src = source.cache()
    try {
      val srcCount = src.count()
      if (srcCount == 0) return latest // no-op: nothing matched or inserted
      require(src.select(keys.map(col): _*).distinct().count() == srcCount,
        "merge source keys must be unique (one LWW winner per key)")
      // 1. catalog prune on source key bounds
      val boundAggs = keys.flatMap(k => Seq(min(col(k)), max(col(k))))
      val boundsRow = src.agg(boundAggs.head, boundAggs.tail: _*).head()
      val candidates = entries.filter { case (_, fe) =>
        keys.zipWithIndex.forall { case (k, i) =>
          val mn = boundsRow.get(2 * i)
          val mx = boundsRow.get(2 * i + 1)
          mn == null || mx == null ||
            (GraftLogStats.mayMatch(schema, fe.stats.get, fe.rows,
              GreaterThanOrEqual(k, mn)) &&
              GraftLogStats.mayMatch(schema, fe.stats.get, fe.rows,
                LessThanOrEqual(k, mx)))
        }
      }
      // 2. exact touched files: distinct file names, never row data
      val touched: Seq[String] =
        if (candidates.isEmpty) Seq.empty
        else toRelPaths(root,
          s.read.schema(schema)
            .parquet(candidates.map(c => s"$root/${c._1}"): _*)
            .withColumn("_graft_file", input_file_name())
            .join(src.select(keys.map(col): _*), keys, "left_semi")
            .select("_graft_file").distinct()
            .collect().map(_.getString(0)).toSeq,
          candidates.map(_._1))
      // 3. rewrite: unmatched rows of touched files + the whole source
      val cols = schema.fieldNames.map(col).toSeq
      val rewritten =
        if (touched.isEmpty) src.select(cols: _*)
        else s.read.schema(schema)
          .parquet(touched.map(f => s"$root/$f"): _*)
          .select(cols: _*)
          .join(src.select(keys.map(col): _*), keys, "left_anti")
          .unionByName(src.select(cols: _*))
      // 4. one remove+add commit
      commitRewrite(s, root, "merge", rewritten, schema, touched)
    } finally src.unpersist()
  }

  /** Row-level DELETE on the log: rewrite ONLY the files containing
    * rows matching `cond` (SQL DELETE semantics — a NULL condition
    * keeps the row), committed as one remove+add version. Touch
    * detection is one distributed filtered scan collecting DISTINCT
    * FILE NAMES (parquet row-group pruning applies, so a selective
    * condition over a clustered table reads little); the rewrite reads
    * only the touched files. A delete that matches nothing commits
    * nothing. Returns the committed (or current) version.
    */
  def deleteFromLog(s: SparkSession, root: String, cond: Column): Int = {
    val conf = s.sessionState.newHadoopConf()
    val latest = GraftLog.latestVersion(conf, root)
    require(latest >= 1, s"no committed versions under $root")
    val schema = GraftLog.inferSchema(conf, root, latest)
    val entries = statsEntries(s, root, latest)
    if (entries.isEmpty) return latest
    val touched = toRelPaths(root,
      s.read.schema(schema)
        .parquet(entries.map(e => s"$root/${e._1}"): _*)
        .withColumn("_graft_file", input_file_name())
        .filter(cond)
        .select("_graft_file").distinct()
        .collect().map(_.getString(0)).toSeq,
      entries.map(_._1))
    if (touched.isEmpty) return latest // no-op: nothing matched
    val cols = schema.fieldNames.map(col).toSeq
    val kept = s.read.schema(schema)
      .parquet(touched.map(f => s"$root/$f"): _*)
      .select(cols: _*)
      .filter(coalesce(cond, lit(false)) === false)
    commitRewrite(s, root, "delete", kept, schema, touched)
  }

  /** OPTIMIZE (compaction) on the log: rewrite the live files smaller
    * than `smallBytes` into ~`targetBytes` output files, committed as
    * one remove+add version — content-preserving by construction (the
    * rewrite is a plain read of exactly the removed files), CDC-visible
    * as delete+insert, refused by the snapshot streaming tail exactly
    * like any rewrite (CDC tails consume it). Files already at or above
    * the small-file threshold are untouched; fewer than two small files
    * means nothing to gain, so nothing commits. Returns the committed
    * (or current) version.
    */
  def compactLog(s: SparkSession, root: String,
      smallBytes: Long = 32L * 1024 * 1024,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val conf = s.sessionState.newHadoopConf()
    val latest = GraftLog.latestVersion(conf, root)
    require(latest >= 1, s"no committed versions under $root")
    val schema = GraftLog.inferSchema(conf, root, latest)
    val entries = statsEntries(s, root, latest)
    val small = entries.filter(_._2.bytes.exists(_ < smallBytes))
    if (small.size < 2) return latest // nothing worth binning
    val totalBytes = small.map(_._2.bytes.get).sum
    val outFiles = math.max(1L,
      (totalBytes + targetBytes - 1) / targetBytes).toInt
    val cols = schema.fieldNames.map(col).toSeq
    val compacted = s.read.schema(schema)
      .parquet(small.map(e => s"$root/${e._1}"): _*)
      .select(cols: _*)
      .coalesce(outFiles)
    commitRewrite(s, root, "compact", compacted, schema,
      small.map(_._1))
  }

  /** Data-source Filter → Column, for the shapes SQL `DELETE FROM`
    * hands a SupportsDelete table. None = not expressible (the DELETE
    * then refuses during analysis via canDeleteWhere, never silently
    * deleting the wrong rows). Values arrive as external types
    * (java.sql.Date, strings, numbers) — `lit` maps them back.
    */
  def filterToColumn(f: Filter): Option[Column] = f match {
    case EqualTo(c, v)            => Some(col(c) === lit(v))
    case EqualNullSafe(c, v)      => Some(col(c) <=> lit(v))
    case GreaterThan(c, v)        => Some(col(c) > lit(v))
    case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case LessThan(c, v)           => Some(col(c) < lit(v))
    case LessThanOrEqual(c, v)    => Some(col(c) <= lit(v))
    case In(c, vs)                => Some(col(c).isin(vs.toSeq: _*))
    case IsNull(c)                => Some(col(c).isNull)
    case IsNotNull(c)             => Some(col(c).isNotNull)
    case StringStartsWith(c, v)   => Some(col(c).startsWith(v))
    case StringEndsWith(c, v)     => Some(col(c).endsWith(v))
    case StringContains(c, v)     => Some(col(c).contains(v))
    case AlwaysTrue()             => Some(lit(true))
    case AlwaysFalse()            => Some(lit(false))
    case And(l, r) =>
      for { a <- filterToColumn(l); b <- filterToColumn(r) } yield a && b
    case Or(l, r) =>
      for { a <- filterToColumn(l); b <- filterToColumn(r) } yield a || b
    case Not(x) => filterToColumn(x).map(!_)
    case _      => None
  }
}
