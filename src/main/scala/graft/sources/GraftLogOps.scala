package graft.sources

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Row-level operations on the transaction log: MERGE (LWW key-match
  * upsert), DELETE, and OPTIMIZE (compaction), each rewriting ONLY the
  * files that actually contain affected rows, committed as ONE
  * remove+add version through the connector's zero-rename publication.
  * The SQL surface (`DELETE FROM graft.t WHERE ...`, TRUNCATE,
  * `CALL graft.system.optimize(...)`) delegates here via
  * [[GraftLogTable]]'s SupportsDelete and the catalog's procedures;
  * the utility surface (Maintenance.mergeIntoLog / deleteFromLog) is
  * the same code.
  *
  * Scale shape shared by the row-level operations:
  *  1. catalog-level candidate prune from the per-file manifest
  *     statistics — PER FILE against the source's key profile (exact
  *     distinct keys when few, per-range-bucket exact bounds when
  *     many), so a CDC batch whose keys span the domain still prunes
  *     to the files that actually overlap them, instead of one global
  *     [min, max] keeping everything;
  *  2. exact touch detection: one distributed scan/semi-join whose
  *     driver-collected result is DISTINCT FILE NAMES — bounded by the
  *     file count, never row count;
  *  3. rewrite reads only the touched files (shuffles scale with
  *     touched data + source, not table size);
  *  4. one commit: remove touched, add rewritten — the change feed
  *     shows the version as delete(old file rows) + insert(rewrite).
  *
  * Concurrency: every operation here is OPTIMISTIC with bounded
  * auto-retry. The commit revalidates its remove set (and, for MERGE,
  * concurrently-ADDED files against its source keys — the
  * write-serializable half) under the version claim; a conflict or a
  * pending claim releases everything, the operation re-plans against
  * the NEW snapshot, and retries — so two concurrent merges on
  * disjoint keys both land without caller intervention, the way real
  * table formats behave at streaming-ingest commit rates.
  */
object GraftLogOps {

  /** Bounded optimistic retries before surfacing the conflict. */
  val MaxCommitAttempts = 5

  /** How many distinct source keys are collected exactly for per-file
    * candidate pruning before falling back to range-bucket profiles
    * (matches the In() width [[GraftLogStats.mayMatch]] accepts).
    */
  val MaxInlineKeys = 1000

  /** Range buckets for large-source key profiles: each bucket carries
    * the EXACT min/max of the source keys that fell in it, so the
    * per-file overlap test stays conservative but domain-spanning
    * sources no longer degenerate to one global interval.
    */
  val RangeBuckets = 256

  /** Re-plan-and-retry loop for optimistic row-level commits: a
    * write-write/read-write conflict means a concurrent writer
    * invalidated this plan — recompute against the new snapshot; a
    * pending claim means a writer is mid-commit — brief backoff, then
    * the claim either committed (rebase) or its documented recovery
    * applies. After [[MaxCommitAttempts]] the conflict surfaces as-is.
    */
  private def withRetry[T](body: () => T): T = {
    var attempt = 1
    var last: IllegalStateException = null
    while (attempt <= MaxCommitAttempts) {
      try return body()
      catch {
        case e: GraftLogConflictException =>
          last = e; attempt += 1
        case e: GraftLogClaimPendingException =>
          last = e; attempt += 1
          Thread.sleep(20L * attempt) // let the in-flight commit finish
      }
    }
    throw last
  }

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

  private[sources] def normPath(p: String): String =
    new Path(p).toUri.getPath

  /** Read data files (absolute paths, PHYSICAL schema) with their
    * DELETION VECTORS applied — the one read primitive every rewrite
    * (merge, copy-on-write delete, compaction) must use on a DV'd
    * table: a raw parquet read would RESURRECT masked rows into the
    * rewrite. `dvByNormPath` maps canonical file path → absolute
    * sidecar path; files without an entry read mask-free, and an empty
    * map is the untouched legacy path (no metadata columns, no UDF).
    * The mask itself is a per-row sorted-array membership test against
    * the executor-cached sidecar — no join, no shuffle.
    */
  /** Per-row sidecar-membership predicate — the ONE mask evaluation
    * both rewrite-read shapes share.
    */
  private def dvMaskUdf(s: SparkSession,
      dvByNormPath: Map[String, String])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val cnf = new org.apache.spark.util.SerializableConfiguration(
      s.sessionState.newHadoopConf())
    udf { (file: String, pos: Long) =>
      dvByNormPath.get(normPath(file)) match {
        case Some(sidecar) =>
          java.util.Arrays.binarySearch(
            GraftLog.DvSidecarCache.get(cnf.value, sidecar), pos) >= 0
        case None => false
      }
    }
  }

  private[sources] def maskedParquet(s: SparkSession,
      physSchema: StructType, files: Seq[String],
      dvByNormPath: Map[String, String]): DataFrame = {
    val raw = s.read.schema(physSchema).parquet(files: _*)
    if (dvByNormPath.isEmpty) raw
    else {
      val masked = dvMaskUdf(s, dvByNormPath)
      val physCols = physSchema.fieldNames.map(col).toSeq
      raw.filter(!masked(col("_metadata.file_path"),
          col("_metadata.row_index")))
        .select(physCols: _*)
    }
  }

  /** Absolute-sidecar map for a snapshot's deletion vectors, keyed on
    * canonical file paths — what [[maskedParquet]] consumes.
    */
  private def dvPathMap(root: String,
      dvs: Map[String, GraftLog.DvDescriptor]): Map[String, String] =
    dvs.map { case (f, d) =>
      normPath(s"$root/$f") -> s"$root/${d.dv}" }

  /** Positional rename between the logical and physical schema forms
    * at EVERY nesting level: the two differ only in field names, so a
    * struct cast renames nested fields without touching values (a
    * plain `toDF` renames top-level only, which would write a nested
    * rename's files under LOGICAL inner names). Identity-mapped
    * tables hit the no-cast fast path column-for-column.
    */
  private def renameTo(df: DataFrame, target: StructType): DataFrame =
    df.select(df.schema.fields.zip(target.fields).map { case (s0, t) =>
      (if (s0.dataType == t.dataType) col(s0.name)
       else col(s0.name).cast(t.dataType)).as(t.name)
    }.toIndexedSeq: _*)

  /** A merge key column as a double for range bucketing — only types
    * whose order survives the cast (the bucket BOUNDS stay exact
    * per-bucket min/max of the original values, so the cast is pure
    * binning, never truth).
    */
  private def asDoubleExpr(k: String, dt: DataType): Option[Column] =
    dt match {
      case LongType | IntegerType | ShortType | ByteType |
           DoubleType | FloatType | _: DecimalType =>
        Some(col(k).cast("double"))
      case DateType      => Some(unix_date(col(k)).cast("double"))
      case TimestampType => Some(unix_micros(col(k)).cast("double"))
      case _             => None
    }

  /** The source's key profile for ONE merge key, as a data-source
    * Filter the per-file stats skip evaluates: the exact distinct
    * values when ≤ [[MaxInlineKeys]] (an In — per-file pruning is then
    * exact); otherwise ≤ [[RangeBuckets]] range buckets each carrying
    * the exact min/max of the source keys inside it (orderable types),
    * or the single global [min, max] as the last resort. None = the
    * source has NO non-null value for this key — an equi-match is
    * impossible, so no file is a candidate. All work here reads the
    * (cached) SOURCE only — zero table data I/O.
    */
  private[sources] def sourceKeyFilter(src: DataFrame, k: String,
      dt: DataType): Option[Filter] = {
    val nonNull = src.filter(col(k).isNotNull)
    val vals = nonNull.select(col(k)).distinct()
      .limit(MaxInlineKeys + 1).collect().map(_.get(0))
    if (vals.isEmpty) return None
    if (vals.length <= MaxInlineKeys)
      return Some(In(k, vals.asInstanceOf[Array[Any]]))
    asDoubleExpr(k, dt) match {
      case Some(kd) =>
        val d = nonNull.select(col(k).as("kv"), kd.as("kd"))
        val g = d.agg(min(col("kd")), max(col("kd"))).head()
        val lo = g.getDouble(0); val hi = g.getDouble(1)
        val width =
          math.max((hi - lo) / RangeBuckets, java.lang.Double.MIN_VALUE)
        val buckets = d.groupBy(
            least(floor((col("kd") - lit(lo)) / lit(width)),
              lit(RangeBuckets - 1)).as("b"))
          .agg(min(col("kv")).as("blo"), max(col("kv")).as("bhi"))
          .collect()
        Some(buckets.map(r => And(GreaterThanOrEqual(k, r.get(1)),
            LessThanOrEqual(k, r.get(2))): Filter)
          .reduce(Or(_, _)))
      case None => // unorderable-for-binning: global bounds
        val g = nonNull.agg(min(col(k)), max(col(k))).head()
        Some(And(GreaterThanOrEqual(k, g.get(0)),
          LessThanOrEqual(k, g.get(1))))
    }
  }

  /** Per-key source profiles for all merge keys; None = some key is
    * all-null in the source, so NO source row can equi-match any table
    * row (pure-insert merge: zero candidate files, and concurrent adds
    * can never conflict).
    */
  private[graft] def sourceKeysFilters(src: DataFrame,
      schema: StructType, keys: Seq[String]): Option[Seq[Filter]] = {
    val fs = keys.map(k => sourceKeyFilter(src, k, schema(k).dataType))
    if (fs.exists(_.isEmpty)) None else Some(fs.flatten)
  }

  /** The DELETE condition as a (physical-named) data-source Filter for
    * the manifest-stats candidate prune — the same translation the
    * planner uses for pushdown, so a selective delete's touch scan
    * reads only the files whose statistics admit a match instead of
    * every live file. None = untranslatable shape (arithmetic
    * predicates, UDFs): every file stays a candidate, correctness
    * unchanged — the prune is a pure I/O saver.
    */
  private[sources] def condFilter(s: SparkSession, schema: StructType,
      cond: Column, meta: GraftLog.TableMeta): Option[Filter] =
    try {
      // the Column arrives UNRESOLVED (a bare ColumnNode tree) — run it
      // through analysis against an empty relation of the table's
      // logical schema so the translator sees the same resolved
      // catalyst shapes the planner would
      val df = s.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        schema)
      val analyzed = df.filter(cond).queryExecution.analyzed
      analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }.flatMap(org.apache.spark.sql.graft.FilterBridge.translate)
        .map { f =>
          // logical → physical per attribute, nested paths included
          // (physicalPath resolves every segment through the mapping,
          // so a leaf under a renamed struct translates too)
          val byRef = f.references
            .map(r => r -> meta.physicalPath(r)).toMap
          GraftLog.renameFilter(f, byRef)
        }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Candidate files for a condition: manifest-stats skip when the
    * condition translates; everything otherwise.
    */
  private[sources] def pruneByCond(s: SparkSession,
      entries: Seq[(String, GraftLogStats.FileEntry)],
      schema: StructType, physSchema: StructType, cond: Column,
      meta: GraftLog.TableMeta)
      : Seq[(String, GraftLogStats.FileEntry)] =
    condFilter(s, schema, cond, meta) match {
      case None => entries
      case Some(f) => entries.filter { case (_, fe) =>
        fe.stats match {
          case Some(st) => GraftLogStats.mayMatch(physSchema, st,
            fe.rows, f)
          case None => true
        }
      }
    }

  /** May this file hold rows matching the source keys? Per-key
    * conjunctive test against the file's manifest statistics —
    * stats-less entries conservatively may.
    */
  private def mayHoldKeys(schema: StructType,
      keyFilters: Option[Seq[Filter]],
      stats: Option[GraftLogStats.ColStats], rows: Option[Long])
      : Boolean =
    keyFilters match {
      case None => false
      case Some(fs) => stats match {
        case Some(st) =>
          fs.forall(f => GraftLogStats.mayMatch(schema, st, rows, f))
        case None => true
      }
    }

  /** The candidate files a merge with these keys could touch — each
    * file's own manifest interval tested against the source's key
    * profile. Exposed for GraftLogMergeSpec: a 2-key source spanning
    * the key domain must prune to exactly the 2 files holding those
    * keys, not everything between them.
    */
  private[graft] def pruneCandidates(schema: StructType,
      entries: Seq[(String, GraftLogStats.FileEntry)], src: DataFrame,
      keys: Seq[String]): Seq[(String, GraftLogStats.FileEntry)] = {
    val keyFilters = sourceKeysFilters(src, schema, keys)
    entries.filter { case (_, fe) =>
      mayHoldKeys(schema, keyFilters, fe.stats, fe.rows) }
  }

  /** Write `df` as this row-level operation's new data files — landed
    * DIRECTLY at their final write-scoped location (`data/w_<op>_<uuid>`,
    * the connector's zero-rename publication discipline: nothing
    * references them until the manifest does) — and commit them as one
    * remove+add version. Per-file statistics are read off each new
    * file's footer, so the rewritten snapshot plans from the manifest
    * exactly like any connector write. Empty part-files (a task whose
    * whole input was deleted) are dropped from the commit and disk. A
    * refused commit (conflict / pending claim) deletes the staged
    * files before rethrowing, so the optimistic retry re-plans from a
    * clean slate.
    */
  private def commitRewrite(s: SparkSession, root: String, op: String,
      df: DataFrame, schema: StructType, removes: Seq[String],
      meta: GraftLog.TableMeta,
      addConflict: Option[(Int, GraftLog.ManifestRow => Boolean)] = None,
      layoutCols: Seq[String] = Nil,
      readVersion: Option[Int] = None): Int = {
    val conf = s.sessionState.newHadoopConf()
    // files are written under PHYSICAL names (positional rename — the
    // logical/physical schemas differ only in top-level field names);
    // the manifest records the LOGICAL schema
    val physSchema = meta.physicalSchema(schema)
    val staging = s"$root/data/w_${op}_${java.util.UUID.randomUUID()}"
    renameTo(df, physSchema).write.parquet(staging)
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
          GraftLogStats.describeFile(conf, s"$staging/$n", physSchema)
        if (rows == 0L) {
          fs.delete(new Path(s"$staging/$n"), false)
          None
        } else Some(GraftLogFileCommit(s"$staging/$n", rows, bytes,
          stats))
      }
    // the rewrite lands files OUTSIDE the Hive directory layout, which
    // would erase a path-INFERRED layout for later operations — so the
    // layout this operation observed is re-recorded as a manifest row
    // (the same row catalog PARTITIONED BY writes), keeping compaction
    // grouping and catalog write defaults stable across rewrites
    val layoutRows =
      if (layoutCols.isEmpty) Nil
      else Seq(GraftLog.ManifestRow("partcols", layoutCols.mkString(",")))
    try GraftLogWrite.commitStaged(conf, root, staging, files,
      Some(schema), removes = removes, addConflict = addConflict,
      extraRows = layoutRows, readVersion = readVersion,
      op = Some(op))
    catch { case scala.util.control.NonFatal(e) =>
      fs.delete(new Path(staging), true) // never referenced — clean up
      throw e
    }
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
    * WRITE-SERIALIZABLE under concurrency: the commit refuses (and the
    * bounded retry re-plans) when a concurrent commit removed a
    * planned file OR added files whose statistics may hold the merge
    * keys — so the one-winner-per-key invariant survives concurrent
    * appends, not just concurrent rewrites. Returns the committed (or
    * current, if no-op) version.
    */
  def mergeIntoLog(s: SparkSession, root: String,
      source: DataFrame, keys: Seq[String]): Int =
    mergeIntoLog(s, root, source, keys, DeleteModeCow)

  /** [[mergeIntoLog]] with an explicit write shape: copy-on-write
    * (default — every file containing a matched key is rewritten
    * without those rows, source unioned in) or MERGE-ON-READ (the
    * matched rows are MASKED via deletion vectors and the source
    * appends as new files — write amplification ∝ source size +
    * matched positions, never the unmatched bulk of touched files;
    * the dominant cost of streaming-CDC merges at 100 TB, where a
    * 1k-row batch touching 1k files rewrites gigabytes under CoW and
    * kilobytes under MoR). Densely-matched files (≥
    * [[DvRewriteFraction]]) still rewrite; the change feed CLASSIFIES
    * the version Delta-style — masked old versions as
    * `update_preimage`, their transformed re-appends as
    * `update_postimage`, genuinely-new keys as `insert`; OPTIMIZE
    * folds the masks exactly as for MoR deletes. Same contract,
    * conflict guards and LWW semantics either way.
    */
  def mergeIntoLog(s: SparkSession, root: String,
      source: DataFrame, keys: Seq[String], mode: String): Int = {
    require(mode == DeleteModeCow || mode == DeleteModeMor,
      s"graftlog merge: unknown mode '$mode' — use $DeleteModeCow " +
        s"or $DeleteModeMor")
    val conf = s.sessionState.newHadoopConf()
    val src = source.cache()
    try {
      val srcCount = src.count()
      withRetry { () =>
        val latest = GraftLog.latestVersion(conf, root)
        require(latest >= 1, s"no committed versions under $root")
        val meta = GraftLog.tableMeta(conf, root, latest)
        val schema = meta.schema
          .getOrElse(GraftLog.inferSchema(conf, root, latest))
        // column mapping: files + stats speak PHYSICAL names; the
        // table, source and keys speak logical — read physical, rename
        // positionally back to logical, and rename filters/keys when
        // testing stats (identity everywhere on unmapped tables).
        // DELETION VECTORS apply at the read: a raw parquet read of a
        // DV'd file would resurrect its masked rows into the rewrite.
        val physSchema = meta.physicalSchema(schema)
        val dvMap = dvPathMap(root,
          GraftLog.liveState(conf, root, latest).dvs)
        def readLogical(paths: Seq[String]): DataFrame =
          renameTo(maskedParquet(s, physSchema, paths, dvMap), schema)
        require(keys.nonEmpty && keys.forall(schema.fieldNames.contains),
          s"merge keys ${keys.mkString(", ")} not all in " +
            s"[${schema.toDDL}]")
        val incoming = GraftLog.asNullable(source.schema)
          .fields.map(f => (f.name, f.dataType)).toSeq
        val table = schema.fields.map(f => (f.name, f.dataType)).toSeq
        require(incoming == table,
          s"merge source schema [${source.schema.toDDL}] must match " +
            s"the table schema [${schema.toDDL}] (names and types, in " +
            "order)")
        if (srcCount == 0) latest // no-op: nothing matched or inserted
        else {
          require(
            src.select(keys.map(col): _*).distinct().count() == srcCount,
            "merge source keys must be unique (one LWW winner per key)")
          val entries = statsEntries(s, root, latest)
          // 1. catalog prune: each file's interval vs the source's key
          //    profile (exact keys or per-bucket bounds) — zero data I/O
          val keyFilters = sourceKeysFilters(src, schema, keys)
            .map(_.map(f => GraftLog.renameFilter(f, meta.colMap)))
          val candidates = entries.filter { case (_, fe) =>
            mayHoldKeys(physSchema, keyFilters, fe.stats, fe.rows) }
          val addConflict = Some((latest, (r: GraftLog.ManifestRow) =>
            !r.rows.contains(0L) && mayHoldKeys(physSchema, keyFilters,
              r.stats.flatMap(GraftLogStats.parseStats), r.rows)))
          val layout = layoutPartCols(conf, root, latest,
            entries.map(_._1), meta)
          val cols = schema.fieldNames.map(col).toSeq
          if (mode == DeleteModeMor && candidates.nonEmpty)
            morMerge(s, root, latest, meta, schema, physSchema, src,
              keys, candidates, addConflict, layout)
          else {
          // 2. exact touched files: distinct file names, never row data
          val touched: Seq[String] =
            if (candidates.isEmpty) Seq.empty
            else toRelPaths(root,
              readLogical(candidates.map(c => s"$root/${c._1}"))
                .withColumn("_graft_file", input_file_name())
                .join(src.select(keys.map(col): _*), keys, "left_semi")
                .select("_graft_file").distinct()
                .collect().map(_.getString(0)).toSeq,
              candidates.map(_._1))
          // 3. rewrite: unmatched rows of touched files + whole source
          val rewritten =
            if (touched.isEmpty) src.select(cols: _*)
            else readLogical(touched.map(f => s"$root/$f"))
              .select(cols: _*)
              .join(src.select(keys.map(col): _*), keys, "left_anti")
              .unionByName(src.select(cols: _*))
          // 4. one remove+add commit, add-conflict-guarded: adds
          //    committed after `latest` whose stats may hold our keys
          //    refuse → the retry re-plans with those files included
          commitRewrite(s, root, "merge", rewritten, schema, touched,
            meta,
            addConflict = addConflict,
            layoutCols = layout,
            readVersion = Some(latest))
          }
        }
      }
    } finally src.unpersist()
  }

  /** Row-level DELETE on the log: rewrite ONLY the files containing
    * rows matching `cond` (SQL DELETE semantics — a NULL condition
    * keeps the row), committed as one remove+add version. Touch
    * detection is one distributed filtered scan collecting DISTINCT
    * FILE NAMES (parquet row-group pruning applies, so a selective
    * condition over a clustered table reads little); the rewrite reads
    * only the touched files. A delete that matches nothing commits
    * nothing; a lost write-write race re-plans and retries (concurrent
    * APPENDS need no check: delete-then-append is a valid serial
    * order, so appended rows correctly survive). Returns the committed
    * (or current) version.
    */
  def deleteFromLog(s: SparkSession, root: String, cond: Column): Int =
    deleteFromLog(s, root, cond, DeleteModeCow)

  /** DELETE mode names: copy-on-write rewrites every touched file
    * without the matched rows (best when deletes are dense — the
    * rewrite was going to touch most bytes anyway); merge-on-read
    * commits DELETION VECTORS instead (best for SCATTERED deletes —
    * a 1-row delete at 100 TB becomes a KB sidecar + one manifest row,
    * not a full file rewrite). The SQL front door
    * (`DELETE FROM graft.t WHERE ...`) picks via the session conf
    * `spark.graft.log.delete.mode`.
    */
  val DeleteModeCow = "copy-on-write"
  val DeleteModeMor = "merge-on-read"
  val DeleteModeConf = "spark.graft.log.delete.mode"

  /** Per-file density cutoff for merge-on-read: a file losing at least
    * this fraction of its rows is REWRITTEN instead of masked — the
    * read-side masking tax (row reader + per-row membership) isn't
    * worth it when most of the file is dead, and the rewrite was
    * going to read every surviving byte anyway. The same commit may
    * mix both shapes: dv rows for sparse files, remove+add for dense.
    */
  val DvRewriteFraction = 0.5

  /** Row-level DELETE on the log: rewrite or mask ONLY the files
    * containing rows matching `cond` (SQL DELETE semantics — a NULL
    * condition keeps the row), committed as one version. Touch
    * detection is one distributed filtered scan collecting DISTINCT
    * FILE NAMES (parquet row-group pruning applies); `mode` picks the
    * write shape per [[DeleteModeCow]]/[[DeleteModeMor]]. A delete
    * matching nothing commits nothing; a lost race re-plans and
    * retries (concurrent APPENDS need no check: delete-then-append is
    * a valid serial order). Returns the committed (or current)
    * version.
    */
  def deleteFromLog(s: SparkSession, root: String, cond: Column,
      mode: String): Int = mode match {
    case DeleteModeCow => cowDelete(s, root, cond)
    case DeleteModeMor => morDelete(s, root, cond)
    case other => throw new IllegalArgumentException(
      s"graftlog delete: unknown mode '$other' — use $DeleteModeCow " +
        s"or $DeleteModeMor")
  }

  /** Row-level UPDATE on the log: every row matching `cond` gets the
    * `assignments` applied (each value expression may reference the
    * row's own columns; SQL semantics — a NULL condition leaves the
    * row untouched), committed as one version. The utility twin of
    * SQL `UPDATE graft.t SET ...` for option-path tables, with the
    * same write-shape choice as DELETE/MERGE: copy-on-write rewrites
    * every touched file; merge-on-read MASKS the matched old versions
    * via deletion vectors and appends the transformed rows — write
    * amplification ∝ matched rows, the scattered-update shape. Returns
    * the committed (or current) version.
    */
  def updateLog(s: SparkSession, root: String, cond: Column,
      assignments: Map[String, Column],
      mode: String = DeleteModeCow): Int = {
    require(assignments.nonEmpty, "graftlog update: no assignments")
    mode match {
      case DeleteModeCow => cowUpdate(s, root, cond, assignments)
      case DeleteModeMor => morUpdate(s, root, cond, assignments)
      case other => throw new IllegalArgumentException(
        s"graftlog update: unknown mode '$other' — use $DeleteModeCow " +
          s"or $DeleteModeMor")
    }
  }

  /** Apply `assignments` to every column of `schema`, unconditionally
    * (the caller has already filtered to matched rows) — values cast
    * to the column's type, untouched columns pass through.
    */
  private def applyAssignments(schema: StructType,
      assignments: Map[String, Column]): Seq[Column] = {
    val missing = assignments.keys.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty,
      s"graftlog update: assignment column(s) ${missing.mkString(", ")} " +
        s"not in the table schema [${schema.toDDL}]")
    schema.fields.toSeq.map { f =>
      assignments.get(f.name) match {
        case Some(v) => v.cast(f.dataType).as(f.name)
        case None    => col(f.name)
      }
    }
  }

  private def cowUpdate(s: SparkSession, root: String, cond: Column,
      assignments: Map[String, Column]): Int = {
    val conf = s.sessionState.newHadoopConf()
    withRetry { () =>
      val latest = GraftLog.latestVersion(conf, root)
      require(latest >= 1, s"no committed versions under $root")
      val meta = GraftLog.tableMeta(conf, root, latest)
      val schema = meta.schema
        .getOrElse(GraftLog.inferSchema(conf, root, latest))
      val physSchema = meta.physicalSchema(schema)
      val dvMap = dvPathMap(root,
        GraftLog.liveState(conf, root, latest).dvs)
      def readLogical(paths: Seq[String]): DataFrame =
        renameTo(maskedParquet(s, physSchema, paths, dvMap), schema)
      val entries = statsEntries(s, root, latest)
      val candidates = pruneByCond(s, entries, schema, physSchema,
        cond, meta)
      if (candidates.isEmpty) latest
      else {
        val touched = toRelPaths(root,
          readLogical(candidates.map(e => s"$root/${e._1}"))
            .withColumn("_graft_file", input_file_name())
            .filter(cond)
            .select("_graft_file").distinct()
            .collect().map(_.getString(0)).toSeq,
          candidates.map(_._1))
        if (touched.isEmpty) latest // no-op: nothing matched
        else {
          // matched rows transform, unmatched pass through — one
          // conditional projection over exactly the touched files
          val matchedCond = coalesce(cond, lit(false))
          val rewritten = readLogical(touched.map(f => s"$root/$f"))
            .select(schema.fields.toSeq.map { f =>
              assignments.get(f.name) match {
                case Some(v) => when(matchedCond,
                  v.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
                case None => col(f.name)
              }
            }: _*)
          commitRewrite(s, root, "update", rewritten, schema, touched,
            meta,
            layoutCols = layoutPartCols(conf, root, latest,
              entries.map(_._1), meta),
            readVersion = Some(latest))
        }
      }
    }
  }

  private def morUpdate(s: SparkSession, root: String, cond: Column,
      assignments: Map[String, Column]): Int = {
    val conf = s.sessionState.newHadoopConf()
    val fs = new Path(root).getFileSystem(conf)
    withRetry { () =>
      val latest = GraftLog.latestVersion(conf, root)
      require(latest >= 1, s"no committed versions under $root")
      val meta = GraftLog.tableMeta(conf, root, latest)
      val schema = meta.schema
        .getOrElse(GraftLog.inferSchema(conf, root, latest))
      val physSchema = meta.physicalSchema(schema)
      val dvs = GraftLog.liveState(conf, root, latest).dvs
      val allEntries = statsEntries(s, root, latest)
      val entries = pruneByCond(s, allEntries, schema, physSchema,
        cond, meta)
      if (entries.isEmpty) return latest
      val rowsByRel = entries.map(e => (e._1, e._2.rows.get)).toMap
      val relByNorm = entries.map(e =>
        (normPath(s"$root/${e._1}"), e._1)).toMap
      // matched rows WITH positions, prior masks EXCLUDED at the read:
      // unlike the delete (where re-deleting a masked row is a no-op),
      // the update APPENDS a transformed copy — transforming an
      // already-deleted row would resurrect it
      val matched = maskedParquetWithPos(s, physSchema, schema,
          entries.map(e => s"$root/${e._1}"), dvPathMap(root, dvs))
        .filter(cond)
        .cache()
      try {
        val counts = matched.groupBy("_g_file").count().collect()
          .flatMap(r => relByNorm.get(normPath(r.getString(0)))
            .map(rel => (rel, r.getLong(1))))
        if (counts.isEmpty) return latest // no-op: nothing matched
        val (denseRel, sparseRel) = counts.partition { case (rel, c) =>
          c >= (rowsByRel(rel) * DvRewriteFraction).ceil.toLong }
        val staging =
          s"$root/data/w_update_${java.util.UUID.randomUUID()}"
        val dvBase = s"$staging/dv"
        // the change feed CLASSIFIES this commit only when the whole
        // matched set is sparse (same rule as MERGE): a dense file's
        // copy-on-write removes surface as plain deletes, so tagging
        // postimages beside them would leave the counts inconsistent
        val classify = denseRel.isEmpty
        // the whole write sequence — sidecars included — sits inside
        // the cleanup try: a Spark job failure in the SIDECAR write
        // must delete the staging tree like every other abort path
        try {
          val (dvRows, dvFiles) = writeDvSidecars(s, conf, root, dvBase,
            matched.select(col("_g_file"), col("_g_pos")),
            sparseRel.map(_._1).toSeq, dvs, relByNorm,
            cdcClass = if (classify) Some("update_preimage") else None)
          val cols = schema.fieldNames.map(col).toSeq
          // ALL matched rows (sparse-masked and dense-removed alike)
          // re-enter transformed as new files — change-feed-classified
          // as postimages (their masked old versions being the
          // preimages) when the commit classifies at all
          val transformed = matched
            .select(applyAssignments(schema, assignments): _*)
          var adds = stageFiles(s, conf, transformed, physSchema,
            staging, "upd",
            cdcClass = if (classify) Some("update_postimage") else None)
          if (denseRel.nonEmpty) {
            val denseFiles = denseRel.map(e => s"$root/${e._1}").toSeq
            val kept = renameTo(maskedParquet(s, physSchema, denseFiles,
                dvPathMap(root, dvs)), schema)
              .select(cols: _*)
              .filter(coalesce(cond, lit(false)) === false)
            adds ++= stageFiles(s, conf, kept, physSchema, staging,
              "dense")
          }
          val layout = layoutPartCols(conf, root, latest,
            allEntries.map(_._1), meta)
          GraftLogWrite.commitStaged(conf, root, staging, adds,
            Some(schema), removes = denseRel.map(_._1).toSeq,
            extraRows =
              (if (layout.isEmpty) Nil
               else Seq(GraftLog.ManifestRow("partcols",
                 layout.mkString(",")))) ++ dvRows,
            dvFiles = dvFiles, readVersion = Some(latest),
            op = Some("update"))
        } catch { case scala.util.control.NonFatal(e) =>
          fs.delete(new Path(staging), true)
          throw e
        }
      } finally matched.unpersist()
    }
  }

  /** Masked read WITH file/position columns (`_g_file`, `_g_pos`) and
    * the LOGICAL column names — the matched-row source for
    * merge-on-read operations that re-emit rows (update) and so must
    * never see an already-masked one.
    */
  private def maskedParquetWithPos(s: SparkSession,
      physSchema: StructType, schema: StructType, files: Seq[String],
      dvByNormPath: Map[String, String]): DataFrame = {
    val logicalCols = physSchema.fields.zip(schema.fields)
      .map { case (p, l) =>
        (if (p.dataType == l.dataType) col(p.name)
         else col(p.name).cast(l.dataType)).as(l.name) }.toSeq
    val raw = s.read.schema(physSchema).parquet(files: _*)
      .select(Seq(col("_metadata.file_path").as("_g_file"),
        col("_metadata.row_index").as("_g_pos")) ++ logicalCols: _*)
    if (dvByNormPath.isEmpty) raw
    else {
      val masked = dvMaskUdf(s, dvByNormPath)
      raw.filter(!masked(col("_g_file"), col("_g_pos")))
    }
  }

  private def cowDelete(s: SparkSession, root: String,
      cond: Column): Int = {
    val conf = s.sessionState.newHadoopConf()
    withRetry { () =>
      val latest = GraftLog.latestVersion(conf, root)
      require(latest >= 1, s"no committed versions under $root")
      val meta = GraftLog.tableMeta(conf, root, latest)
      val schema = meta.schema
        .getOrElse(GraftLog.inferSchema(conf, root, latest))
      val physSchema = meta.physicalSchema(schema)
      val dvMap = dvPathMap(root,
        GraftLog.liveState(conf, root, latest).dvs)
      def readLogical(paths: Seq[String]): DataFrame =
        renameTo(maskedParquet(s, physSchema, paths, dvMap), schema)
      val entries = statsEntries(s, root, latest)
      // catalog prune: each file's manifest interval vs the condition
      // (zero data I/O) — the touch scan then reads candidates only
      val candidates = pruneByCond(s, entries, schema, physSchema, cond, meta)
      if (candidates.isEmpty) latest
      else {
        val touched = toRelPaths(root,
          readLogical(candidates.map(e => s"$root/${e._1}"))
            .withColumn("_graft_file", input_file_name())
            .filter(cond)
            .select("_graft_file").distinct()
            .collect().map(_.getString(0)).toSeq,
          candidates.map(_._1))
        if (touched.isEmpty) latest // no-op: nothing matched
        else {
          val cols = schema.fieldNames.map(col).toSeq
          val kept = readLogical(touched.map(f => s"$root/$f"))
            .select(cols: _*)
            .filter(coalesce(cond, lit(false)) === false)
          commitRewrite(s, root, "delete", kept, schema, touched, meta,
            layoutCols = layoutPartCols(conf, root, latest,
              entries.map(_._1), meta),
            readVersion = Some(latest))
        }
      }
    }
  }

  /** Merge-on-read DELETE: commit a DELETION-VECTOR sidecar per
    * sparsely-touched file (complete mask + this commit's delta) and
    * rewrite only the densely-touched ones ([[DvRewriteFraction]]) —
    * write amplification proportional to MATCHED rows, not touched
    * FILES. The scale shape:
    *
    *  1. one distributed scan over the candidate files computes
    *     matched (file, row position) pairs via the parquet reader's
    *     own `_metadata.row_index` — positions never reach the driver;
    *  2. per-file matched COUNTS (one row per file) come back to pick
    *     dense files for rewrite;
    *  3. executors write one sidecar pair per sparse file
    *     (prior mask ∪ matches, matches \ prior) under a write-scoped
    *     `data/dv_<uuid>/` directory — the same zero-rename
    *     publication data files use: nothing references the sidecars
    *     until the manifest row does;
    *  4. ONE commit: `dv` rows for sparse files, remove+add for dense
    *     ones, guarded by liveness AND dv-conflict revalidation (a
    *     concurrent re-mask of the same file refuses — complete-mask
    *     replacement semantics would otherwise lose its deletions).
    *
    * The change feed emits the delta positions as delete rows; time
    * travel before the commit reads the file unmasked; OPTIMIZE folds
    * the vectors away (the DV'd file compacts, its mask dies with the
    * remove). Both reader paths mask — the vectorized reader compacts
    * survivors while the batch fills (≈7% full-scan tax, measured),
    * so OPTIMIZE's fold is a compaction decision, not a read rescue.
    */
  /** The merge-on-read MERGE body (one optimistic attempt — the caller
    * holds the retry loop and the cached source): matched table rows
    * are MASKED via deletion vectors, the whole source appends as new
    * files, densely-matched files rewrite, all in ONE guarded commit.
    */
  private def morMerge(s: SparkSession, root: String, latest: Int,
      meta: GraftLog.TableMeta, schema: StructType,
      physSchema: StructType, src: DataFrame, keys: Seq[String],
      candidates: Seq[(String, GraftLogStats.FileEntry)],
      addConflict: Option[(Int, GraftLog.ManifestRow => Boolean)],
      layout: Seq[String]): Int = {
    val conf = s.sessionState.newHadoopConf()
    val fs = new Path(root).getFileSystem(conf)
    val dvs = GraftLog.liveState(conf, root, latest).dvs
    val cols = schema.fieldNames.map(col).toSeq
    val rowsByRel = candidates.map(e => (e._1, e._2.rows.get)).toMap
    val relByNorm = candidates.map(e =>
      (normPath(s"$root/${e._1}"), e._1)).toMap
    // matched (file, position) pairs: RAW candidate read (empty dv map
    // — already-masked rows re-matching is harmless: prior-union
    // dedups, delta excludes them) semi-joined on the merge keys. The
    // positional-CAST rename keeps nested logical names resolvable
    // under column mapping, same as every other DML read.
    // MASKED read (prior deletion vectors excluded): a key whose only
    // table occurrences are already-deleted rows must classify as a
    // plain INSERT in the change feed, not as an update with no
    // preimage — and the density decision should count LIVE rows.
    // (writeDvSidecars still unions the prior mask into each complete
    // sidecar, so excluding masked positions here loses nothing.)
    // Keys ride along so the classification below can split the source
    // into updates vs inserts without a second candidate scan.
    val matched = maskedParquetWithPos(s, physSchema, schema,
        candidates.map(c => s"$root/${c._1}"), dvPathMap(root, dvs))
      .join(src.select(keys.map(col): _*), keys, "left_semi")
      .select(Seq(col("_g_file"), col("_g_pos")) ++ keys.map(col): _*)
      .cache()
    try {
      val counts = matched.groupBy("_g_file").count().collect()
        .flatMap(r => relByNorm.get(normPath(r.getString(0)))
          .map(rel => (rel, r.getLong(1))))
      val (denseRel, sparseRel) = counts.partition { case (rel, c) =>
        c >= (rowsByRel(rel) * DvRewriteFraction).ceil.toLong }
      val staging = s"$root/data/w_merge_${java.util.UUID.randomUUID()}"
      val dvBase = s"$staging/dv"
      // sidecar write inside the cleanup try: a failed sidecar job
      // deletes the staging tree like every other abort path
      // the change feed CLASSIFIES this commit only when the whole
      // matched set is sparse: a densely-matched file rewrites
      // copy-on-write, whose removes surface as plain delete rows —
      // tagging postimages beside them would leave preimage/postimage
      // counts inconsistent. All-sparse commits (the MoR shape this
      // mode exists for) classify exactly; mixed commits fall back to
      // the plain delete/insert feed wholesale.
      val classify = denseRel.isEmpty
      try {
        val (dvRows, dvFiles) = writeDvSidecars(s, conf, root, dvBase,
          matched.select(col("_g_file"), col("_g_pos")),
          sparseRel.map(_._1).toSeq, dvs, relByNorm,
          cdcClass = if (classify) Some("update_preimage") else None)
        // the source appends as new files — every insert AND every
        // update's new version; updates' OLD versions are masked (dv)
        // or dropped by the dense rewrite. Under classification the
        // stage SPLITS by match so the feed tags updates' new versions
        // as postimages and genuinely-new keys as inserts (matchedKeys
        // is bounded by the source's key cardinality and folds off the
        // cache; the source itself is caller-cached)
        var adds =
          if (!classify)
            stageFiles(s, conf, src.select(cols: _*), physSchema,
              staging, "src")
          else {
            val matchedKeys = matched.select(keys.map(col): _*)
              .distinct()
            stageFiles(s, conf,
              src.join(matchedKeys, keys, "left_semi").select(cols: _*),
              physSchema, staging, "srcu",
              cdcClass = Some("update_postimage")) ++
            stageFiles(s, conf,
              src.join(matchedKeys, keys, "left_anti").select(cols: _*),
              physSchema, staging, "srci")
          }
        if (denseRel.nonEmpty) {
          val denseFiles = denseRel.map(e => s"$root/${e._1}").toSeq
          val kept = renameTo(maskedParquet(s, physSchema, denseFiles,
              dvPathMap(root, dvs)), schema)
            .select(cols: _*)
            .join(src.select(keys.map(col): _*), keys, "left_anti")
          adds ++= stageFiles(s, conf, kept, physSchema, staging,
            "dense")
        }
        GraftLogWrite.commitStaged(conf, root, staging, adds,
          Some(schema), removes = denseRel.map(_._1).toSeq,
          extraRows =
            (if (layout.isEmpty) Nil
             else Seq(GraftLog.ManifestRow("partcols",
               layout.mkString(",")))) ++ dvRows,
          dvFiles = dvFiles, addConflict = addConflict,
          readVersion = Some(latest), op = Some("merge"))
      } catch { case scala.util.control.NonFatal(e) =>
        fs.delete(new Path(staging), true) // sidecars live under it too
        throw e
      }
    } finally matched.unpersist()
  }

  /** The deletion-vector WRITE job, shared by merge-on-read DELETE and
    * MERGE: one sidecar pair (complete mask ∪ prior, this-commit
    * delta) per sparse file, written by EXECUTORS under the
    * write-scoped `dvBase` directory — positions never reach the
    * driver; the returned manifest rows (and the dv-file list the
    * commit revalidates) are one small row per file. Files whose every
    * matched position was already masked are no-ops: their sidecars
    * are deleted and no row is returned.
    */
  private def writeDvSidecars(s: SparkSession, conf: Configuration,
      root: String, dvBase: String, matched: DataFrame,
      sparseRels: Seq[String],
      dvs: Map[String, GraftLog.DvDescriptor],
      relByNorm: Map[String, String],
      cdcClass: Option[String] = None)
      : (Seq[GraftLog.ManifestRow], Seq[String]) = {
    if (sparseRels.isEmpty) return (Nil, Nil)
    val fs = new Path(root).getFileSystem(conf)
    val cnf = new org.apache.spark.util.SerializableConfiguration(conf)
    val priorByNorm: Map[String, String] = sparseRels.flatMap { rel =>
      dvs.get(rel).map(d =>
        (normPath(s"$root/$rel"), s"$root/${d.dv}")) }.toMap
    val sparseNorm = sparseRels.map(r => normPath(s"$root/$r")).toSet
    import s.implicits._
    val dvMetaRaw: Array[(String, String, Long, String, Long)] =
      matched.as[(String, Long)]
        .filter(r => sparseNorm.contains(normPath(r._1)))
        .groupByKey(r => normPath(r._1))
        .mapGroups { (fnorm, it) =>
          val hit = it.map(_._2).toArray
          java.util.Arrays.sort(hit)
          val prior = priorByNorm.get(fnorm)
            .map(p => GraftLog.DvSidecarCache.get(cnf.value, p))
            .getOrElse(Array.empty[Long])
          val priorSet = prior.toSet
          val delta = hit.filterNot(priorSet.contains).distinct
          val complete = (prior ++ delta).distinct
          java.util.Arrays.sort(complete)
          val tag = java.security.MessageDigest.getInstance("SHA-1")
            .digest(fnorm.getBytes("UTF-8"))
            .take(8).map("%02x".format(_)).mkString
          // ATTEMPT-unique names: a retried or speculative task must
          // never collide with a dead twin's put-if-absent create —
          // only the winning attempt's metadata rows reach the driver
          // (Spark task-commit semantics), so loser files are simply
          // never referenced (and die with the staging dir on abort)
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId().toString).getOrElse("0")
          val dvPath = s"$dvBase/$tag-a$attempt.dv"
          val deltaPath = s"$dvBase/$tag-a$attempt.delta.dv"
          GraftLog.writeDv(cnf.value, new Path(dvPath), complete)
          GraftLog.writeDv(cnf.value, new Path(deltaPath), delta)
          (fnorm, dvPath, complete.length.toLong, deltaPath,
            delta.length.toLong)
        }.collect()
    // LOSER task attempts (retried or speculative) wrote attempt-named
    // sidecars that no collected row references — and dvBase can be a
    // PERMANENT directory (morDelete's data/dv_<uuid>). Sweep now:
    // keep the winning attempts' files, delete the rest. Best-effort
    // (a zombie attempt may still be writing AFTER this listing — its
    // debris is then caught by VACUUM's age-guarded orphan sweep);
    // one listing RPC.
    val winning = dvMetaRaw.iterator
      .flatMap(m => Iterator(m._2, m._4))
      .map(p => new Path(p).getName).toSet
    val basePath = new Path(dvBase)
    if (fs.exists(basePath))
      fs.listStatus(basePath).foreach { st =>
        if (!winning.contains(st.getPath.getName))
          fs.delete(st.getPath, false)
      }
    // files whose every match was already masked are no-ops — their
    // just-written sidecars are unreferenced garbage, clean them now
    val (dvMeta, noop) = dvMetaRaw.partition(_._5 > 0L)
    noop.foreach { case (_, dv, _, delta, _) =>
      fs.delete(new Path(dv), false)
      fs.delete(new Path(delta), false)
    }
    val rows = dvMeta.toSeq.sortBy(_._1).map {
      case (fnorm, dv, card, delta, dcard) =>
        GraftLog.ManifestRow("dv", relByNorm(fnorm),
          stats = Some(GraftLog.encodeDv(GraftLog.DvDescriptor(
            dv.stripPrefix(s"$root/"), card,
            delta.stripPrefix(s"$root/"), dcard, cdcClass))))
    }
    (rows, dvMeta.map(m => relByNorm(m._1)).toSeq)
  }

  /** Stage a DataFrame's rows as committed-shape part-files under
    * `staging/<sub>` and describe each (the add-row payloads) —
    * shared by every rewrite that lands files outside the writer
    * factory path.
    */
  private def stageFiles(s: SparkSession, conf: Configuration,
      df: DataFrame, physSchema: StructType, staging: String,
      sub: String, cdcClass: Option[String] = None)
      : Seq[GraftLogFileCommit] = {
    val fs = new Path(staging).getFileSystem(conf)
    val dir = s"$staging/$sub"
    renameTo(df, physSchema).write.parquet(dir)
    fs.delete(new Path(s"$dir/_SUCCESS"), false)
    fs.listStatus(new Path(dir))
      .toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") &&
        !n.startsWith("_") && !n.startsWith("."))
      .sorted
      .flatMap { n =>
        val (rows, bytes, st) = GraftLogStats.describeFile(
          conf, s"$dir/$n", physSchema)
        if (rows == 0L) {
          fs.delete(new Path(s"$dir/$n"), false); None
        } else {
          // the CHANGE-FEED class rides in the stats JSON ("cdc" key):
          // a MoR update/merge tags its transformed-row files
          // update_postimage so the feed can tell moves from inserts
          val tagged = cdcClass match {
            case None => st
            case Some(c) =>
              import org.json4s._
              import org.json4s.jackson.JsonMethods
              val base = st.map(JsonMethods.parse(_))
                .getOrElse(JObject())
              Some(JsonMethods.compact(JsonMethods.render(
                base.merge(JObject("cdc" -> JString(c))))))
          }
          Some(GraftLogFileCommit(s"$dir/$n", rows, bytes, tagged))
        }
      }
  }

  private def morDelete(s: SparkSession, root: String,
      cond: Column): Int = {
    val conf = s.sessionState.newHadoopConf()
    val fs = new Path(root).getFileSystem(conf)
    withRetry { () =>
      val latest = GraftLog.latestVersion(conf, root)
      require(latest >= 1, s"no committed versions under $root")
      val meta = GraftLog.tableMeta(conf, root, latest)
      val schema = meta.schema
        .getOrElse(GraftLog.inferSchema(conf, root, latest))
      val physSchema = meta.physicalSchema(schema)
      val dvs = GraftLog.liveState(conf, root, latest).dvs
      val allEntries = statsEntries(s, root, latest)
      // catalog prune (zero data I/O): only files whose statistics
      // admit a match are scanned for positions
      val entries = pruneByCond(s, allEntries, schema, physSchema, cond, meta)
      if (entries.isEmpty) return latest
      val rowsByRel = entries.map(e => (e._1, e._2.rows.get)).toMap
      val relByNorm = entries.map(e =>
        (normPath(s"$root/${e._1}"), e._1)).toMap
      // matched (file, position) pairs over the RAW files (empty dv
      // map: prior masks subtract executor-side at sidecar build, so a
      // re-matched already-deleted row never reaches the delta). The
      // positional-cast read keeps NESTED logical names resolvable
      // under column mapping, same as every other DML read.
      // cached: the matched set feeds BOTH the density decision and
      // the sidecar job — uncached, the candidate files scan twice
      val matched = maskedParquetWithPos(s, physSchema, schema,
          entries.map(e => s"$root/${e._1}"), Map.empty)
        .filter(cond)
        .select(col("_g_file"), col("_g_pos"))
        .cache()
      try {
      val counts = matched.groupBy("_g_file").count().collect()
        .flatMap(r => relByNorm.get(normPath(r.getString(0)))
          .map(rel => (rel, r.getLong(1))))
      if (counts.isEmpty) return latest // no-op: nothing matched
      val (denseRel, sparseRel) = counts.partition { case (rel, c) =>
        c >= (rowsByRel(rel) * DvRewriteFraction).ceil.toLong }
      val dvBase = s"$root/data/dv_${java.util.UUID.randomUUID()}"
      // layout inference must see the FULL live set, not the pruned
      // candidates — a biased subset could claim a layout the table
      // doesn't uniformly have
      val layout = layoutPartCols(conf, root, latest,
        allEntries.map(_._1), meta)
      val layoutRows =
        if (layout.isEmpty) Nil
        else Seq(GraftLog.ManifestRow("partcols", layout.mkString(",")))
      // sidecar write inside the cleanup try: dvBase here is PERMANENT
      // (root/data/dv_<uuid>), so a failed sidecar job must delete it —
      // partial sidecars there would otherwise be garbage forever
      try {
        val (dvRows, dvFiles) = writeDvSidecars(s, conf, root, dvBase,
          matched, sparseRel.map(_._1).toSeq, dvs, relByNorm)
        if (denseRel.isEmpty) {
          if (dvRows.isEmpty) { fs.delete(new Path(dvBase), true); latest }
          else GraftLogWrite.commitStaged(conf, root,
            dvBase, Nil, Some(schema),
            extraRows = layoutRows ++ dvRows,
            dvFiles = dvFiles,
            readVersion = Some(latest), op = Some("delete"))
        } else {
          // dense files rewrite copy-on-write (masked read — prior
          // deletions stay deleted), committed TOGETHER with the dv
          // rows as one version
          val denseFiles = denseRel.map(e => s"$root/${e._1}").toSeq
          val cols = schema.fieldNames.map(col).toSeq
          val kept = renameTo(maskedParquet(s, physSchema, denseFiles,
              dvPathMap(root, dvs)), schema)
            .select(cols: _*)
            .filter(coalesce(cond, lit(false)) === false)
          val staging = s"$root/data/w_delete_${java.util.UUID
            .randomUUID()}"
          val files = stageFiles(s, conf, kept, physSchema, staging,
            "kept")
          try GraftLogWrite.commitStaged(conf, root, staging, files,
            Some(schema), removes = denseRel.map(_._1).toSeq,
            extraRows = layoutRows ++ dvRows,
            dvFiles = dvFiles,
            readVersion = Some(latest), op = Some("delete"))
          catch { case scala.util.control.NonFatal(e) =>
            fs.delete(new Path(staging), true)
            throw e
          }
        }
      } catch { case scala.util.control.NonFatal(e) =>
        // sidecars are never referenced until the manifest row lands —
        // a refused commit cleans its own staging
        fs.delete(new Path(dvBase), true)
        throw e
      }
      } finally matched.unpersist()
    }
  }

  /** The table's partition columns for LAYOUT purposes: the declared
    * catalog `PARTITIONED BY` (manifest row) when present, else
    * inferred from the live files' own Hive path segments (an
    * `option("partitionBy", ...)` table carries `k=v/` directories but
    * no declaration) — accepted only when EVERY file agrees on the
    * same segment-name sequence, so a mixed layout never pretends to
    * be partitioned. Values are never parsed from the names (they stay
    * in the files and their stats); only the column NAMES matter here.
    */
  private[sources] def layoutPartCols(conf: Configuration, root: String,
      asOf: Int, files: Seq[String],
      meta: GraftLog.TableMeta = GraftLog.TableMeta(None, Nil))
      : Seq[String] = {
    val declared = meta.partCols match {
      case Nil  => GraftLog.partColsFromManifest(conf, root, asOf)
      case cols => cols
    }
    if (declared.nonEmpty) declared
    else {
      val segNames = files.map(_.split('/').dropRight(1).toSeq
        .filter(_.indexOf('=') > 0).map(_.takeWhile(_ != '=')))
      segNames.headOption match {
        case Some(names) if names.nonEmpty &&
          segNames.forall(_ == names) =>
          // Hive segments carry PHYSICAL names (writers render them);
          // the declared/recorded form is logical — map back
          val reverse = meta.colMap.map(_.swap)
          names.map(n => reverse.getOrElse(n, n))
        case _ => Nil
      }
    }
  }

  /** Grouping key for compaction: the file's partition-value tuple read
    * from its own manifest statistics (min==max per partition column by
    * construction of partitioned writes — this holds even for files a
    * row-level rewrite landed OUTSIDE the Hive directory layout, so
    * post-DML tables still group correctly). A file whose stats show
    * mixed values for any partition column falls into one shared
    * residual group — already-wide files compact together and never
    * contaminate a single-value group. The key is a per-column token
    * SEQUENCE, never a joined string: string partition values may
    * themselves contain '=' or '/', and a joined rendering could
    * collide two different tuples into one group — mixing values in a
    * compacted file, the exact erosion this grouping exists to prevent
    * (Seq equality is element-wise, and each element's position fixes
    * its column, so tokens stay injective per column).
    */
  private[graft] def partGroupKey(partCols: Seq[String],
      fe: GraftLogStats.FileEntry): Seq[String] =
    if (partCols.isEmpty) Seq("")
    else fe.stats match {
      case None => Seq("\u0000mixed")
      case Some(st) =>
        val parts = partCols.map { c =>
          val nulls = st.nulls.getOrElse(c, 0L)
          (st.min.get(c), st.max.get(c)) match {
            case (Some(a), Some(b)) if a == b && nulls == 0L =>
              Some(s"$c=$a")
            case (None, None)
              if fe.rows.exists(r => r > 0 && nulls >= r) =>
              Some(s"$c=\u0000null") // an all-null partition value
            case _ => None
          }
        }
        if (parts.forall(_.isDefined)) parts.flatten
        else Seq("\u0000mixed")
    }

  /** First-fit size binning within one partition group: name-sorted for
    * determinism, each bin targeting `targetBytes`.
    */
  private[sources] def packBins(files: Seq[(String, Long)],
      targetBytes: Long): Seq[Seq[String]] = {
    val bins = mutable.ArrayBuffer[Seq[String]]()
    var cur = mutable.ArrayBuffer[String]()
    var curBytes = 0L
    files.sortBy(_._1).foreach { case (f, b) =>
      if (cur.nonEmpty && curBytes + b > targetBytes) {
        bins += cur.toSeq; cur = mutable.ArrayBuffer[String]()
        curBytes = 0L
      }
      cur += f; curBytes += b
    }
    if (cur.nonEmpty) bins += cur.toSeq
    bins.toSeq
  }

  /** Concurrent rewrite jobs an OPTIMIZE drives at once — bins are
    * independent single-task jobs, so this bounds driver-side job
    * bookkeeping, not executor parallelism (each job's one task still
    * lands on any free core/executor).
    */
  val CompactJobParallelism = 16

  /** OPTIMIZE (compaction) on the log — PARTITION-AWARE: small live
    * files are grouped by their partition-value tuple (from each
    * file's own manifest statistics) and binned into ~`targetBytes`
    * rewrites WITHIN each group, so a compacted file never mixes
    * partition values and every post-OPTIMIZE file keeps min==max on
    * the partition columns — the manifest-stats skip that IS this
    * connector's pruning survives compaction intact (a bucket=3 scan
    * reads exactly as few files after OPTIMIZE as before; spec-pinned).
    * Each bin is one INDEPENDENT single-task rewrite job, launched
    * [[CompactJobParallelism]]-wide from a driver pool — the standard
    * OPTIMIZE execution shape: compacting 10k small files into ~100
    * bins runs ~100 parallel one-task jobs, never one job whose
    * parallelism is capped at the output file count. `clusterBy`
    * optionally sorts within each bin to restore clustering. All bins
    * commit as ONE remove+add version — content-preserving by
    * construction, CDC-visible as delete+insert, refused by the
    * snapshot streaming tail exactly like any rewrite. Groups with
    * fewer than two small files have nothing to gain and are
    * untouched; a lost concurrency race deletes the staged files,
    * re-plans and retries. Returns the committed (or current) version.
    */
  def compactLog(s: SparkSession, root: String,
      smallBytes: Long = 32L * 1024 * 1024,
      targetBytes: Long = 128L * 1024 * 1024,
      clusterBy: Seq[String] = Nil): Int = {
    val conf = s.sessionState.newHadoopConf()
    withRetry { () =>
      val latest = GraftLog.latestVersion(conf, root)
      require(latest >= 1, s"no committed versions under $root")
      val meta = GraftLog.tableMeta(conf, root, latest)
      val schema = meta.schema
        .getOrElse(GraftLog.inferSchema(conf, root, latest))
      val physSchema = meta.physicalSchema(schema)
      val dvs = GraftLog.liveState(conf, root, latest).dvs
      val dvMap = dvPathMap(root, dvs)
      val entries = statsEntries(s, root, latest)
      val partCols = layoutPartCols(conf, root, latest,
        entries.map(_._1), meta) // logical
      val partColsPhys = partCols.map(meta.physicalName) // stats keys
      // DV'd files are candidates REGARDLESS of size: OPTIMIZE is how
      // deletion vectors fold away (the rewrite materializes the mask,
      // the remove kills the dv row, readers go vectorized again)
      val small = entries.filter(e =>
        e._2.bytes.exists(_ < smallBytes) || dvs.contains(e._1))
      val groups = small
        .groupBy { case (_, fe) => partGroupKey(partColsPhys, fe) }
        // a lone small file gains nothing — unless it carries a dv,
        // which compacting purges
        .filter(g => g._2.size >= 2 ||
          g._2.exists(e => dvs.contains(e._1)))
      if (groups.isEmpty) latest // nothing worth binning
      else {
        val bins: Seq[Seq[String]] = groups.toSeq
          .sortBy(_._1.mkString("\u0000"))
          .flatMap { case (_, fs) =>
            packBins(fs.map(f => (f._1, f._2.bytes.get)), targetBytes) }
        val physCols = physSchema.fieldNames.map(col).toSeq
        val clusterPhys = clusterBy.map(meta.physicalName)
        val staging =
          s"$root/data/w_compact_${java.util.UUID.randomUUID()}"
        val fs = new Path(root).getFileSystem(conf)
        val pool = java.util.concurrent.Executors
          .newFixedThreadPool(math.min(bins.size, CompactJobParallelism))
        try {
          val tasks = bins.zipWithIndex.map { case (b, i) =>
            pool.submit(new java.util.concurrent.Callable[Unit] {
              override def call(): Unit = {
                // pure file shuffling: read AND write physical names —
                // no logical translation needed anywhere in the rewrite
                // (deletion vectors applied at the read, so a masked
                // row never survives into the compacted file; bins
                // without a DV'd file keep the mask-free fast path)
                val binDv = dvMap.filter { case (k, _) =>
                  b.exists(f => normPath(s"$root/$f") == k) }
                val d = maskedParquet(s, physSchema,
                    b.map(f => s"$root/$f"), binDv)
                  .select(physCols: _*).coalesce(1)
                (if (clusterPhys.isEmpty) d
                 else d.sortWithinPartitions(clusterPhys.map(col): _*))
                  .write.parquet(s"$staging/bin-$i")
              }
            })
          }
          tasks.foreach(_.get()) // propagate the first failure
          val files = bins.indices.flatMap { i =>
            fs.delete(new Path(s"$staging/bin-$i/_SUCCESS"), false)
            fs.listStatus(new Path(s"$staging/bin-$i")).toSeq
              .map(_.getPath.getName)
              .filter(n => n.endsWith(".parquet") &&
                !n.startsWith("_") && !n.startsWith("."))
              .sorted
              .flatMap { n =>
                val (rows, bytes, stats) = GraftLogStats.describeFile(
                  conf, s"$staging/bin-$i/$n", physSchema)
                if (rows == 0L) {
                  fs.delete(new Path(s"$staging/bin-$i/$n"), false)
                  None
                } else Some(GraftLogFileCommit(s"$staging/bin-$i/$n",
                  rows, bytes, stats))
              }
          }
          GraftLogWrite.commitStaged(conf, root, staging, files,
            Some(schema), removes = bins.flatten,
            readVersion = Some(latest),
            op = Some("compact"),
            extraRows =
              (if (partCols.isEmpty) Nil
               else Seq(GraftLog.ManifestRow("partcols",
                 partCols.mkString(",")))) ++
              (if (meta.colMap.isEmpty && meta.tombstones.isEmpty) Nil
               else Seq(GraftLog.ManifestRow("colmap",
                 GraftLog.encodeColMap(meta.colMap, meta.tombstones)))))
        } catch { case scala.util.control.NonFatal(e) =>
          // quiesce stragglers BEFORE deleting the staging tree: a
          // plain shutdown() lets still-running bin tasks recreate
          // data/w_compact_* directories under a tree this cleanup
          // just removed, leaving orphaned part-files nothing
          // references or cleans. shutdownNow interrupts them (a
          // Spark job interrupted mid-write aborts its own tasks) and
          // the bounded await ensures none is mid-mkdir when the
          // recursive delete runs.
          pool.shutdownNow()
          pool.awaitTermination(60,
            java.util.concurrent.TimeUnit.SECONDS)
          fs.delete(new Path(staging), true) // never referenced
          throw e match {
            case ee: java.util.concurrent.ExecutionException
              if ee.getCause != null => ee.getCause
            case other => other
          }
        } finally pool.shutdown()
      }
    }
  }

  /** VACUUM: expire every version below `keepFrom` and physically
    * delete the data files no RETAINED version references. The
    * retained live sets fold from the committed manifests
    * (catalog-sized work — versions × files metadata rows, never data
    * rows); the deletable set is (files referenced by expired
    * versions) minus (files referenced by any retained one), so a file
    * shared across the boundary — the common case under compaction —
    * is NEVER deleted. The `_vacuum_v<keepFrom>` watermark marker is
    * written BEFORE the deletes (true two-phase discipline): from that
    * instant reads below the watermark refuse cleanly at load, so a
    * crash mid-delete — or a reader racing the delete window — can
    * never resolve an expired version and then FileNotFound mid-scan;
    * the files merely linger until the next (idempotent) pass finishes
    * the deletes.
    *
    * ORPHAN SWEEP (phase 3): a writer that CRASHED between staging its
    * part-files under `data/` and committing the manifest leaves a
    * write-scoped directory no version will ever reference — invisible
    * to the manifest-derived dead set above, so without this it is
    * unreclaimable garbage forever. The sweep lists `data/` once and
    * deletes any file that (a) no RETAINED version references and
    * (b) is older than `orphanAgeMs` — the age guard is what separates
    * a crashed writer's debris from an IN-FLIGHT writer's staging (the
    * same mtime-based discipline Delta's VACUUM uses for uncommitted
    * files; a writer that stages longer than the threshold would be
    * swept, hence the conservative default). Emptied staging
    * directories are removed too. Returns (filesDeleted incl. orphans,
    * filesRetained).
    */
  val DefaultOrphanAgeMs: Long = 24L * 3600 * 1000

  def vacuumLog(s: SparkSession, root: String, keepFrom: Int,
      orphanAgeMs: Long = DefaultOrphanAgeMs): (Int, Int) = {
    val conf = s.sessionState.newHadoopConf()
    val latest = GraftLog.latestVersion(conf, root)
    require(keepFrom >= 1 && keepFrom <= latest,
      s"keepFrom $keepFrom outside committed versions 1..$latest")
    val keep = (keepFrom to latest)
      .flatMap(v => GraftLog.referencedEntries(conf, root, v)).toSet
    val expired = (1 until keepFrom)
      .flatMap(v => GraftLog.referencedEntries(conf, root, v)).toSet
    val dead = (expired -- keep).toSeq.sorted
    val fs = new Path(root).getFileSystem(conf)
    // phase 1: commit the expiration — readers refuse below the
    // watermark from here on, so no read started after this line can
    // race the deletes into a mid-scan FileNotFound
    fs.create(new Path(s"$root/_log/_vacuum_v$keepFrom"), true).close()
    // phase 2: physically delete what no retained version references
    val deleted = dead.count { f =>
      fs.delete(new Path(s"$root/$f"), true)
    }
    // phase 3: sweep uncommitted orphans under data/ (referenced =
    // exact path OR any ancestor directory — legacy manifest rows can
    // reference directories)
    val cutoff = System.currentTimeMillis() - orphanAgeMs
    def referenced(rel: String): Boolean = {
      if (keep.contains(rel) || expired.contains(rel)) return true
      var p = rel
      while (p.contains('/')) {
        p = p.substring(0, p.lastIndexOf('/'))
        if (keep.contains(p) || expired.contains(p)) return true
      }
      false
    }
    var orphans = 0
    val dataRoot = new Path(s"$root/data")
    if (fs.exists(dataRoot)) {
      // the age guard applies to DIRECTORIES too (an in-flight writer
      // may have mkdir'd its staging and not yet written a file) —
      // judged by the mtime captured BEFORE sweeping the children,
      // since deleting them bumps the parent's mtime on most
      // filesystems and would otherwise keep emptied debris one extra
      // vacuum cycle
      def sweep(dir: Path): Boolean = { // returns "directory now empty"
        var empty = true
        fs.listStatus(dir).foreach { st =>
          if (st.isDirectory) {
            val dirMtime = st.getModificationTime
            if (sweep(st.getPath) && dirMtime < cutoff &&
              fs.delete(st.getPath, false)) ()
            else empty = false
          } else {
            val rel = normPath(st.getPath.toString)
              .stripPrefix(normPath(root)).stripPrefix("/")
            if (!referenced(rel) &&
              st.getModificationTime < cutoff &&
              fs.delete(st.getPath, false)) orphans += 1
            else empty = false
          }
        }
        empty
      }
      sweep(dataRoot) // data/ itself stays (committed writes land there)
    }
    (deleted + orphans, keep.size)
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
