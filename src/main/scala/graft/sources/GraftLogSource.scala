package graft.sources

import java.util

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{streaming, Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The versioned transaction log as a REAL engine surface: a
  * DataSourceV2 `TableProvider` registered as `format("graftlog")`, so
  * time travel is `spark.read.format("graftlog").option("path", root)
  * .option("version", v).load()` instead of a driver-assembled file
  * list handed to the parquet reader.
  *
  * Why a connector and not the utility read (the r10 shape,
  * Maintenance.readVersion building `s.read.parquet(files:_*)`): the
  * utility path can never participate in scan planning — Spark sees an
  * anonymous parquet relation, not a versioned table, so the
  * version/watermark contract lives outside the plan and every caller
  * must re-implement it. As a DSv2 table the contract IS the scan:
  *
  *  - SNAPSHOT ISOLATION: `planInputPartitions` folds the committed
  *    manifests as of the requested version — a concurrent writer
  *    landing version N+1 mid-query changes nothing this scan reads.
  *  - WATERMARK REFUSAL: a version below the committed vacuum
  *    watermark refuses at `load()` (clean IllegalArgumentException),
  *    never mid-scan on a deleted file.
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): the pruned
  *    schema becomes the parquet projection (`parquet.read.schema`),
  *    so untouched columns are never decoded — at 100 TB a 2-column
  *    query over a 6-column log table reads a third of the bytes.
  *  - FILTER PUSHDOWN (`SupportsPushDownFilters`): supported
  *    predicates convert to parquet `FilterPredicate`s evaluated
  *    against row-group statistics (and record assembly) inside each
  *    reader; all filters are ALSO returned as residual — exactly
  *    Spark's own parquet discipline, because row-group stats are
  *    coarse, so correctness never depends on the pushdown.
  *
  * Both log protocols are served by protocol auto-detection:
  * the marker protocol (`_log/v<N>/` parquet manifest + `v<N>._ok`
  * marker — Maintenance.commitVersion) and the OCC protocol
  * (`_log/v<N>.txt` sealed text manifests claimed put-if-absent —
  * Maintenance.Occ). Torn commits are invisible in both: an unmarked
  * manifest dir, or an unsealed text manifest, ends the log.
  *
  * Scale notes: manifests are catalog-sized (file actions, not rows) and
  * fold on the driver in one pass; data reading parallelizes one
  * InputPartition per part-file (a production split would further cut
  * by row group; file-level is the honest local[32] grain since the
  * writer bounds file sizes). Readers use parquet-hadoop's public
  * column-IO path — vectorization is a swap of the reader factory, not
  * of the connector surface.
  */
object GraftLog {

  /** User-facing short name (via DataSourceRegister + META-INF
    * services registration).
    */
  val ShortName = "graftlog"

  /** The format string the engine's own call sites use: the provider
    * CLASS name, which `DataSource.lookupDataSource` resolves by
    * reflection — robust even on classpaths assembled without the
    * compiled resources (the service-registry file), e.g. a bare
    * `-cp target/scala-2.13/classes` run after `compile` alone.
    */
  val Format: String = classOf[GraftLogSource].getName

  private def fsOf(conf: Configuration, root: String): FileSystem =
    new Path(root).getFileSystem(conf)

  /** OCC protocol iff version 1 was claimed as a text manifest. */
  private def isOcc(conf: Configuration, root: String): Boolean =
    fsOf(conf, root).exists(new Path(s"$root/_log/v1.txt"))

  /** Highest COMMITTED version: marker protocol = max N with `v<N>._ok`;
    * OCC = max N with a SEALED `v<N>.txt`. Torn commits end the log.
    */
  def latestVersion(conf: Configuration, root: String): Int = {
    val fs = fsOf(conf, root)
    if (isOcc(conf, root))
      Iterator.from(1)
        .takeWhile(v => readOccManifest(fs, root, v).isDefined)
        .foldLeft(0)((_, v) => v)
    else
      Iterator.from(1)
        .takeWhile(v => fs.exists(new Path(s"$root/_log/v$v._ok")))
        .foldLeft(0)((_, v) => v)
  }

  /** Lowest readable version (1 if never vacuumed) — max over the
    * `_vacuum_v*` markers, NOT a consecutive walk (a first vacuum at
    * keepFrom >= 3 must still raise the watermark).
    */
  def vacuumWatermark(conf: Configuration, root: String): Int = {
    val fs = fsOf(conf, root)
    val logPath = new Path(s"$root/_log")
    if (!fs.exists(logPath)) 1
    else fs.listStatus(logPath).iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("_vacuum_v") =>
        n.stripPrefix("_vacuum_v").toInt }
      .foldLeft(1)(math.max)
  }

  /** Sealed OCC manifest actions, or None if absent/torn. */
  private def readOccManifest(fs: FileSystem, root: String,
      v: Int): Option[Seq[(String, String)]] = {
    val p = new Path(s"$root/_log/v$v.txt")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val lines = text.split("\n").filter(_.nonEmpty).toSeq
    val actions = lines.takeWhile(!_.startsWith("commit "))
      .map { l => val Array(a, f) = l.split(" ", 2); (a, f) }
    val sealed_ = lines.drop(actions.length) match {
      case Seq(seal) => seal == s"commit ${actions.length}"
      case _         => false
    }
    if (sealed_) Some(actions) else None
  }

  /** Marker-protocol manifest actions: the `_log/v<N>/` parquet read
    * through the same Group reader the data path uses — a plain footer+
    * column decode, NO Spark job (the r10 utility ran one job per
    * version just to read catalog rows).
    */
  private def readMarkerManifest(conf: Configuration, root: String,
      v: Int): Seq[(String, String)] = {
    val fs = fsOf(conf, root)
    val out = mutable.ArrayBuffer[(String, String)]()
    listParquetFiles(fs, new Path(s"$root/_log/v$v")).foreach { f =>
      val reader =
        ParquetReader.builder(new GroupReadSupport(), f).withConf(conf)
          .build()
      try {
        var g = reader.read()
        while (g != null) {
          out += ((g.getString("action", 0), g.getString("file", 0)))
          g = reader.read()
        }
      } finally reader.close()
    }
    out.toSeq
  }

  /** Live file ENTRIES (as logged — file or directory paths relative to
    * root) as of `asOf`: fold adds minus removes over v1..asOf.
    */
  def liveEntries(conf: Configuration, root: String,
      asOf: Int): Seq[String] = {
    val latest = latestVersion(conf, root)
    require(asOf >= 1 && asOf <= latest,
      s"version $asOf not committed under $root (latest: $latest)")
    val occ = isOcc(conf, root)
    val fs = fsOf(conf, root)
    val live = mutable.LinkedHashSet[String]()
    (1 to asOf).foreach { v =>
      val actions =
        if (occ) readOccManifest(fs, root, v).getOrElse(Seq.empty)
        else readMarkerManifest(conf, root, v)
      actions.foreach {
        case ("add", f)    => live += f
        case ("remove", f) => live -= f
        case _             => ()
      }
    }
    live.toSeq
  }

  /** Action list of ONE committed version, protocol-dispatched — the
    * streaming tail's unit of progress.
    */
  def versionActions(conf: Configuration, root: String,
      v: Int): Seq[(String, String)] =
    if (isOcc(conf, root))
      readOccManifest(fsOf(conf, root), root, v).getOrElse(Seq.empty)
    else readMarkerManifest(conf, root, v)

  /** Expand a single logged entry (file or directory) to part-files. */
  def expandEntry(conf: Configuration, root: String,
      entry: String): Seq[String] =
    listParquetFiles(fsOf(conf, root), new Path(s"$root/$entry"))
      .map(_.toString)

  /** Expand live entries to concrete part-files (an entry may be a
    * Hive-partitioned directory or a single file).
    */
  def dataFiles(conf: Configuration, root: String,
      asOf: Int): Seq[String] =
    liveEntries(conf, root, asOf).flatMap { e =>
      listParquetFiles(fsOf(conf, root), new Path(s"$root/$e"))
        .map(_.toString)
    }

  private def listParquetFiles(fs: FileSystem, p: Path): Seq[Path] =
    if (!fs.exists(p)) Seq.empty
    else if (fs.getFileStatus(p).isFile) Seq(p)
    else fs.listStatus(p).toSeq.sortBy(_.getPath.getName).flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory) listParquetFiles(fs, st.getPath)
      else if (n.endsWith(".parquet") && !n.startsWith("_") &&
        !n.startsWith(".")) Seq(st.getPath)
      else Seq.empty
    }

  /** Checked version resolve: default latest; refuse below watermark. */
  def resolveVersion(conf: Configuration, root: String,
      requested: Option[Int]): Int = {
    val latest = latestVersion(conf, root)
    require(latest >= 1, s"no committed versions under $root")
    val v = requested.getOrElse(latest)
    require(v >= 1 && v <= latest,
      s"version $v not committed under $root (latest: $latest)")
    val wm = vacuumWatermark(conf, root)
    require(v >= wm, s"version $v expired: vacuum watermark is $wm")
    v
  }

  /** Spark schema of the snapshot: footer of the first live part-file
    * (the log's commit discipline keeps versions schema-consistent).
    */
  def inferSchema(conf: Configuration, root: String, asOf: Int): StructType = {
    val first = dataFiles(conf, root, asOf).headOption.getOrElse(
      throw new IllegalArgumentException(
        s"version $asOf of $root has no data files"))
    val footer = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(first), conf))
    val msg = try footer.getFileMetaData.getSchema finally footer.close()
    StructType(msg.getFields.toArray(Array.empty[Type]).map { t =>
      StructField(t.getName, toSparkType(t.asPrimitiveType()),
        nullable = true)
    })
  }

  private def toSparkType(p: PrimitiveType): DataType = {
    import PrimitiveType.PrimitiveTypeName._
    val ann = p.getLogicalTypeAnnotation
    p.getPrimitiveTypeName match {
      case INT64 => ann match {
        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          require(ts.getUnit ==
            LogicalTypeAnnotation.TimeUnit.MICROS,
            s"unsupported timestamp unit ${ts.getUnit} for ${p.getName}")
          if (ts.isAdjustedToUTC) TimestampType else TimestampNTZType
        case _ => LongType
      }
      case INT32 => ann match {
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => DateType
        case _ => IntegerType
      }
      // legacy 12-byte Spark/Impala timestamp (julian day + nanos) —
      // still what some writers emit; maps to session-adjusted
      // TimestampType exactly as Spark's own reader does
      case INT96   => TimestampType
      case DOUBLE  => DoubleType
      case FLOAT   => FloatType
      case BOOLEAN => BooleanType
      case BINARY =>
        if (ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation])
          StringType
        else BinaryType
      case other => throw new IllegalArgumentException(
        s"graftlog: unsupported parquet type $other for ${p.getName}")
    }
  }

  /** Columns stored as legacy INT96 in the first live file — excluded
    * from filter pushdown (INT96 has no usable min/max ordering in
    * row-group stats; parquet itself refuses predicates on it) and
    * decoded via the julian-day + nanos conversion in the reader.
    */
  def int96Columns(conf: Configuration, root: String,
      asOf: Int): Set[String] = {
    val first = dataFiles(conf, root, asOf).headOption.getOrElse(
      return Set.empty)
    val footer = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(first), conf))
    val msg = try footer.getFileMetaData.getSchema finally footer.close()
    msg.getFields.toArray(Array.empty[Type]).collect {
      case t: PrimitiveType if t.getPrimitiveTypeName ==
        PrimitiveType.PrimitiveTypeName.INT96 => t.getName
    }.toSet
  }

  /** File-level statistics skip: keep the file iff at least one of its
    * row groups MAY match the predicate, per parquet's own
    * StatisticsFilter over the footer min/max — so a selective scan
    * never even schedules tasks for dead files. Conservative by
    * construction (the reader re-checks row groups and Spark re-applies
    * residuals) and failure-safe: any validation surprise (predicate
    * column absent from this file's schema, stats missing) KEEPS the
    * file.
    */
  def fileMayMatch(conf: Configuration, file: String,
      predicate: FilterPredicate): Boolean =
    try {
      val footer = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(file), conf))
      try {
        val meta = footer.getFooter
        !org.apache.parquet.filter2.compat.RowGroupFilter
          .filterRowGroups(FilterCompat.get(predicate), meta.getBlocks,
            meta.getFileMetaData.getSchema)
          .isEmpty
      } finally footer.close()
    } catch { case _: Exception => true }

  /** INT96 → micros since epoch: little-endian nanos-of-day (8 bytes)
    * + little-endian julian day (4 bytes); epoch = julian 2440588.
    */
  def int96ToMicros(b: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong(0)
    val julianDay = buf.getInt(8)
    (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
  }

  /** Spark source Filter -> parquet FilterPredicate, for the subset with
    * exact row-group-statistics semantics. Unconvertible filters are
    * simply not pushed (they stay residual like everything else).
    */
  def toParquetPredicate(schema: StructType,
      f: Filter): Option[FilterPredicate] = {
    def typeOf(c: String): Option[DataType] =
      schema.fields.find(_.name == c).map(_.dataType)
    def longVal(v: Any): Option[java.lang.Long] = v match {
      case n: Number => Some(java.lang.Long.valueOf(n.longValue()))
      case t: java.sql.Timestamp =>
        Some(java.lang.Long.valueOf(
          org.apache.spark.sql.catalyst.util.DateTimeUtils
            .fromJavaTimestamp(t)))
      case i: java.time.Instant =>
        Some(java.lang.Long.valueOf(
          org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)))
      case l: java.time.LocalDateTime => // TimestampNTZ filter values
        Some(java.lang.Long.valueOf(
          org.apache.spark.sql.catalyst.util.DateTimeUtils
            .localDateTimeToMicros(l)))
      case _ => None
    }
    def intVal(dt: DataType, v: Any): Option[Integer] = (dt, v) match {
      case (DateType, d: java.sql.Date) =>
        Some(Integer.valueOf(d.toLocalDate.toEpochDay.toInt))
      case (DateType, d: java.time.LocalDate) =>
        Some(Integer.valueOf(d.toEpochDay.toInt))
      case (_, n: Number) => Some(Integer.valueOf(n.intValue()))
      case _ => None
    }
    def cmp(c: String, v: Any,
        mk: (DataType, Any) => Option[FilterPredicate]) =
      typeOf(c).flatMap(dt => mk(dt, v))
    f match {
      case And(l, r) => for {
        lp <- toParquetPredicate(schema, l)
        rp <- toParquetPredicate(schema, r)
      } yield FilterApi.and(lp, rp)
      case Or(l, r) => for {
        lp <- toParquetPredicate(schema, l)
        rp <- toParquetPredicate(schema, r)
      } yield FilterApi.or(lp, rp)
      case Not(c) => toParquetPredicate(schema, c).map(FilterApi.not)
      case IsNull(c) => typeOf(c).flatMap {
        case LongType | TimestampType | TimestampNTZType =>
          Some(FilterApi.eq(FilterApi.longColumn(c), null: java.lang.Long))
        case IntegerType | DateType =>
          Some(FilterApi.eq(FilterApi.intColumn(c), null: Integer))
        case DoubleType =>
          Some(FilterApi.eq(FilterApi.doubleColumn(c),
            null: java.lang.Double))
        case StringType | BinaryType =>
          Some(FilterApi.eq(FilterApi.binaryColumn(c), null: Binary))
        case _ => None
      }
      case IsNotNull(c) =>
        toParquetPredicate(schema, IsNull(c)).map(FilterApi.not)
      case EqualTo(c, v) if v != null => cmp(c, v, {
        case (LongType | TimestampType | TimestampNTZType, x) =>
          longVal(x).map(FilterApi.eq(FilterApi.longColumn(c), _))
        case (dt @ (IntegerType | DateType), x) =>
          intVal(dt, x).map(FilterApi.eq(FilterApi.intColumn(c), _))
        case (DoubleType, x: Number) =>
          Some(FilterApi.eq(FilterApi.doubleColumn(c),
            java.lang.Double.valueOf(x.doubleValue())))
        case (StringType, x: String) =>
          Some(FilterApi.eq(FilterApi.binaryColumn(c),
            Binary.fromString(x)))
        case _ => None
      })
      case GreaterThan(c, v) if v != null => cmp(c, v, {
        case (LongType | TimestampType | TimestampNTZType, x) =>
          longVal(x).map(FilterApi.gt(FilterApi.longColumn(c), _))
        case (dt @ (IntegerType | DateType), x) =>
          intVal(dt, x).map(FilterApi.gt(FilterApi.intColumn(c), _))
        case (DoubleType, x: Number) =>
          Some(FilterApi.gt(FilterApi.doubleColumn(c),
            java.lang.Double.valueOf(x.doubleValue())))
        case (StringType, x: String) =>
          Some(FilterApi.gt(FilterApi.binaryColumn(c),
            Binary.fromString(x)))
        case _ => None
      })
      case GreaterThanOrEqual(c, v) if v != null => cmp(c, v, {
        case (LongType | TimestampType | TimestampNTZType, x) =>
          longVal(x).map(FilterApi.gtEq(FilterApi.longColumn(c), _))
        case (dt @ (IntegerType | DateType), x) =>
          intVal(dt, x).map(FilterApi.gtEq(FilterApi.intColumn(c), _))
        case (DoubleType, x: Number) =>
          Some(FilterApi.gtEq(FilterApi.doubleColumn(c),
            java.lang.Double.valueOf(x.doubleValue())))
        case (StringType, x: String) =>
          Some(FilterApi.gtEq(FilterApi.binaryColumn(c),
            Binary.fromString(x)))
        case _ => None
      })
      case LessThan(c, v) if v != null => cmp(c, v, {
        case (LongType | TimestampType | TimestampNTZType, x) =>
          longVal(x).map(FilterApi.lt(FilterApi.longColumn(c), _))
        case (dt @ (IntegerType | DateType), x) =>
          intVal(dt, x).map(FilterApi.lt(FilterApi.intColumn(c), _))
        case (DoubleType, x: Number) =>
          Some(FilterApi.lt(FilterApi.doubleColumn(c),
            java.lang.Double.valueOf(x.doubleValue())))
        case (StringType, x: String) =>
          Some(FilterApi.lt(FilterApi.binaryColumn(c),
            Binary.fromString(x)))
        case _ => None
      })
      case LessThanOrEqual(c, v) if v != null => cmp(c, v, {
        case (LongType | TimestampType | TimestampNTZType, x) =>
          longVal(x).map(FilterApi.ltEq(FilterApi.longColumn(c), _))
        case (dt @ (IntegerType | DateType), x) =>
          intVal(dt, x).map(FilterApi.ltEq(FilterApi.intColumn(c), _))
        case (DoubleType, x: Number) =>
          Some(FilterApi.ltEq(FilterApi.doubleColumn(c),
            java.lang.Double.valueOf(x.doubleValue())))
        case (StringType, x: String) =>
          Some(FilterApi.ltEq(FilterApi.binaryColumn(c),
            Binary.fromString(x)))
        case _ => None
      })
      case In(c, vs) if vs != null && vs.nonEmpty && vs.forall(_ != null)
          && vs.length <= 20 =>
        vs.toSeq.map(v => toParquetPredicate(schema, EqualTo(c, v)))
          .reduce((a, b) => for { x <- a; y <- b }
            yield FilterApi.or(x, y))
      case _ => None
    }
  }
}

/** `format("graftlog")` entry point (registered via
  * META-INF/services/org.apache.spark.sql.sources.DataSourceRegister).
  */
class GraftLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = GraftLog.ShortName
  override def supportsExternalMetadata(): Boolean = false

  private def rootOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graftlog requires option(\"path\")"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = new Configuration()
    val root = rootOf(options)
    // bootstrap: a brand-new table has no committed version to infer
    // from — the FIRST write passes option("schema", <ddl>) (a bare
    // TableProvider has no catalog to CREATE through)
    if (GraftLog.latestVersion(conf, root) == 0 &&
        options.containsKey("schema"))
      return StructType.fromDDL(options.get("schema"))
    val v = GraftLog.resolveVersion(conf, root,
      Option(options.get("version")).map(_.toInt))
    GraftLog.inferSchema(conf, root, v)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val conf = new Configuration()
    val root = rootOf(options)
    val v =
      if (GraftLog.latestVersion(conf, root) == 0) 0 // bootstrap write
      else GraftLog.resolveVersion(conf, root,
        Option(options.get("version")).map(_.toInt))
    GraftLogTable(root, v, schema)
  }
}

case class GraftLogTable(root: String, asOfVersion: Int,
    tableSchema: StructType) extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graftlog:`$root`@v$asOfVersion"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    require(asOfVersion >= 1,
      s"no committed versions under $root — write one first")
    new GraftLogScanBuilder(root, asOfVersion, tableSchema)
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftLogWriteBuilder(root, info)
}

class GraftLogScanBuilder(root: String, version: Int, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var pruned: StructType = full
  private var accepted: Array[Filter] = Array.empty

  // catalog-cheap footer probe: INT96-backed columns take no pushdown
  private lazy val int96 =
    GraftLog.int96Columns(new Configuration(), root, version)

  override def pruneColumns(requiredSchema: StructType): Unit =
    pruned = requiredSchema

  /** Accept what converts; return EVERYTHING as residual — row-group
    * statistics are coarse, so Spark must re-apply (the same contract
    * its built-in parquet source uses).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter(f =>
      f.references.forall(!int96.contains(_)) &&
        GraftLog.toParquetPredicate(full, f).isDefined)
    filters
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = {
    val predicate = accepted
      .flatMap(f => GraftLog.toParquetPredicate(full, f))
      .reduceOption(FilterApi.and)
    GraftLogScan(root, version, full, int96, pruned,
      accepted.map(_.toString), predicate)
  }
}

case class GraftLogScan(root: String, version: Int, full: StructType,
    int96: Set[String], pruned: StructType,
    pushedDesc: Array[String], predicate: Option[FilterPredicate])
    extends Scan with Batch with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  /** Runtime filters (DPP-style: Spark hands them to the scan after the
    * build side of a join resolves) AND into the static pushdown; they
    * participate in BOTH the file-level stats skip and the per-reader
    * row-group/record filtering. Conservative superset semantics — the
    * join itself still applies the exact condition.
    */
  private var runtimePredicate: Option[FilterPredicate] = None
  private[sources] var runtimeDesc: Array[String] = Array.empty

  override def filterAttributes():
      Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    full.fieldNames.filterNot(int96.contains)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit = {
    val converted = filters.filter(_.references.forall(!int96.contains(_)))
      .flatMap(f => GraftLog.toParquetPredicate(full, f))
    if (converted.nonEmpty) {
      runtimePredicate = (runtimePredicate.toSeq ++ converted)
        .reduceOption(FilterApi.and)
      runtimeDesc ++= filters.map(_.toString)
    }
  }

  private def effectivePredicate: Option[FilterPredicate] =
    (predicate.toSeq ++ runtimePredicate.toSeq)
      .reduceOption(FilterApi.and)

  override def readSchema(): StructType = pruned

  /** Planner-visible stats for the snapshot: exact row count from the
    * parquet footers (metadata only — never a data read) and bytes
    * scaled by the pruned-column fraction, the same heuristic Spark's
    * FileScan uses. This is what lets a small log snapshot broadcast
    * correctly when joined against a large fact table.
    */
  // lazily memoized: planning may ask for stats more than once, and the
  // footer walk (catalog-sized as it is) need only happen once per scan
  private lazy val memoStats: Statistics = {
    val conf = new Configuration()
    val files = GraftLog.dataFiles(conf, root, version)
    var bytes = 0L
    var rows = 0L
    files.foreach { f =>
      val p = new Path(f)
      bytes += p.getFileSystem(conf).getFileStatus(p).getLen
      val footer = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try rows += footer.getRecordCount finally footer.close()
    }
    val fullWidth = math.max(1,
      GraftLog.inferSchema(conf, root, version).length)
    val frac = math.min(1.0, pruned.length.toDouble / fullWidth)
    val scaled = math.max(1L, (bytes * math.max(frac, 0.1)).toLong)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(scaled)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  }

  override def estimateStatistics(): Statistics = memoStats

  override def description(): String =
    s"GraftLogScan root=$root version=$version " +
      s"readSchema=[${pruned.fieldNames.mkString(",")}] " +
      s"pushed=[${pushedDesc.mkString(", ")}]"

  override def toBatch: Batch = this

  /** Files whose footer statistics rule out every row group under the
    * combined (static + runtime) predicate are never scheduled at all —
    * at 100 TB a selective key predicate over a clustered log version
    * scans only the matching files.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val files = GraftLog.dataFiles(conf, root, version)
    val kept = effectivePredicate match {
      case Some(p) => files.filter(f => GraftLog.fileMayMatch(conf, f, p))
      case None    => files
    }
    kept.map(f => GraftLogInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftLogReaderFactory(pruned, effectivePredicate)

  /** The log as a STREAM: each committed version is a micro-batch of
    * the files it ADDED — `readStream.format("graftlog")` tails the
    * commit log the way lakehouse formats do. Offsets are version
    * numbers (exactly-once via the standard checkpoint protocol), and
    * column pruning / filter pushdown apply to the tail exactly as to
    * the batch scan (same reader factory). APPEND-ONLY contract: a
    * version that removes files (compaction, delete, rewrite) is not
    * representable as appended rows — the tail fails LOUDLY on it
    * rather than silently emitting re-added duplicates.
    */
  override def toMicroBatchStream(
      checkpointLocation: String): streaming.MicroBatchStream =
    new GraftLogMicroBatchStream(root, pruned, effectivePredicate)
}

case class GraftLogInputPartition(file: String) extends InputPartition

/** Version-number offset of the streaming tail. */
case class GraftLogOffset(version: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = version.toString
}

/** Micro-batch tail over the commit log: offset N = "everything through
  * version N"; a batch (start, end] reads the files ADDED by versions
  * start+1..end. Torn commits are invisible (latestOffset stops before
  * them), so a batch can never read a half-written version.
  */
class GraftLogMicroBatchStream(root: String, pruned: StructType,
    predicate: Option[FilterPredicate])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def conf = new Configuration()

  override def initialOffset(): Offset = GraftLogOffset(0)

  override def latestOffset(): Offset =
    GraftLogOffset(GraftLog.latestVersion(conf, root))

  override def deserializeOffset(json: String): Offset =
    GraftLogOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftLogOffset].version
    val e = end.asInstanceOf[GraftLogOffset].version
    val c = conf
    (s + 1 to e).flatMap { v =>
      val actions = GraftLog.versionActions(c, root, v)
      val removed = actions.collect { case ("remove", f) => f }
      if (removed.nonEmpty) throw new IllegalStateException(
        s"graftlog stream: version $v of $root is not append-only " +
          s"(removes ${removed.take(3).mkString(", ")}...); the tail " +
          "emits appended rows only — run maintenance rewrites on a " +
          "separate log, or start a fresh stream from a snapshot")
      actions.collect { case ("add", f) => f }
        .flatMap(GraftLog.expandEntry(c, root, _))
    }.map(f => GraftLogInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftLogReaderFactory(pruned, predicate)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

case class GraftLogReaderFactory(pruned: StructType,
    predicate: Option[FilterPredicate]) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new GraftLogPartitionReader(
      partition.asInstanceOf[GraftLogInputPartition].file, pruned,
      predicate)
}

/** Per-file reader: footer-driven projection (only the pruned columns
  * are decoded) + the pushed parquet predicate (row-group skipping and
  * record filtering happen inside parquet-hadoop, before any row
  * reaches Spark).
  */
class GraftLogPartitionReader(file: String, pruned: StructType,
    predicate: Option[FilterPredicate])
    extends PartitionReader[InternalRow] {

  private val conf = new Configuration()

  // captured from this FILE's footer so mixed-encoding logs (INT96 in
  // one snapshot, INT64 micros in another) decode correctly per file
  private var fileInt96: Set[String] = Set.empty

  private val reader: ParquetReader[Group] = {
    val footer = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    val fileSchema = try footer.getFileMetaData.getSchema
    finally footer.close()
    fileInt96 = fileSchema.getFields
      .toArray(Array.empty[org.apache.parquet.schema.Type]).collect {
        case t: org.apache.parquet.schema.PrimitiveType
          if t.getPrimitiveTypeName ==
            org.apache.parquet.schema.PrimitiveType
              .PrimitiveTypeName.INT96 => t.getName
      }.toSet
    // projection = the file's OWN field definitions filtered to the
    // pruned names (guaranteed physical-type compatible); an empty
    // projection (e.g. a bare count) still needs one column to drive
    // row iteration — take the first field, UNLESS a predicate exists
    // (a runtime filter can arrive after pruning): parquet's filter
    // validator requires every predicate column in the read schema, so
    // that rare case reads the full schema rather than failing
    val wanted =
      if (pruned.fields.nonEmpty) pruned.fieldNames.toSeq
      else if (predicate.isDefined)
        fileSchema.getFields.toArray(
          Array.empty[org.apache.parquet.schema.Type]).map(_.getName).toSeq
      else Seq(fileSchema.getFields.get(0).getName)
    val projection = new MessageType(fileSchema.getName,
      wanted.map(n =>
        fileSchema.getType(fileSchema.getFieldIndex(n))): _*)
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
    val b = ParquetReader.builder(new GroupReadSupport(), new Path(file))
      .withConf(conf)
    predicate.fold(b)(p => b.withFilter(FilterCompat.get(p))).build()
  }

  private lazy val getters: Array[(Group, Int) => Any] =
    pruned.fields.map { f =>
      f.dataType match {
        case TimestampType if fileInt96.contains(f.name) =>
          (g: Group, i: Int) =>
            GraftLog.int96ToMicros(g.getInt96(i, 0).getBytes)
        case LongType | TimestampType | TimestampNTZType =>
          (g: Group, i: Int) => g.getLong(i, 0)
        case IntegerType | DateType =>
          (g: Group, i: Int) => g.getInteger(i, 0)
        case DoubleType  => (g: Group, i: Int) => g.getDouble(i, 0)
        case FloatType   => (g: Group, i: Int) => g.getFloat(i, 0)
        case BooleanType => (g: Group, i: Int) => g.getBoolean(i, 0)
        case StringType  => (g: Group, i: Int) =>
          UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
        case BinaryType  => (g: Group, i: Int) => g.getBinary(i, 0).getBytes
        case other => throw new IllegalArgumentException(
          s"graftlog: unsupported read type $other for ${f.name}")
      }
    }

  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(pruned.length)
    var i = 0
    while (i < pruned.length) {
      if (current.getFieldRepetitionCount(i) == 0) row.update(i, null)
      else row.update(i, getters(i)(current, i))
      i += 1
    }
    row
  }

  override def close(): Unit = reader.close()
}
