package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.column.ColumnDescriptor
import org.apache.parquet.column.ColumnReader
import org.apache.parquet.column.impl.ColumnReadStoreImpl
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterPredicate
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.{Converter, GroupConverter, PrimitiveConverter}
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** Vectorized per-file reader: decodes the pruned columns of one
  * part-file into [[ColumnarBatch]]es of Spark `OnHeapColumnVector`s —
  * the seam the row reader's docstring reserved. Row-at-a-time Group
  * assembly materializes a `SimpleGroup` object tree per ROW (a heap
  * allocation per value, a virtual call per field); this path runs
  * parquet-hadoop's public column readers straight into Spark's
  * writable vectors, one tight per-column loop per batch, and hands
  * Spark a columnar scan it converts with codegen (`ColumnarToRow`)
  * instead of a per-row object walk.
  *
  * Semantics mirror the row reader exactly:
  *  - projection = the pruned columns only (the file's OWN field
  *    definitions, so mixed-encoding logs decode per-file);
  *  - the pushed predicate filters ROW GROUPS at open (parquet's
  *    statistics/dictionary/bloom RowGroupFilter); record-level
  *    filtering is deliberately left to Spark's residual filters —
  *    identical to Spark's own vectorized parquet behavior, and all
  *    graftlog filters are residual by contract;
  *  - the predicate is dropped for files storing a referenced column
  *    as INT96 (decoded value-exactly via julian-day+nanos instead);
  *  - CDC metadata columns materialize as constant vectors;
  *  - a projection with NO data columns (bare `count(*)`, or a
  *    CDC-meta-only read) never opens a single page: row counts come
  *    from the (already row-group-filtered) block metadata.
  */
class GraftLogColumnarReader(file: String, pruned: StructType,
    predicate: Option[FilterPredicate], predicateRefs: Set[String],
    baseConf: Configuration, cdcMeta: Option[(String, Long)] = None,
    range: Option[(Long, Long)] = None, synthFile: Boolean = false,
    dvMask: Option[String] = None, dvEmit: Option[String] = None)
    extends PartitionReader[ColumnarBatch] {

  private val Capacity = 4096
  private val conf = new Configuration(baseConf)

  // DELETION-VECTOR mode, vectorized: masked rows are skipped WHILE the
  // batch fills (the per-column write loop compacts survivors in
  // place), so a DV'd table keeps the columnar path — AND keeps its
  // pushed predicate: row-group skips stay position-exact because each
  // surviving group carries its ORIGINAL file-absolute rowIndexOffset
  // (ParquetRowIndexSpec pins that parquet preserves it under
  // predicate filtering), and record-level filtering can't run here
  // anyway (this reader consumes pages directly). A 1%-selective scan
  // between a broad MoR merge and the next OPTIMIZE skips row groups
  // exactly like an unmasked one. `dvEmit` inverts the mask: ONLY the
  // sidecar's positions emit (the change feed's delete rows for a dv
  // commit) — a group skipped by the predicate holds no emittable row
  // either, since Spark re-applies the filter to the emitted deletes.
  // sidecar loads go through the executor-wide DvSidecarCache: a large
  // file split N ways reads its sidecar once per executor, not per split
  private val dvPositions: Array[Long] =
    dvMask.orElse(dvEmit)
      .map(p => GraftLog.DvSidecarCache.get(conf, p))
      .getOrElse(Array.empty)
  private val dvActive = dvMask.isDefined || dvEmit.isDefined
  private val dvSelect = dvEmit.isDefined

  // meta names are scan-synthesized ONLY when the scan says so (CDC
  // tags on CDC partitions; `_file` when the table schema doesn't
  // shadow it); a legacy table whose own schema uses them reads data
  private val dataFields: Array[(StructField, Int)] =
    pruned.fields.zipWithIndex.filter { case (f, _) =>
      (cdcMeta.isEmpty || !(f.name == GraftLog.ChangeTypeCol ||
        f.name == GraftLog.CommitVersionCol)) &&
        (!synthFile || f.name != GraftLog.FileCol) }

  // ONE footer read per file: open optimistically WITH the pushed
  // predicate — parquet's row-group filter validates the predicate
  // against this file's schema inside open(), so a file storing a
  // referenced column as INT96 (or not at all: written before a
  // widening) rejects there, and the retry without the predicate IS
  // the per-file predicate drop (Spark re-applies every filter as
  // residual). The common case — predicate applicable or absent —
  // pays exactly one footer read; only the rare mixed-encoding /
  // pre-widening file pays two. The retry catches ONLY the validator's
  // IllegalArgumentException (SchemaCompatibilityValidator's rejection
  // type): a genuine IO failure must propagate, not be silently
  // converted into an unfiltered second read that masks it.
  private val reader: ParquetFileReader = {
    def openWith(filter: Option[FilterPredicate]): ParquetFileReader = {
      val ob = HadoopReadOptions.builder(conf)
      // a byte-range split reads only the row groups whose midpoint
      // falls inside it (exactly-once across a covering range set)
      range.foreach { case (s, e) => ob.withRange(s, e) }
      filter.foreach(p => ob.withRecordFilter(FilterCompat.get(p)))
      ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(file), conf), ob.build())
    }
    predicate match {
      case None => openWith(None)
      case some => try openWith(some)
        catch { case _: IllegalArgumentException => openWith(None) }
    }
  }

  private val fileSchema = reader.getFooter.getFileMetaData.getSchema
  private val createdBy = reader.getFooter.getFileMetaData.getCreatedBy
  private val fileInt96: Set[String] = fileSchema.getFields
    .toArray(Array.empty[org.apache.parquet.schema.Type]).collect {
      case t: org.apache.parquet.schema.PrimitiveType
        if t.getPrimitiveTypeName ==
          org.apache.parquet.schema.PrimitiveType
            .PrimitiveTypeName.INT96 => t.getName
    }.toSet
  // pruned data columns present in THIS file; columns a widening
  // appended after the file was written stay all-null vectors
  private val present: Array[(StructField, Int)] =
    dataFields.filter { case (f, _) => fileSchema.containsField(f.name) }
  private val absent: Array[Int] =
    dataFields.filterNot { case (f, _) =>
      fileSchema.containsField(f.name) }.map(_._2)

  private val projection: Option[MessageType] =
    if (present.isEmpty) None
    else Some(new MessageType(fileSchema.getName,
      present.map { case (f, _) =>
        fileSchema.getType(fileSchema.getFieldIndex(f.name)) }: _*))

  projection.foreach(reader.setRequestedSchema)

  // ColumnReadStoreImpl resolves a PrimitiveConverter per column for
  // dictionary-support decisions; this reader pulls typed values off
  // the ColumnReader directly, so an inert converter suffices
  private val inertConverter = new GroupConverter {
    override def getConverter(fieldIndex: Int): Converter =
      new PrimitiveConverter {}
    override def start(): Unit = ()
    override def end(): Unit = ()
  }

  // one writer closure per PRESENT data column: (reader, vector, rowIdx)
  private val writers: Array[(ColumnReader, OnHeapColumnVector, Int) => Unit] =
    present.map { case (f, _) =>
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
      lazy val physical = fileSchema
        .getType(fileSchema.getFieldIndex(f.name))
        .asPrimitiveType().getPrimitiveTypeName
      f.dataType match {
        case TimestampType if fileInt96.contains(f.name) =>
          (cr, v, i) =>
            v.putLong(i, GraftLog.int96ToMicros(cr.getBinary.getBytes))
        // TYPE-WIDENING boundary: files written before an ALTER COLUMN
        // TYPE store the narrow physical — up-cast value-exactly
        case LongType if physical == INT32 =>
          (cr, v, i) => v.putLong(i, cr.getInteger.toLong)
        case DoubleType if physical == FLOAT =>
          (cr, v, i) => v.putDouble(i, cr.getFloat.toDouble)
        case LongType | TimestampType | TimestampNTZType =>
          (cr, v, i) => v.putLong(i, cr.getLong)
        case IntegerType | DateType => (cr, v, i) =>
          v.putInt(i, cr.getInteger)
        case DoubleType  => (cr, v, i) => v.putDouble(i, cr.getDouble)
        case FloatType   => (cr, v, i) => v.putFloat(i, cr.getFloat)
        case BooleanType => (cr, v, i) => v.putBoolean(i, cr.getBoolean)
        case StringType | BinaryType => (cr, v, i) =>
          { val b = cr.getBinary.getBytes; v.putByteArray(i, b) }
        case dec: org.apache.spark.sql.types.DecimalType =>
          // decode per THIS file's physical encoding; putDecimal routes
          // to the vector's precision-appropriate representation
          physical match {
            case INT32 => (cr, v, i) => v.putDecimal(i,
              org.apache.spark.sql.types.Decimal(
                BigDecimal(BigInt(cr.getInteger), dec.scale),
                dec.precision, dec.scale), dec.precision)
            case INT64 => (cr, v, i) => v.putDecimal(i,
              org.apache.spark.sql.types.Decimal(
                BigDecimal(BigInt(cr.getLong), dec.scale),
                dec.precision, dec.scale), dec.precision)
            case FIXED_LEN_BYTE_ARRAY | BINARY => (cr, v, i) =>
              v.putDecimal(i, org.apache.spark.sql.types.Decimal(
                BigDecimal(BigInt(new java.math.BigInteger(
                  cr.getBinary.getBytes)), dec.scale),
                dec.precision, dec.scale), dec.precision)
            case other => throw new IllegalArgumentException(
              s"graftlog: unsupported decimal physical $other for ${f.name}")
          }
        case other => throw new IllegalArgumentException(
          s"graftlog: unsupported read type $other for ${f.name}")
      }
    }

  private val vectors: Array[OnHeapColumnVector] =
    pruned.fields.map(f => new OnHeapColumnVector(Capacity, f.dataType))
  private val batch =
    new ColumnarBatch(vectors.map(v => v: ColumnVector))

  /** How many dv positions fall in [from, until). */
  private def dvCountIn(from: Long, until: Long): Long = {
    def lower(v: Long): Int = {
      var i = java.util.Arrays.binarySearch(dvPositions, v)
      if (i < 0) i = -i - 1
      i
    }
    (lower(until) - lower(from)).toLong
  }

  // current row group state
  private var groupReaders: Array[ColumnReader] = _
  private var groupMaxDef: Array[Int] = _
  private var groupRemaining: Long = 0L
  // file-absolute row position of the NEXT unread row of the current
  // group (deletion-vector mode only; each group carries its own
  // rowIndexOffset, exact even under byte-range row-group selection)
  private var groupPos: Long = 0L
  // metadata-count mode state (no columns to decode from THIS file —
  // a bare count, a CDC-meta-only read, or a file predating every
  // pruned column's widening). Under a deletion vector the metadata
  // count adjusts by the masked positions inside this reader's row
  // groups — still zero page reads.
  private val countsOnly = present.isEmpty
  private var countRemaining: Long =
    if (!countsOnly) 0L
    else if (!dvActive)
      reader.getRowGroups.asScala.map(_.getRowCount).sum
    else reader.getRowGroups.asScala.map { b =>
      val masked = dvCountIn(b.getRowIndexOffset,
        b.getRowIndexOffset + b.getRowCount)
      if (dvSelect) masked else b.getRowCount - masked
    }.sum

  // decoded row groups, folded into GraftLog.scanRowGroupsRead at close
  private var groupsRead = 0L

  private def advanceGroup(): Boolean = {
    val pages = reader.readNextRowGroup()
    if (pages == null) return false
    groupsRead += 1
    val store = new ColumnReadStoreImpl(pages, inertConverter,
      projection.get, createdBy)
    val cols = projection.get.getColumns.asScala.toArray
    groupReaders = cols.map(store.getColumnReader)
    groupMaxDef = cols.map(_.getMaxDefinitionLevel)
    groupRemaining = pages.getRowCount
    if (dvActive) {
      val off = pages.getRowIndexOffset
      require(off.isPresent,
        s"graftlog: $file row group carries no rowIndexOffset — " +
          "cannot apply a deletion vector to it")
      groupPos = off.get()
    }
    true
  }

  private val fileBytes: Array[Byte] = UTF8String.fromString(file).getBytes

  private def fillMeta(n: Int): Unit = {
    cdcMeta.foreach { case (ct, ver) =>
      val ctBytes = UTF8String.fromString(ct).getBytes
      pruned.fields.zipWithIndex.foreach {
        case (f, i) if f.name == GraftLog.ChangeTypeCol =>
          var r = 0
          while (r < n) { vectors(i).putByteArray(r, ctBytes); r += 1 }
        case (f, i) if f.name == GraftLog.CommitVersionCol =>
          var r = 0
          while (r < n) { vectors(i).putLong(r, ver); r += 1 }
        case _ => ()
      }
    }
    if (synthFile) pruned.fields.zipWithIndex.foreach {
      case (f, i) if f.name == GraftLog.FileCol =>
        var r = 0
        while (r < n) { vectors(i).putByteArray(r, fileBytes); r += 1 }
      case _ => ()
    }
    absent.foreach(i => vectors(i).putNulls(0, n))
  }

  // per-batch keep mask under a deletion vector (reused buffer)
  private val keepBuf = new Array[Boolean](Capacity)

  override def next(): Boolean = {
    if (countsOnly) {
      if (countRemaining <= 0L) return false
      val n = math.min(Capacity.toLong, countRemaining).toInt
      countRemaining -= n
      vectors.foreach(_.reset())
      fillMeta(n)
      batch.setNumRows(n)
      return true
    }
    while (true) {
      while (groupRemaining == 0L) {
        if (!advanceGroup()) return false
      }
      val n = math.min(Capacity.toLong, groupRemaining).toInt
      groupRemaining -= n
      // survivors of this chunk under the vector (all, when none):
      // decided ONCE, applied identically by every column's loop
      var kept = n
      if (dvActive) {
        kept = 0
        var r = 0
        while (r < n) {
          val masked =
            java.util.Arrays.binarySearch(dvPositions, groupPos + r) >= 0
          keepBuf(r) = masked == dvSelect
          if (keepBuf(r)) kept += 1
          r += 1
        }
        groupPos += n
      }
      vectors.foreach(_.reset())
      var c = 0
      while (c < writers.length) {
        val cr = groupReaders(c)
        val vec = vectors(present(c)._2)
        val write = writers(c)
        val maxDef = groupMaxDef(c)
        var r = 0
        var out = 0
        while (r < n) {
          if (!dvActive || keepBuf(r)) {
            if (cr.getCurrentDefinitionLevel == maxDef)
              write(cr, vec, out)
            else vec.putNull(out)
            out += 1
          } else if (cr.getCurrentDefinitionLevel == maxDef) {
            // a masked PRESENT value must be skip()ped: the value
            // decoder is lazy, and consume() alone would leave it
            // queued — the next kept row would then read THIS row's
            // value, shifting every survivor after it
            cr.skip()
          }
          cr.consume()
          r += 1
        }
        c += 1
      }
      if (kept > 0 || !dvActive) {
        fillMeta(kept)
        batch.setNumRows(kept)
        return true
      }
      // a fully-masked chunk: advance to the next instead of emitting
      // an empty batch
    }
    false // unreachable
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    GraftLog.scanRowGroupsRead.addAndGet(groupsRead)
    batch.close()
    reader.close()
  }
}
