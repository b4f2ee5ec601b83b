package graft.sources

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

/** The WRITE half of the `graftlog` connector: `mode("append")` commits
  * one new log version per write — `df.write.format("graftlog")` for
  * batch, `writeStream.format("graftlog")` for a streaming sink where
  * EVERY EPOCH IS ONE COMMITTED VERSION (the exact mirror of the
  * streaming tail, which reads one version per micro-batch).
  *
  * Two-phase commit, same discipline as the read side expects:
  *  1. executors write parquet part-files into a write-scoped STAGING
  *     directory (never visible to readers — `_staging_*` is not
  *     reachable from any manifest);
  *  2. the driver CLAIMS the next version number put-if-absent
  *     (`_log/v<N>._claim` with overwrite=false — the OCC protocol's
  *     atomicity primitive, so concurrent writers serialize without a
  *     coordinator), renames staging to `data_v<N>/`, writes the
  *     manifest, and only then drops the `v<N>._ok` marker that makes
  *     the version visible. A crash anywhere before the marker leaves
  *     a torn (invisible) version; `abort` deletes the staging.
  *
  * Streaming exactly-once: a replayed epoch (crash between version
  * commit and checkpoint advance) is detected by the per-(query, epoch)
  * marker `_log/_epoch_<queryId>_<epochId>` and becomes a no-op — the
  * same applied-batch-id discipline the engine's foreachBatch sinks use
  * (streaming/Streams.scala), here INSIDE the connector.
  *
  * Appends only: overwrite would be a remove+add rewrite, which the
  * streaming tail correctly refuses — maintenance rewrites stay with
  * the explicit utilities (Maintenance.vacuumLog/compaction). A brand
  * new table bootstraps by passing `option("schema", <ddl>)` on the
  * first write (a TableProvider has no catalog to CREATE through).
  */
object GraftLogWrite {

  /** Spark → parquet schema for the supported hash-stable type set
    * (the same set the reader decodes; see [[GraftLog]]).
    */
  def toMessageType(schema: StructType): MessageType = {
    import PrimitiveType.PrimitiveTypeName._
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t = f.dataType match {
        case LongType    => Types.optional(INT64)
        case IntegerType => Types.optional(INT32)
        case DoubleType  => Types.optional(DOUBLE)
        case FloatType   => Types.optional(FLOAT)
        case BooleanType => Types.optional(BOOLEAN)
        case StringType  => Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case BinaryType  => Types.optional(BINARY)
        case DateType    => Types.optional(INT32)
          .as(LogicalTypeAnnotation.dateType())
        case TimestampType => Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case TimestampNTZType => Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(false,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case other => throw new IllegalArgumentException(
          s"graftlog write: unsupported type $other for ${f.name}")
      }
      b.addField(t.named(f.name))
    }
    b.named("spark_schema")
  }

  /** One staged part-file via parquet-hadoop's example writer — the
    * mirror of the reader's Group decode, no Spark internals.
    */
  private[graft] def groupWriter(path: Path, schema: MessageType,
      conf: Configuration): ParquetWriter[Group] = {
    GroupWriteSupport.setSchema(schema, conf)
    ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(path, conf))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .withType(schema)
      .build()
  }

  /** Claim the next version put-if-absent; returns the claimed number.
    * Losing a claim to a COMMITTED winner means retry the next number;
    * losing to an UNCOMMITTED claim means another writer is in flight
    * (or died mid-commit) on exactly the number this log needs next —
    * skipping it would leave a permanent hole that "torn commits end
    * the log" turns into an invisible version, so the claim fails
    * LOUDLY and recovery (deleting the stale `_claim` once the writer
    * is known dead) is explicit, the OCC discipline.
    */
  private def claimVersion(conf: Configuration, root: String): Int = {
    val fs = new Path(root).getFileSystem(conf)
    fs.mkdirs(new Path(s"$root/_log"))
    var n = GraftLog.latestVersion(conf, root) + 1
    var attempts = 0
    while (attempts < 1000) {
      try {
        fs.create(new Path(s"$root/_log/v$n._claim"), false).close()
        return n
      } catch {
        case _: java.io.IOException =>
          if (fs.exists(new Path(s"$root/_log/v$n._ok"))) {
            n += 1; attempts += 1 // committed winner — rebase past it
          } else throw new IllegalStateException(
            s"graftlog write: version $n of $root is claimed but not " +
              "committed — another writer is in flight, or died " +
              s"mid-commit; if dead, delete _log/v$n._claim to recover")
      }
    }
    throw new IllegalStateException(
      s"graftlog write: could not claim a version under $root/_log " +
        "after 1000 attempts")
  }

  /** Manifest write through the same Group path the reader uses. */
  private def writeManifest(conf: Configuration, root: String, n: Int,
      adds: Seq[String]): Unit = {
    val msg = Types.buildMessage()
      .addField(Types.optional(PrimitiveType.PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("action"))
      .addField(Types.optional(PrimitiveType.PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("file"))
      .named("manifest")
    val w = groupWriter(new Path(s"$root/_log/v$n/manifest.parquet"),
      msg, new Configuration(conf))
    try {
      val gf = new SimpleGroupFactory(msg)
      adds.foreach { f =>
        val g = gf.newGroup()
        g.add("action", "add"); g.add("file", f)
        w.write(g)
      }
    } finally w.close()
  }

  /** Driver-side commit: claim, publish the COMMITTED files (and only
    * those — a retried or speculative task attempt leaves its loser's
    * file in staging, and renaming the whole directory would publish
    * it; per-file rename of exactly the commit-message set is the
    * correct two-phase discipline) into data_v<N>, manifest, marker.
    * Returns the committed version.
    */
  private[graft] def commitStaged(conf: Configuration, root: String,
      staging: String, files: Seq[String]): Int = {
    val fs = new Path(root).getFileSystem(conf)
    val n = claimVersion(conf, root)
    val dataDir = s"data_v$n"
    if (files.isEmpty) {
      // an empty write is still a committed (empty) version: readers
      // of v<N> see exactly what the writer wrote — nothing
      writeManifest(conf, root, n, Nil)
    } else {
      fs.mkdirs(new Path(s"$root/$dataDir"))
      files.foreach { f =>
        val src = new Path(f)
        val dst = new Path(s"$root/$dataDir/${src.getName}")
        require(fs.rename(src, dst),
          s"graftlog write: rename $src -> $dst failed")
      }
      writeManifest(conf, root, n, Seq(dataDir))
    }
    fs.delete(new Path(staging), true) // drop loser-attempt remnants
    fs.create(new Path(s"$root/_log/v$n._ok"), true).close()
    n
  }
}

class GraftLogWriteBuilder(root: String, info: LogicalWriteInfo)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftLogBatchWrite(root, info.schema(),
        s"$root/_staging_${info.queryId()}_${UUID.randomUUID()}")
    override def toStreaming: StreamingWrite =
      new GraftLogStreamingWrite(root, info.schema(), info.queryId())
  }
}

case class GraftLogCommitMessage(file: String) extends WriterCommitMessage

class GraftLogBatchWrite(root: String, schema: StructType, staging: String)
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    GraftLogWriterFactory(staging, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftLogWrite.commitStaged(new Configuration(), root, staging,
      messages.map(_.asInstanceOf[GraftLogCommitMessage].file).toSeq)

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(staging)
    p.getFileSystem(new Configuration()).delete(p, true)
  }
}

/** Streaming sink: one committed version per epoch, replay-idempotent
  * via the per-(query, epoch) marker.
  */
class GraftLogStreamingWrite(root: String, schema: StructType,
    queryId: String) extends StreamingWrite {

  private def staging(epochId: Long) =
    s"$root/_staging_${queryId}_$epochId"

  private def epochMarker(epochId: Long) =
    new Path(s"$root/_log/_epoch_${queryId}_$epochId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftLogStreamingWriterFactory(s"$root/_staging_$queryId", schema)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val fs = new Path(root).getFileSystem(conf)
    if (fs.exists(epochMarker(epochId))) {
      // replayed epoch (crash between version commit and checkpoint
      // advance): the version is already in the log — drop the replay
      fs.delete(new Path(staging(epochId)), true)
      return
    }
    GraftLogWrite.commitStaged(conf, root, staging(epochId),
      messages.map(_.asInstanceOf[GraftLogCommitMessage].file).toSeq)
    fs.create(epochMarker(epochId), true).close()
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(staging(epochId))
    p.getFileSystem(new Configuration()).delete(p, true)
  }
}

case class GraftLogWriterFactory(staging: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GraftLogDataWriter(
      s"$staging/part-$partitionId-$taskId.parquet", schema)
}

case class GraftLogStreamingWriterFactory(stagingBase: String,
    schema: StructType) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftLogDataWriter(
      s"${stagingBase}_$epochId/part-$partitionId-$taskId.parquet", schema)
}

/** Per-task part-file writer: InternalRow → Group, one file per task,
  * deleted on abort.
  */
class GraftLogDataWriter(file: String, schema: StructType)
    extends DataWriter[InternalRow] {

  private val conf = new Configuration()
  private val msg = GraftLogWrite.toMessageType(schema)
  private val writer = GraftLogWrite.groupWriter(new Path(file), msg, conf)
  private val factory = new SimpleGroupFactory(msg)

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val name = schema(i).name
        schema(i).dataType match {
          case LongType | TimestampType | TimestampNTZType =>
            g.add(name, row.getLong(i))
          case IntegerType | DateType => g.add(name, row.getInt(i))
          case DoubleType             => g.add(name, row.getDouble(i))
          case FloatType              => g.add(name, row.getFloat(i))
          case BooleanType            => g.add(name, row.getBoolean(i))
          case StringType             => g.add(name,
            Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
          case BinaryType             => g.add(name,
            Binary.fromConstantByteArray(row.getBinary(i)))
          case other => throw new IllegalArgumentException(
            s"graftlog write: unsupported type $other for $name")
        }
      }
      i += 1
    }
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    GraftLogCommitMessage(file)
  }

  override def abort(): Unit = {
    writer.close()
    val p = new Path(file)
    p.getFileSystem(conf).delete(p, false)
  }

  override def close(): Unit = ()
}
