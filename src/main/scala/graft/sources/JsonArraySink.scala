package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Faithful form of the reference's JSON output (lambda_function.py:285-298):
  * `df.to_json(orient='records')` produces ONE JSON document — an array of
  * record objects — uploaded with object metadata (original_file,
  * processed_timestamp, record_count, processing_stage). The engine's
  * default JSON sink is JSON-lines (the scalable shape); this writer closes
  * the fidelity gap for consumers that expect the reference's exact format.
  *
  * Records serialize distributed (`Dataset.toJSON`, ISO date/timestamp
  * formats); only the final array assembly runs in a single task — which is
  * the honest mapping, because the reference's unit of work is one landed
  * input file, so each output document is bounded by design. Object
  * metadata lands in a `<file>.meta.json` sidecar (the filesystem stand-in
  * for S3 object metadata).
  */
object JsonArraySink {

  /** Writes `df` to `outFile` as a single JSON array document plus the
    * metadata sidecar. Returns the record count (the reference's
    * `record_count` metadata field).
    */
  def write(df: DataFrame, outFile: String, originalFile: String,
      processedTimestamp: String): Long = {
    // one upstream execution: the count and the serialization pass share
    // cached rows instead of re-running the whole transform chain. Respect
    // a caller-managed cache (don't persist-then-unpersist under them).
    val callerCached = df.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE
    val cached = if (callerCached) df else df.persist()
    val count  = cached.count()
    val tmp    = outFile + ".tmpdir"
    // a crashed prior run can leave the tmp dir behind, and Hadoop refuses
    // to write to an existing path — clear it so write() is retry-safe
    deleteRecursively(new java.io.File(tmp))
    cached.toJSON.coalesce(1).rdd.mapPartitions { it =>
      var first = true
      val body = it.map { rec =>
        val line = if (first) rec else "," + rec
        first = false
        line
      }
      Iterator.single("[") ++ body ++ Iterator.single("]")
    }.saveAsTextFile(tmp)
    if (!callerCached) cached.unpersist()
    val out = Paths.get(outFile)
    Option(out.getParent).foreach(Files.createDirectories(_))
    val part = Option(new java.io.File(tmp).listFiles()).toSeq.flatten
      .find(_.getName.startsWith("part-"))
    part match {
      case Some(p) =>
        Files.move(p.toPath, out, StandardCopyOption.REPLACE_EXISTING)
      case None => // zero-partition input: an empty array
        Files.writeString(out, "[]")
    }
    deleteRecursively(new java.io.File(tmp))
    val meta = Map(
      "original_file"       -> originalFile,
      "processed_timestamp" -> processedTimestamp,
      "record_count"        -> count.toString,
      "processing_stage"    -> "transformed")
    Files.writeString(Paths.get(outFile + ".meta.json"),
      meta.map { case (k, v) => s""""$k": "${jsonEscape(v)}"""" }
        .mkString("{", ", ", "}"))
    count
  }

  /** Full JSON string escaping — backslash FIRST, then quote + controls. */
  private def jsonEscape(s: String): String = s.flatMap {
    case '\\'         => "\\\\"
    case '"'          => "\\\""
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete()
  }
}
