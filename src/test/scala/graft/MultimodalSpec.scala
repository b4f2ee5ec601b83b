package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Pins the multimodal plumbing contract: NULL payloads propagate as null
  * features (never NPE a task), frame sampling drops NULL blobs the way the
  * oracle's unnest does, and blobMeta stays a single-scan zero-join plan.
  */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def withDocs[T](f: String => T): T = {
    val docs = Seq(
      (1L, "hello world of binary payloads and frames"),
      (2L, null.asInstanceOf[String]), // undecodable blob
      (3L, "")                         // zero-byte payload
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mm").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    f(dir)
  }

  test("blobMeta: null payload yields null features, one row per doc") {
    withDocs { dir =>
      val rows = Multimodal.blobMeta(spark, dir).collect()
      assert(rows.length === 3)
      val nullRow = rows.find(_.getAs[Long]("doc_id") == 2L).get
      assert(nullRow.isNullAt(nullRow.fieldIndex("n_bytes")))
      assert(nullRow.isNullAt(nullRow.fieldIndex("checksum")))
      assert(nullRow.getAs[Long]("height") === 2L % 48 + 1)
      val emptyRow = rows.find(_.getAs[Long]("doc_id") == 3L).get
      assert(emptyRow.getAs[Long]("n_bytes") === 0L)
      assert(emptyRow.getAs[Long]("header_byte") === 0L)
    }
  }

  test("blobMeta is a single-scan, zero-join plan") {
    withDocs { dir =>
      val plan = Multimodal.blobMeta(spark, dir)
        .queryExecution.executedPlan.toString
      assert("Scan parquet".r.findAllIn(plan).size === 1, plan)
      assert(!plan.contains("Join"), plan)
    }
  }

  test("resizeBlobs: null payload yields a null-feature row") {
    withDocs { dir =>
      val rows = Multimodal.resizeBlobs(spark, dir).collect()
      assert(rows.length === 3)
      val nullRow = rows.find(_.getAs[Long]("doc_id") == 2L).get
      assert(nullRow.isNullAt(nullRow.fieldIndex("resized_checksum")))
    }
  }

  test("sampleFrames: null payload emits no frames; real payloads fan out") {
    withDocs { dir =>
      val frames = Multimodal.sampleFrames(spark, dir).collect()
      assert(!frames.exists(_.getAs[Long]("doc_id") == 2L))
      assert(frames.exists(_.getAs[Long]("doc_id") == 1L))
    }
  }

  test("binaryFile ingest: one row per media file with exact length and " +
      "CRC32, sidecars filtered at listing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin")
    val payloads = Map(
      "a.bin" -> Array[Byte](1, 2, 3, 4, 5),
      "b.bin" -> "opaque media bytes".getBytes("UTF-8"),
      "c.bin" -> Array[Byte](0))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(dir.resolve(name), bytes)
    }
    java.nio.file.Files.write(dir.resolve("sidecar.json"),
      "{\"not\": \"media\"}".getBytes("UTF-8"))
    // zero-byte files produce NO row (the listing schedules no split for
    // them) — a real source semantic a corpus auditor must know about
    java.nio.file.Files.write(dir.resolve("empty.bin"), Array.empty[Byte])
    val rows = Multimodal.ingestBinaryDir(spark, dir.toString)
      .collect().map(r => r.getAs[String]("file_name") -> r).toMap
    assert(rows.keySet === payloads.keySet) // sidecar + empty excluded
    payloads.foreach { case (name, bytes) =>
      val crc = new java.util.zip.CRC32
      crc.update(bytes)
      assert(rows(name).getAs[Long]("length") === bytes.length.toLong)
      assert(rows(name).getAs[Long]("checksum") === crc.getValue)
    }
  }
}
