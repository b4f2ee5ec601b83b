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

  test("imagePhash: null and empty payloads yield NULL bands; real " +
      "payloads yield 16-bit band keys") {
    withDocs { dir =>
      val rows = Multimodal.imagePhash(spark, dir).collect()
      assert(rows.length === 3)
      val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(byId(2L).isNullAt(byId(2L).fieldIndex("b0")))
      assert(byId(3L).isNullAt(byId(3L).fieldIndex("b0")))
      val real = byId(1L)
      Seq("b0", "b1", "b2", "b3").foreach { c =>
        val v = real.getAs[Long](c)
        assert(v >= 0L && v < 65536L, s"$c=$v out of 16-bit range")
      }
    }
  }

  test("image near-dup finds planted visual duplicates by hamming band, " +
      "including the pigeonhole-boundary pair at exactly hamming 3") {
    // A byte "image" of 128 px: first half bright ('z'), second half dark
    // ('a') — each aHash bucket covers 2 bytes, so editing one 2-byte
    // bucket region flips exactly that bucket's bit (all other buckets sit
    // far from the global mean and cannot flip from the small mean shift).
    val base = Array.fill(64)('z'.toByte) ++ Array.fill(64)('a'.toByte)
    def edited(buckets: Int*): Array[Byte] = {
      val b = base.clone()
      buckets.foreach { k =>
        val v = if (k < 32) 'a'.toByte else 'z'.toByte // flip bright↔dark
        b(2 * k) = v; b(2 * k + 1) = v
      }
      b
    }
    // planted: dup1 at hamming 1; dup3 at hamming 3 spread over bands
    // 0, 1, 2 (buckets 0, 16, 32) — only band 3 survives, the pigeonhole
    // boundary case; far is a different pattern entirely
    val far = Array.tabulate(128)(i =>
      (if (i % 2 == 0) 'z' else 'a').toByte)
    val blobs = Seq(
      (10L, base), (11L, edited(0)), (13L, edited(0, 16, 32)), (99L, far))
      .toDF("doc_id", "payload")
    val got = Multimodal.imageNearDup(spark, blobs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 11L, 1L), (10L, 13L, 3L), (11L, 13L, 2L)))
  }

  // P6 encoder for the decode tests (kept test-side: the ENGINE only ever
  // decodes; synthesizing images is a fixture concern)
  private def p6(w: Int, h: Int, rgb: Array[(Int, Int, Int)],
      header: String = ""): Array[Byte] = {
    val hdr = s"P6\n$header$w $h\n255\n".getBytes("US-ASCII")
    hdr ++ rgb.flatMap { case (r, g, b) =>
      Array(r.toByte, g.toByte, b.toByte) }
  }

  test("Netpbm decode: P6 grayscale conversion matches hand-computed " +
      "golden values byte-for-byte and by CRC32; P5 passes through; " +
      "malformed blobs decode to None, never throw") {
    val rgb = Array((255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255),
      (0, 0, 0), (128, 128, 128), (10, 20, 30), (200, 100, 50))
    // integer BT.601 luma, worked by hand: (299r + 587g + 114b + 500)/1000
    val golden = Array[Byte](76, 150.toByte, 29, 255.toByte, 0,
      128.toByte, 18, 124)
    val img = Multimodal.decodeNetpbm(p6(4, 2, rgb)).get
    assert(img.width === 4 && img.height === 2)
    assert(img.pixels.toSeq === golden.toSeq)
    val crcGot = new java.util.zip.CRC32
    crcGot.update(img.pixels)
    val crcWant = new java.util.zip.CRC32
    crcWant.update(golden)
    assert(crcGot.getValue === crcWant.getValue)
    // header comments are part of the format and must parse
    val commented = Multimodal.decodeNetpbm(
      p6(4, 2, rgb, header = "# a comment\n")).get
    assert(commented.pixels.toSeq === golden.toSeq)
    // P5: grayscale raster passes through untouched
    val p5 = "P5\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 254.toByte)
    assert(Multimodal.decodeNetpbm(p5).get.pixels.toSeq ===
      Seq[Byte](1, 2, 3, 254.toByte))
    // malformed inputs: total function, None throughout
    val goodBytes = p6(4, 2, rgb)
    assert(Multimodal.decodeNetpbm(null) === None)
    assert(Multimodal.decodeNetpbm("P7\n4 2\n255\n".getBytes) === None)
    assert(Multimodal.decodeNetpbm(goodBytes.dropRight(1)) === None)
    assert(Multimodal.decodeNetpbm(goodBytes :+ 0.toByte) === None)
    assert(Multimodal.decodeNetpbm(
      ("P6\n4 2\n65535\n" + "x" * 48).getBytes) === None)
    assert(Multimodal.decodeNetpbm("P6\n4 2\n255\n".getBytes) === None)
  }

  test("decoded-pixel pHash: planted visual near-dup found through the " +
      "decode path, inverted image separated, undecodable blob is an " +
      "all-NULL row") {
    val w = 64; val h = 4
    def gradient(f: Int => Int): Array[(Int, Int, Int)] =
      Array.tabulate(w * h) { i => val v = f(i % w); (v, v, v) }
    val base = p6(w, h, gradient(x => math.min(255, x * 4)))
    // one column nudged slightly: visually near-identical, byte-different
    val near = p6(w, h, gradient(x =>
      if (x == 63) 250 else math.min(255, x * 4)))
    val inverted = p6(w, h, gradient(x => 255 - math.min(255, x * 4)))
    val blobs = Seq((1L, base), (2L, near), (3L, inverted),
      (4L, "not an image".getBytes)).toDF("doc_id", "payload")
    val pairs = Multimodal.imageNearDupDecoded(spark, blobs)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) === Set((1L, 2L)))
    val rows = Multimodal.phashDecodedOf(spark, blobs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getInt(1) === w && rows(1L).getInt(2) === h)
    assert(rows(4L).isNullAt(1) && rows(4L).isNullAt(3))
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

  test("WAV round trip: the RIFF parser recovers the exact PCM through " +
      "the odd-sized junk chunk, and rejects poison") {
    Seq(0L, 3L, 41L, 1234L).foreach { id =>
      val clip = Multimodal.parseWav(Multimodal.synthWav(id))
        .getOrElse(fail(s"clip $id did not parse"))
      assert(clip.sampleRate === Multimodal.WavSampleRate)
      assert(clip.channels === 1 && clip.bitsPerSample === 8)
      assert(clip.samples.length === Multimodal.wavSampleCount(id))
      clip.samples.zipWithIndex.foreach { case (b, i) =>
        assert((b & 0xff) === Multimodal.wavSample(id, i.toLong))
      }
    }
    val good = Multimodal.synthWav(7L)
    // poison inputs: None, never a throw
    assert(Multimodal.parseWav(null) === None)
    assert(Multimodal.parseWav(Array.empty[Byte]) === None)
    assert(Multimodal.parseWav(good.take(40)) === None) // truncated data
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Multimodal.parseWav(badMagic) === None)
    // a declared chunk size running past the buffer must not read OOB
    val badSize = good.clone()
    badSize(16) = 0x7f // fmt size low byte blown up
    assert(Multimodal.parseWav(badSize) === None)
  }

  test("audio frame features match a sequential recompute over the " +
      "parsed samples") {
    val got = Multimodal.audioFeatures(spark, sfDir).collect()
    assert(got.nonEmpty)
    val byDoc = got.groupBy(_.getLong(0))
    val docIds = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(byDoc.keySet === docIds.toSet)
    docIds.take(20).foreach { id =>
      val smp = Multimodal.parseWav(Multimodal.synthWav(id)).get.samples
      val frames = byDoc(id).sortBy(_.getInt(1))
      val F = Multimodal.WavFrameLen
      assert(frames.length === (smp.length + F - 1) / F)
      frames.foreach { r =>
        val lo = r.getInt(1) * F
        val c = smp.slice(lo, math.min(lo + F, smp.length))
          .map(b => (b & 0xff) - 128)
        assert(r.getLong(2) === c.length.toLong)
        assert(r.getLong(3) === c.map(x => x.toLong * x).sum)
        assert(r.getLong(4) === c.map(x => math.abs(x).toLong).max)
        val zc = c.toSeq.sliding(2).count {
          case Seq(p, x) => (x >= 0) != (p >= 0)
          case _         => false
        }
        assert(r.getLong(5) === zc.toLong)
        assert(r.getInt(6) === Multimodal.WavSampleRate)
      }
    }
  }
}
