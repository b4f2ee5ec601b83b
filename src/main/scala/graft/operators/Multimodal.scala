package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, batch "decode"/feature-extraction over partitions.
  *
  * This container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic STUB (`decodeStub`) — but everything Spark
  * cares about is real: the binary column, the metadata struct schema, the
  * partition-batched extraction path (`mapPartitions` over an Iterator — the
  * Scala analogue of a pandas-batch UDF: amortize per-batch init like model
  * load across a whole partition), and the downstream relational plumbing.
  *
  * At 100 TB the decode path dominates; the design keeps it embarrassingly
  * parallel (no shuffle before feature extraction) and prunes the binary
  * column as early as possible afterward.
  */
object Multimodal {

  /** Blob table derived from documents: payload bytes + metadata struct —
    * the schema shape of an image/audio dataset (payload, format, dims).
    */
  def blobTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("doc_id") % 48 + 1).cast("int").as("height")).as("meta"))

  /** Feature row produced by the batch extractor. */
  case class BlobFeatures(doc_id: Long, n_bytes: Long, header_byte: Long,
      checksum: Long)

  /** STUB decoder: stands in for an image/audio decode. Deterministic pure
    * function of the bytes so tests and the oracle can pin it; a real
    * deployment swaps only this function body for e.g. a JNI codec call.
    */
  def decodeStub(payload: Array[Byte]): (Long, Long) = {
    var sum = 0L
    var i   = 0
    while (i < payload.length) { sum = (sum * 31 + (payload(i) & 0xff)) % 1000000007L; i += 1 }
    val header = if (payload.isEmpty) 0L else (payload(0) & 0xff).toLong
    (header, sum)
  }

  /** Partition-batched feature extraction: one decoder instance per
    * partition (the `init` line), then a streaming pass over the iterator —
    * never materializes a partition in memory.
    */
  def extractFeatures(s: SparkSession, blobs: DataFrame): DataFrame = {
    import s.implicits._
    val pruned = blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    pruned.mapPartitions { it =>
      // per-partition init would go here (codec/model load) — amortized
      it.map { case (id, bytes) =>
        val (header, sum) = decodeStub(bytes)
        BlobFeatures(id, bytes.length.toLong, header, sum)
      }
    }.toDF()
  }

  /** The oracle-checkable slice of the multimodal path: byte length, header
    * byte, and rolling checksum of the payload, joined back to metadata.
    * (checksum ≡ TextAnalysis.fingerprint, since the stub payload is the
    * utf-8 text — which is what makes the stub oracle-expressible.)
    *
    * Precondition the oracle depends on: document text is ASCII (true of
    * the testdata), so byte length == char length and the per-byte fold ==
    * the oracle's per-character fold. A real media payload has no text
    * oracle at all — the decode side would be pinned by golden outputs
    * instead, and the Spark-side plumbing here is unchanged by that swap.
    */
  def blobMeta(s: SparkSession, d: String): DataFrame = {
    val feats = extractFeatures(s, blobTable(s, d))
    feats.join(blobTable(s, d).select(col("doc_id"), col("meta.width"),
        col("meta.height")), Seq("doc_id"))
      .select(col("doc_id"), col("n_bytes"), col("header_byte"),
        col("checksum"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .orderBy(col("doc_id"))
  }

  val blobMetaSql: String =
    """SELECT doc_id,
      |       CAST(length(text) AS BIGINT) AS n_bytes,
      |       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS header_byte,
      |       list_reduce(list_prepend(CAST(0 AS BIGINT),
      |         list_transform(range(1, length(text) + 1),
      |           i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
      |         (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum,
      |       CAST(n_chars % 64 + 1 AS BIGINT) AS width,
      |       CAST(doc_id % 48 + 1 AS BIGINT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin
}
