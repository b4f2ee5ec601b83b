package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Document deduplication for LLM training-data pipelines, over the
  * `documents` table: exact (hash groupBy), n-gram Jaccard (inverted-index
  * candidate join), MinHash+LSH (band bucketing), and SimHash (bit-sampled
  * hamming buckets). The testdata plants near-duplicate pairs (docs sharing
  * ~99% of shingles, tagged with a rare `dup` token), so these queries
  * return real clusters.
  *
  * Scale design (the 100 TB story):
  *  - exact dedup: one shuffle on a 128-bit content hash — optimal.
  *  - n-gram Jaccard: the candidate join explodes doc×shingle (inverted
  *    index) and self-joins per shingle. Exact, but the per-shingle bucket
  *    join is quadratic in bucket size — safe here (uniform vocabulary,
  *    buckets ≈ a few docs), and the honest scale path is MinHash below.
  *  - MinHash/LSH: per-doc signature is a narrow map (64 hashes folded in
  *    one pass over the shingle array); only band keys shuffle. Candidate
  *    volume is controlled by band size (r=4, b=16 → P(collide)≈J⁴
  *    amplified over 16 bands), then candidates are verified exactly.
  *  - SimHash: 64-bit signature; hamming-≤k retrieval via 4×16-bit band
  *    exact-match buckets (pigeonhole: hamming ≤3 ⇒ ≥1 of 4 bands equal).
  */
object Dedup {

  // ---------- shared shingling ----------

  /** Distinct word-3-shingles per document (empty if <3 tokens). */
  def shingles(text: Column): Column = {
    val toks = split(text, " ")
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))
  }

  private def shingled(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("n_sh", size(col("sh")).cast("long"))

  val JaccardThreshold = 0.8

  // ---------- exact dedup ----------

  /** Exact dedup: group by md5 content hash, keep min doc_id (deterministic
    * keeper), count members. One shuffle on the hash.
    */
  def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("text_hash"))

  val exactSql: String =
    """SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_id,
      |       COUNT(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin

  // ---------- n-gram Jaccard (exact, inverted-index join) ----------

  /** Near-dup pairs by exact 3-gram Jaccard ≥ 0.8. Candidates come from an
    * inverted index (explode shingle → self-join per shingle → count of
    * shared shingles per pair), so only docs sharing ≥1 shingle are ever
    * paired — never the full N² cross join.
    */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    val sh    = shingled(s, d)
    val index = sh.select(col("doc_id"), col("n_sh"),
      explode(col("sh")).as("shingle"))
    val a = index.select(col("doc_id").as("d1"), col("n_sh").as("n1"),
      col("shingle"))
    val b = index.select(col("doc_id").as("d2"), col("n_sh").as("n2"),
      col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("n1") + col("n2") - col("common")).cast("double"))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("d1"), col("d2"), col("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  /** Quadratic reference formulation — fine at oracle scale (500 docs),
    * which is exactly why the Spark side above uses the inverted index
    * instead: the oracle states WHAT, the engine shows HOW at scale.
    */
  val ngramJaccardSql: String =
    s"""WITH s AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(
       |           range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
       |           i -> string_split(text, ' ')[i] || ' ' ||
       |                string_split(text, ' ')[i+1] || ' ' ||
       |                string_split(text, ' ')[i+2])) AS sh
       |  FROM documents)
       |SELECT a.doc_id AS d1, b.doc_id AS d2,
       |       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |         CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
       |FROM s a, s b
       |WHERE a.doc_id < b.doc_id
       |  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |        CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      >= $JaccardThreshold
       |ORDER BY d1, d2""".stripMargin

  // ---------- MinHash + LSH ----------

  val NumHashes = 64
  val Bands     = 16
  val RowsPerBand = NumHashes / Bands // 4
  private val P = 2147483647L // 2^31 - 1, Mersenne prime

  /** 64-wide MinHash signature: base-hash each shingle once (xxhash64,
    * reduced into 31-bit space so the affine permutations below never
    * overflow a signed 64-bit long — Spark 4 runs ANSI arithmetic), then
    * apply 64 affine permutations and take per-permutation minima. The
    * permutation index is a compile-time constant, so each lane is a static
    * codegen'd expression — one fused pass over the shingle array.
    */
  def minhashSignature(sh: Column): Column =
    array((0 until NumHashes).map { i =>
      array_min(transform(sh, t => {
        val h0 = pmod(xxhash64(t), lit(P))
        pmod(h0 * lit(i * 2L + 1L) + lit(i * 40503L + 17L), lit(P))
      }))
    }: _*)

  /** The 16 LSH band keys of a signature (hash of 4 consecutive lanes). */
  def bandKeys(sig: Column): Column =
    array((0 until Bands).map { b =>
      hash(slice(sig, b * RowsPerBand + 1, RowsPerBand), lit(b))
    }: _*)

  /** Per-document signatures + band keys (rows-only check: sketch internals
    * aren't portable SQL; correctness is pinned by DedupSpec instead).
    */
  def minhashSignatures(s: SparkSession, d: String): DataFrame =
    shingled(s, d)
      .filter(col("n_sh") > 0)
      .withColumn("sig", minhashSignature(col("sh")))
      .select(col("doc_id"), col("n_sh"),
        hash(col("sig")).cast("long").as("sig_hash"),
        bandKeys(col("sig")).as("band_keys"))
      .orderBy(col("doc_id"))

  /** MinHash/LSH near-dup pairs: band-bucket candidates, then verify the
    * exact Jaccard on shingle sets. With r=4,b=16 a true pair at J=0.8 is
    * missed with probability (1-0.8⁴)^16 ≈ 2·10⁻⁴, and the planted dups sit
    * at J≈0.99 — so the verified output equals the exact ngramJaccard result
    * and shares its oracle.
    */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    val sh  = shingled(s, d).filter(col("n_sh") > 0)
      .withColumn("sig", minhashSignature(col("sh")))
    val banded = sh.select(col("doc_id"), posexplode(bandKeys(col("sig"))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val sets = sh.select(col("doc_id"), col("sh"), col("n_sh"))
    cand
      .join(sets.select(col("doc_id").as("d1"), col("sh").as("sh1"),
        col("n_sh").as("n1")), Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("sh").as("sh2"),
        col("n_sh").as("n2")), Seq("d2"))
      .withColumn("common", size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("n1") + col("n2") - col("common")).cast("double"))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("d1"), col("d2"), col("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over the token multiset: per token-hash, each bit
    * contributes ±1 to its lane; the signature takes the sign of each lane.
    * Expressed as one aggregate over a 64-long lane array — single pass,
    * no shuffle.
    */
  def simhashBits(text: Column): Column = {
    val toks  = split(text, " ")
    val lanes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        val tokenBits = array((0 until 64).map { i =>
          when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)
        }: _*)
        zip_with(acc, tokenBits, (a, b) => a + b)
      })
    transform(lanes, l => when(l > 0, 1L).otherwise(0L))
  }

  /** Pack bit lanes into 4×16-bit band keys for hamming-bucket retrieval. */
  private def simhashBands(bits: Column): Column =
    array((0 until 4).map { b =>
      (0 until 16).map { k =>
        element_at(bits, b * 16 + k + 1) * lit(1L << k)
      }.reduce(_ + _)
    }: _*)

  /** SimHash near-dup pairs with hamming distance ≤ 6: candidates from
    * 16-bit band equality (pigeonhole guarantees recall for hamming ≤ 3;
    * planted near-dups land well inside that), verified by exact popcount
    * of the XOR. Rows-only check (xxhash64 isn't portable SQL); DedupSpec
    * pins semantics.
    */
  def simhashPairs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), simhashBits(col("text")).as("bits"))
      .withColumn("bands", simhashBands(col("bits")))
    val banded = docs.select(col("doc_id"), col("bits"),
      posexplode(col("bands"))).select(col("doc_id"), col("bits"),
      col("pos").as("band"), col("col").as("bkey"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("x.bits").as("bits1"),
        col("y.doc_id").as("d2"), col("y.bits").as("bits2"))
      .distinct()
    cand
      .withColumn("hamming",
        aggregate(zip_with(col("bits1"), col("bits2"),
          (a, b) => when(a =!= b, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x))
      .filter(col("hamming") <= 6)
      .select(col("d1"), col("d2"), col("hamming"))
      .orderBy(col("d1"), col("d2"))
  }
}
