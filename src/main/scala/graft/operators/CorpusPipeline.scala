package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** The LLM-training-data pipeline end to end, as ONE composed query:
  * quality filter → near-duplicate removal → stratified sampling. This is
  * the capstone the individual operators exist for — a corpus build that
  * at 100 TB runs as: one narrow quality scan, one bucketed inverted-index
  * dedup (no all-pairs), one broadcast-able anti join of the loser set,
  * one narrow deterministic-coin filter. Every stage is the same code the
  * standalone queries run, so each piece stays individually oracle-checked
  * while the composition is oracle-checked as a whole.
  */
object CorpusPipeline {

  /** Kept corpus: documents that (1) survive the quality gate
    * (`quality != 'drop'`), (2) are not near-duplicate "losers" (any doc
    * appearing as the greater id of an exact-Jaccard pair — the min-id
    * cluster representative survives), and (3) land under their language's
    * sampling quota. Output: (doc_id, lang, coin), ordered.
    */
  def corpusBuild(s: SparkSession, d: String): DataFrame =
    keptCorpus(s, d).orderBy(col("doc_id"))

  /** The kept set (doc_id, lang, coin) without the presentation sort —
    * shared by [[corpusBuild]] and the shard pipeline below.
    */
  private def keptCorpus(s: SparkSession, d: String): DataFrame = {
    val quality = TextAnalysis.qualityScored(s, d)
      .filter(col("quality") =!= "drop")
      .select(col("doc_id"), col("lang"))
    // unsorted pair set: the losers feed a distinct + anti join, which
    // would just re-shuffle away ngramJaccard's presentation sort
    val losers = Dedup.ngramPairs(s, d)
      .select(col("d2").as("doc_id")).distinct()
    quality
      .join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.sampleCoin.as("coin"))
      .filter(col("coin") < TextAnalysis.sampleQuota)
  }

  // quality 'drop' is exactly n_words < 20 (qualityScoreSql's CASE);
  // a NULL text falls through Spark's CASE to 'keep', so the inlined
  // predicate must also pass NULLs — hence the explicit IS NULL arm.
  // ONE definition shared by corpusBuildSql and corpusShardsSql so a
  // gate/quota fix cannot desynchronize the two oracles (expects a
  // `losers` CTE in scope).
  private val keptPredicateSql: String =
    s"""(text IS NULL OR len(string_split(text, ' ')) >= 20)
       |  AND doc_id NOT IN (SELECT doc_id FROM losers)
       |  AND ${TextAnalysis.sampleCoinSql} < ${TextAnalysis.sampleQuotaSql}""".stripMargin

  val corpusBuildSql: String =
    s"""WITH pairs AS (${Dedup.ngramPairsSql}),
       |losers AS (SELECT DISTINCT d2 AS doc_id FROM pairs)
       |SELECT doc_id, lang,
       |       ${TextAnalysis.sampleCoinSql} AS coin
       |FROM documents
       |WHERE $keptPredicateSql
       |ORDER BY doc_id""".stripMargin

  /** The shard step the kept corpus feeds: scrub PII from each kept
    * document, then window it into training-ready chunks, `lang` riding
    * along for downstream mixture weighting. Composition shape at 100 TB:
    * the kept-id set (already the product of one bucketed dedup + narrow
    * gates) joins back to the text ONCE (ids-only until this point), then
    * everything after is narrow per-row work — regex scrub, tokenize,
    * windowed slice — so the shard build adds zero shuffles beyond the
    * kept-id join itself.
    */
  def corpusShards(s: SparkSession, d: String): DataFrame = {
    val kept = keptCorpus(s, d).select(col("doc_id"))
    val redacted = graft.Tables.documents(s, d)
      .join(kept, Seq("doc_id"))
      .select(col("doc_id"), col("lang"),
        TextAnalysis.scrubPii(col("text")).as("text"))
    TextAnalysis.chunkOf(redacted, Seq("lang"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val corpusShardsSql: String =
    s"""WITH pairs AS (${Dedup.ngramPairsSql}),
       |losers AS (SELECT DISTINCT d2 AS doc_id FROM pairs),
       |kept AS (
       |  SELECT doc_id FROM documents
       |  WHERE $keptPredicateSql),
       |red AS (
       |  SELECT doc_id, lang, ${TextAnalysis.scrubPiiSql("text")} AS text
       |  FROM documents WHERE doc_id IN (SELECT doc_id FROM kept)),
       |${TextAnalysis.chunkCtesSql("red", ", lang")}""".stripMargin
}
