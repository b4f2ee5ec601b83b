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
  def corpusBuild(s: SparkSession, d: String): DataFrame = {
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
      .orderBy(col("doc_id"))
  }

  val corpusBuildSql: String = {
    // quality 'drop' is exactly n_words < 20 (qualityScoreSql's CASE);
    // a NULL text falls through Spark's CASE to 'keep', so the inlined
    // predicate must also pass NULLs — hence the explicit IS NULL arm
    s"""WITH pairs AS (${Dedup.ngramPairsSql}),
       |losers AS (SELECT DISTINCT d2 AS doc_id FROM pairs)
       |SELECT doc_id, lang,
       |       ${TextAnalysis.sampleCoinSql} AS coin
       |FROM documents
       |WHERE (text IS NULL OR len(string_split(text, ' ')) >= 20)
       |  AND doc_id NOT IN (SELECT doc_id FROM losers)
       |  AND ${TextAnalysis.sampleCoinSql} < ${TextAnalysis.sampleQuotaSql}
       |ORDER BY doc_id""".stripMargin
  }
}
