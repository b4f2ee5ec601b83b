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
    // spread BEFORE the broadcast join: kept is broadcast, so the regex
    // scrub downstream would otherwise inherit the scan's single local
    // partition and run 1-core
    val redacted = graft.Tables.spread(graft.Tables.documents(s, d), col("doc_id"))
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

  // ---------- sequence packing (concatenate-and-cut) ----------

  /** Tokens per packed training sequence / number of independent packing
    * shards. Shards bound the sequential region: the running token offset
    * is a per-shard window, so parallelism equals the shard count and no
    * global single-partition sort ever exists.
    */
  val PackSeqLen = 128
  val PackShards = 8

  /** GPT-style sequence packing: concatenate every document's token stream
    * in a deterministic order and cut it into fixed-[[PackSeqLen]] training
    * sequences, emitting the packing MANIFEST a training loader consumes —
    * one row per (document × sequence it lands in), with the span's offset
    * inside the document (`doc_off`), its offset inside the sequence
    * (`seq_off`), and its length. A document longer than a sequence simply
    * straddles several rows; no padding, no token dropped (the classic
    * "concat-then-chunk" packing that wastes zero compute on pad tokens).
    *
    * Layout: documents are first split into [[PackShards]] independent
    * streams (`doc_id % PackShards` here — dense demo ids; production
    * would use any uniform hash, which changes the shard key, not the
    * shape). Within a shard the token offset of each document is a running
    * sum over `doc_id` order — ONE window per shard, evaluated in a single
    * pass after ONE shuffle on `shard`. At 100 TB: shard count scales with
    * the cluster (each shard's window is a linear scan of its own docs),
    * and the manifest is pure integer arithmetic on (offset, n_tok) — the
    * text itself never moves; the loader fetches it by doc_id at training
    * time. The alternative (a global offset via two-phase partial sums)
    * buys nothing: packing across shard boundaries has no training
    * semantics, since sequence boundaries are arbitrary cut points anyway.
    *
    * All derivations are integer multiply/divide on non-negative operands
    * — bit-exact on both engines by construction.
    */
  def packSequences(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = PackSeqLen.toLong
    val docs = graft.Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        (col("doc_id") % PackShards).as("shard"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("seq_id",
        explode(sequence(expr(s"off DIV ${L}L"),
          expr(s"(off + n_tok - 1) DIV ${L}L"))))
      .select(col("shard"), col("seq_id"), col("doc_id"),
        greatest(lit(0L), col("seq_id") * L - col("off")).as("doc_off"),
        col("off"), col("n_tok"))
      .select(col("shard"), col("seq_id"), col("doc_id"), col("doc_off"),
        (col("off") + col("doc_off") - col("seq_id") * L).as("seq_off"),
        (least(col("n_tok"), (col("seq_id") + 1) * L - col("off"))
          - col("doc_off")).as("span_len"))
      .orderBy(col("shard"), col("seq_id"), col("doc_id"))
  }

  val packSequencesSql: String = {
    val L = PackSeqLen
    s"""WITH d AS (
       |  SELECT doc_id, doc_id % $PackShards AS shard,
       |         len(string_split(text, ' ')) AS n_tok
       |  FROM documents WHERE text IS NOT NULL),
       |o AS (
       |  SELECT doc_id, shard, n_tok,
       |         CAST(COALESCE(SUM(n_tok) OVER (
       |           PARTITION BY shard ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS BIGINT) AS off
       |  FROM d),
       |x AS (
       |  SELECT shard, doc_id, n_tok, off,
       |         unnest(range(off // $L, (off + n_tok - 1) // $L + 1))
       |           AS seq_id
       |  FROM o),
       |sp AS (
       |  SELECT shard, seq_id, doc_id,
       |         greatest(0, seq_id * $L - off) AS doc_off, off, n_tok
       |  FROM x)
       |SELECT shard, seq_id, doc_id, doc_off,
       |       off + doc_off - seq_id * $L AS seq_off,
       |       least(n_tok, (seq_id + 1) * $L - off) - doc_off AS span_len
       |FROM sp ORDER BY shard, seq_id, doc_id""".stripMargin
  }

  // ---------- leakage-free train/val/test split ----------

  /** Deterministic 80/10/10 train/val/test assignment at CONTENT-GROUP
    * granularity: all documents sharing a byte-identical text (the md5
    * content key) draw ONE split coin — keyed by the group's minimum
    * doc_id through the same multiplicative-hash coin the samplers use —
    * so an exact duplicate can never straddle train and test. Splitting
    * per-document is the classic eval-contamination bug this operator
    * exists to prevent; the report carries the audit column
    * (`n_leaky_groups`, content groups spanning >1 split) that proves
    * the invariant in-row, where the hash gate checks it.
    *
    * Shape: one window over the md5 key (32-byte shuffle key, text stays
    * in place) to tag each doc with its group representative, a narrow
    * coin map, then a tiny (source × split) rollup; the leak audit folds
    * the same tagged rows to a 1-row broadcast. No driver state; the
    * assignment is reproducible at any parallelism and across reruns —
    * the property a resumable dataset build needs.
    */
  def splitLeakfree(s: SparkSession, d: String): DataFrame = {
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("content_key"))
    val tagged = graft.Tables.documents(s, d)
      .select(col("doc_id"), col("source"), md5(col("text")).as("content_key"))
      .withColumn("rep_id", min(col("doc_id")).over(wg))
      .withColumn("coin", TextAnalysis.coinOf(col("rep_id")))
      .withColumn("split",
        when(col("coin") < 80, "train")
          .when(col("coin") < 90, "val").otherwise("test"))
    // The audit is a second pass by construction: it needs the global
    // per-group distinct-split count, which no (source, split) rollup can
    // supply (a content group may legitimately span sources). Both passes
    // shuffle only (md5, ids, labels) rows — ~50 bytes/doc, the text
    // column never leaves its scan — so at corpus scale each pass costs
    // one narrow-row exchange, not a document-body shuffle. (A shared-
    // subtree formulation was tried: RemoveRedundantAggregates collapses
    // the audit's aggregate and re-prunes `source`, so ReuseExchange
    // cannot be made to serve both branches declaratively.)
    val leaky = tagged.groupBy(col("content_key"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .agg(coalesce(sum((col("n_splits") > 1L).cast("long")), lit(0L))
        .as("n_leaky_groups"))
    tagged.groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("content_key")).as("n_groups"))
      .crossJoin(broadcast(leaky))
      .orderBy(col("source"), col("split"))
  }

  val splitLeakfreeSql: String = {
    val coin = TextAnalysis.coinOfSql("rep_id")
    s"""WITH tagged AS (
       |  SELECT doc_id, source, md5(text) AS content_key,
       |         MIN(doc_id) OVER (PARTITION BY md5(text)) AS rep_id
       |  FROM documents
       |), coined AS (
       |  SELECT *, CASE WHEN $coin < 80 THEN 'train'
       |                 WHEN $coin < 90 THEN 'val'
       |                 ELSE 'test' END AS split
       |  FROM tagged
       |), leaky AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END),
       |           0) AS BIGINT) AS n_leaky_groups
       |  FROM (SELECT content_key, COUNT(DISTINCT split) AS n_splits
       |        FROM coined GROUP BY content_key)
       |)
       |SELECT source, split, COUNT(*) AS n_docs,
       |       CAST(COUNT(DISTINCT content_key) AS BIGINT) AS n_groups,
       |       leaky.n_leaky_groups
       |FROM coined CROSS JOIN leaky
       |GROUP BY source, split, leaky.n_leaky_groups
       |ORDER BY source, split""".stripMargin
  }

  /** Merge budget for BPE vocabulary induction. */
  val BpeMerges = 30

  /** BPE tokenizer TRAINING (vocabulary induction) — the canonical
    * LLM-pipeline operator the text family's pre-token counting
    * (TextAnalysis.tokenCount) stops short of: iterative merge-pair
    * induction à la Sennrich BPE. Corpus words collapse to a
    * freq-weighted DISTINCT-word table first (the one row-scaled
    * aggregate — at 100 TB the vocabulary is language-bounded, many
    * orders smaller than the corpus), then [[BpeMerges]] iterations of:
    * freq-weighted adjacent-symbol-pair count → top-1 merge
    * (deterministic tie-break: count desc, left, right) → apply. The
    * loop is driver-bounded (the PageRank discipline: iteration count
    * fixed, per-iteration collect is ONE row of merge metadata — the
    * documented catalog-read exception) and each iteration
    * localCheckpoints the vocab-sized word table so plan depth stays
    * O(1) instead of O(iterations).
    *
    * Symbol sequences ride as `<s1><s2>…` delimited STRINGS, because
    * greedy left-to-right merge application is then ONE
    * `replace(enc, '<l><r>', '<lr>')` — non-overlapping left-to-right
    * replacement is exactly BPE's merge semantics, and the identical
    * builtin exists in DuckDB, which is what makes the 30-iteration
    * unrolled oracle possible. Delimiters can't collide: pre-tokens are
    * `[a-z]+` runs, so no symbol ever contains `<` or `>`.
    *
    * Output: the learned merge table (rank, lhs, rhs, merged,
    * pair_count). Merge-count conservation (initial symbols − final
    * symbols = Σ pair_count, freq-weighted) is pinned in CorpusOpsSpec.
    */
  def bpeVocab(s: SparkSession, d: String): DataFrame = {
    val (merges, _) = bpeTrained(s, d)
    import s.implicits._
    merges.toDF("rank", "lhs", "rhs", "pair_count")
      .select(col("rank"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("pair_count"))
      .orderBy(col("rank"))
  }

  /** Tokenizer APPLICATION — the other half of the BPE story: encode the
    * corpus with the TRAINED vocabulary and report each document's token
    * count under it (the number every data-mixture / packing / budget
    * decision keys on). The trained word→segmentation table is
    * vocabulary-sized and BROADCASTS into the exploded token stream (the
    * tokenizer is shipped to the data, the same move every training
    * pipeline makes — a shuffle join would move the corpus-sized token
    * stream instead), so the row-scaled work is one narrow explode +
    * broadcast join + map-side-combined doc aggregate. Training state is
    * memoized per dataset (the GraphOps nodeTable discipline), so
    * vocab + encode together pay the 30-round induction once.
    */
  def bpeEncode(s: SparkSession, d: String): DataFrame = {
    val (_, words) = bpeTrained(s, d)
    val lens = words.select(col("word"),
      size(expr("regexp_extract_all(enc, '<([^>]+)>', 1)"))
        .cast("long").as("n_tok"))
    graft.Tables.documents(s, d)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("word"))
      .join(broadcast(lens), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  private val bpeCache = scala.collection.mutable.HashMap[
    String, (Seq[(Long, String, String, Long)], DataFrame)]()

  /** Trained BPE state, memoized per dataset dir (training is
    * deterministic, so the induction runs once per JVM however many
    * queries consume it).
    */
  private[graft] def bpeTrained(s: SparkSession, d: String)
      : (Seq[(Long, String, String, Long)], DataFrame) =
    CorpusPipeline.synchronized {
      bpeCache.getOrElseUpdate(new java.io.File(d).getCanonicalPath,
        bpeTrain(s, initialBpeWords(s, d), BpeMerges))
    }

  /** Freq-weighted distinct-word table, symbols delimiter-encoded. */
  private[graft] def initialBpeWords(s: SparkSession, d: String): DataFrame =
    graft.Tables.documents(s, d)
      .select(explode(expr("regexp_extract_all(text, '[a-z]+', 0)"))
        .as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .select(col("word"),
        regexp_replace(col("word"), "(.)", "<$1>").as("enc"),
        col("freq"))

  /** The induction loop, shared with the spec (which needs the FINAL
    * word table for the conservation check). Returns (merges, words):
    * merges as (rank, lhs, rhs, pair_count), words still encoded.
    */
  private[graft] def bpeTrain(s: SparkSession, words: DataFrame,
      budget: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    // size the iteration partitioning to the VOCAB, not the corpus: the
    // distinct-word table is language-bounded (thousands at demo scale,
    // millions for web text), so iterating at the corpus's 32-partition
    // shuffle width pays 30 × 32 near-empty tasks. One count (off the
    // about-to-be-checkpointed frame) picks ~50k words/partition,
    // growing with a real vocabulary — the GraphOps broadcast-gate
    // discipline applied to partition width.
    val nWords = words.count()
    val parts = math.max(1L, math.min(
      s.sparkContext.defaultParallelism.toLong, nWords / 50000L + 1)).toInt
    var w = words.repartition(parts, col("enc")).localCheckpoint()
    // the loop's queries are vocab-sized and fixed-shape; AQE's per-stage
    // re-optimization only adds scheduling rounds to each of the 30
    // barriers (exact BPE is inherently round-synchronized — the cost
    // model is rounds × stage latency, not rows), so it is off for the
    // loop and restored after
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeSaved = s.conf.getOption(aqeKey)
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var i = 1
    var exhausted = false
    // plan-depth vs job-count trade: a checkpoint every iteration doubles
    // the job count for a table that re-derives in microseconds; every
    // CkEvery keeps lineage ≤ CkEvery cheap replaces deep and halves the
    // per-iteration latency floor
    val CkEvery = 6
    var sinceCk = 0
    s.conf.set(aqeKey, "false")
    try while (i <= budget && !exhausted) {
      val top = w
        .select(col("freq"),
          expr("regexp_extract_all(enc, '<([^>]+)>', 1)").as("s"))
        .filter(size(col("s")) >= 2) // sequence(1,0) is DESCENDING in Spark
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(s) - 1), " +
            "i -> struct(element_at(s, i) AS l, element_at(s, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((i.toLong, l, r, c))
        // symbols are [a-z]+ — safe to inline into the expression
        w = w.select(col("word"),
          expr(s"replace(enc, '<$l><$r>', '<$l$r>')").as("enc"),
          col("freq"))
        sinceCk += 1
        if (sinceCk == CkEvery) { w = w.localCheckpoint(); sinceCk = 0 }
        i += 1
      }
    } finally aqeSaved match {
      case Some(v) => s.conf.set(aqeKey, v)
      case None    => s.conf.unset(aqeKey)
    }
    (merges.toSeq, w)
  }

  /** The 30-iteration induction UNROLLED as one DuckDB CTE chain —
    * (pair count → top-1 → apply) × [[BpeMerges]], byte-identical merge
    * semantics via the same non-overlapping `replace`. MATERIALIZED is
    * load-bearing: inlined CTEs would expand the w-chain exponentially.
    * Shared by the vocab and encode oracles.
    */
  private val bpeCtesSql: String = {
    val w0 =
      """w0 AS MATERIALIZED (
        |  SELECT word, regexp_replace(word, '(.)', '<\1>', 'g') AS enc,
        |         CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS word
        |        FROM documents)
        |  GROUP BY 1, 2)""".stripMargin
    val iters = (1 to BpeMerges).flatMap { i =>
      Seq(
        s"""p$i AS MATERIALIZED (
           |  SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt
           |  FROM (
           |    SELECT freq, s[i] AS l, s[i+1] AS r
           |    FROM (SELECT freq, regexp_extract_all(enc, '<([^>]+)>', 1) AS s
           |          FROM w${i - 1}),
           |         unnest(generate_series(1, len(s)-1)) AS u(i))
           |  GROUP BY 1, 2)""".stripMargin,
        s"""m$i AS MATERIALIZED (
           |  SELECT CAST($i AS BIGINT) AS rank, l, r, cnt FROM p$i
           |  ORDER BY cnt DESC, l, r LIMIT 1)""".stripMargin,
        s"""w$i AS MATERIALIZED (
           |  SELECT word,
           |         replace(enc, '<'||l||'><'||r||'>', '<'||l||r||'>') AS enc,
           |         freq
           |  FROM w${i - 1}, m$i)""".stripMargin)
    }
    "WITH " + (w0 +: iters).mkString(",\n")
  }

  val bpeVocabSql: String = {
    val unions = (1 to BpeMerges).map(i =>
      s"SELECT rank, l AS lhs, r AS rhs, l||r AS merged, cnt AS pair_count " +
        s"FROM m$i").mkString("\nUNION ALL\n")
    bpeCtesSql + "\n" + unions + "\nORDER BY rank"
  }

  val bpeEncodeSql: String =
    s"""$bpeCtesSql,
       |lens AS MATERIALIZED (
       |  SELECT word,
       |         CAST(len(regexp_extract_all(enc, '<([^>]+)>', 1)) AS BIGINT)
       |           AS n_tok
       |  FROM w$BpeMerges),
       |toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+')) AS word
       |  FROM documents)
       |SELECT doc_id, COUNT(*) AS n_words,
       |       CAST(SUM(n_tok) AS BIGINT) AS bpe_tokens
       |FROM toks JOIN lens USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
