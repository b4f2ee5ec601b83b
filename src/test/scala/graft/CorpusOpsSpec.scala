package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{CorpusPipeline, Dedup, EtlQueries}

/** Pins the round-5 corpus operators on synthetic documents with known
  * structure: sliding-window chunking (coverage + tail absorption),
  * repetition scoring (hand-computed fractions), train/eval benchmark
  * decontamination (cross-split pairs only), and the ORC sink/scan
  * round-trip (content-transparent vs the parquet source).
  */
class CorpusOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(n: Int, prefix: String = "w"): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("chunkDocs: short doc is one full-coverage chunk") {
    val dir = writeDocs(Seq((1L, words(10))))
    val out = TextAnalysis.chunkDocs(spark, dir).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("chunk_idx") === 0L)
    assert(out.head.getAs[Long]("n_tokens") === 10L)
    assert(out.head.getAs[String]("chunk_text") === words(10))
  }

  test("chunkDocs: window boundary and stride tail absorption") {
    val W = TextAnalysis.ChunkTokens   // 64
    val S = TextAnalysis.ChunkStride   // 48
    // exactly W tokens -> 1 chunk; W+1 -> 2 chunks (tail starts at S)
    val dir = writeDocs(Seq((1L, words(W)), (2L, words(W + 1))))
    val out = TextAnalysis.chunkDocs(spark, dir)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    assert(out(1L).length === 1)
    assert(out(1L).head.getAs[Long]("n_tokens") === W.toLong)
    assert(out(2L).length === 2)
    val second = out(2L).find(_.getAs[Long]("chunk_idx") == 1L).get
    assert(second.getAs[Long]("n_tokens") === (W + 1 - S).toLong)
    assert(second.getAs[String]("chunk_text").split(" ").head === s"w$S")
    // every token appears in some chunk (coverage)
    val covered = out(2L).flatMap(_.getAs[String]("chunk_text").split(" ")).toSet
    assert(covered === (0 until W + 1).map(i => s"w$i").toSet)
  }

  test("docRepetition: hand-computed fractions and flags") {
    val dir = writeDocs(Seq(
      (1L, "a a a a a"),   // dup 4/5, modal bigram "a a" = 4/4 slots
      (2L, words(10)),     // all distinct, modal bigram 1/9
      (3L, "solo")         // single token: no bigram slots
    ))
    val out = TextAnalysis.docRepetition(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("dup_token_frac") === 0.8)
    assert(out(1L).getAs[Double]("top_bigram_frac") === 1.0)
    assert(out(1L).getAs[Boolean]("repetitive"))
    assert(out(2L).getAs[Double]("dup_token_frac") === 0.0)
    assert(math.abs(out(2L).getAs[Double]("top_bigram_frac") - 1.0 / 9) < 1e-12)
    assert(!out(2L).getAs[Boolean]("repetitive"))
    assert(out(3L).getAs[Double]("dup_token_frac") === 0.0)
    assert(out(3L).getAs[Double]("top_bigram_frac") === 0.0)
    assert(!out(3L).getAs[Boolean]("repetitive"))
  }

  test("decontaminate reports only cross-split near-dup pairs, train side first") {
    val base = "spark reads shuffles joins aggregates sorts filters projects windows streams"
    val dir = writeDocs(Seq(
      (10L, base),             // eval (10 % 10 == 0)
      (1L, base),              // train, exact copy -> contaminated
      (2L, base + " extra"),   // train, near-dup -> contaminated
      (3L, "completely different words about cooking pasta tonight with sauce")
    ))
    val out = Dedup.decontaminate(spark, dir).collect()
    val pairs = out.map(r =>
      (r.getAs[Long]("train_id"), r.getAs[Long]("eval_id"))).toSet
    assert(pairs === Set((1L, 10L), (2L, 10L))) // train-train (1,2) excluded
    assert(out.forall(_.getAs[Double]("jaccard") >= Dedup.JaccardThreshold))
  }

  test("ORC round-trip matches the parquet-side aggregate exactly") {
    val viaOrc = EtlQueries.orcRoundtrip(spark, sfDir).collect().toSeq
    val viaParquet = Tables.documents(spark, sfDir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"), col("source")).collect().toSeq
    assert(viaOrc === viaParquet)
  }

  test("XML round-trip matches the parquet-side aggregate exactly") {
    val viaXml = EtlQueries.xmlRoundtrip(spark, sfDir).collect().toSeq
    val viaParquet = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("source")).collect().toSeq
    assert(viaXml === viaParquet)
  }

  test("piiRedact scrubs every email and phone, counting both in-text " +
      "and appended PII") {
    val dir = writeDocs(Seq(
      (1L, "reach me at alice@example.com or 555-123-4567 thanks"),
      (2L, "no pii in this text at all")))
    val out = TextAnalysis.piiRedact(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: one email + one phone in the text, plus the appended contact
    // line's email + phone
    assert(out(1L).getAs[Long]("n_emails") === 2L)
    assert(out(1L).getAs[Long]("n_phones") === 2L)
    assert(out(2L).getAs[Long]("n_emails") === 1L)
    assert(out(2L).getAs[Long]("n_phones") === 1L)
    out.values.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>"))
      // nothing matching either pattern survives redaction
      assert(TextAnalysis.EmailRe.r.findFirstIn(red).isEmpty)
      assert(TextAnalysis.PhoneRe.r.findFirstIn(red).isEmpty)
    }
  }

  test("tfidf tokenizes the corpus once: the df branch reuses the tf " +
      "exchange") {
    // visible statically only with AQE off (AQE performs the same reuse at
    // runtime via query-stage canonicalization, but the initial plan
    // prints both subtrees); prior value restored in finally — suites run
    // sequentially
    val saved = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextAnalysis.tfidf(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"))
      assert("Generate explode".r.findAllIn(plan).size === 1)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None    => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("corpusShards chunks exactly the kept corpus, bounded windows, " +
      "no surviving PII patterns") {
    val kept = CorpusPipeline.corpusBuild(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val shards = CorpusPipeline.corpusShards(spark, sfDir).collect()
    assert(shards.map(_.getAs[Long]("doc_id")).toSet === kept)
    shards.foreach { r =>
      val t = r.getAs[String]("chunk_text")
      assert(TextAnalysis.EmailRe.r.findFirstIn(t).isEmpty)
      assert(TextAnalysis.PhoneRe.r.findFirstIn(t).isEmpty)
      val n = r.getAs[Long]("n_tokens")
      assert(n >= 1L && n <= TextAnalysis.ChunkTokens.toLong)
      assert(t.split(" ").length.toLong === n)
    }
  }

  test("chunkDedup keeps first occurrence per segment and reconstructs docs") {
    val W = Dedup.SegTokens
    val A = words(W, "a"); val B = words(W, "b"); val C = words(W, "c")
    val dir = writeDocs(Seq(
      (1L, s"$A $B"),   // first occurrence of both segments
      (2L, s"$A $C"),   // A is boilerplate here; C survives
      (3L, s"$A $B")))  // fully boilerplate → NULL text
    val out = Dedup.chunkDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_seg"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text"))).toMap
    assert(out(1L) === ((2L, 2L, s"$A $B")))
    assert(out(2L) === ((2L, 1L, C)))
    assert(out(3L) === ((2L, 0L, null)))
  }

  test("chunkDedup is idempotent: re-running on its own output drops nothing") {
    val dir = writeDocs(Seq(
      (1L, words(Dedup.SegTokens, "a") + " " + words(Dedup.SegTokens, "b")),
      (2L, words(Dedup.SegTokens, "a") + " " + words(Dedup.SegTokens, "c"))))
    val first = Dedup.chunkDedup(spark, dir).collect()
    val dir2 = writeDocs(first.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toSeq)
    Dedup.chunkDedup(spark, dir2).collect().foreach { r =>
      assert(r.getAs[Long]("n_kept") === r.getAs[Long]("n_seg"))
    }
  }

  test("vocabCoverage: deterministic top-V cut and per-doc OOV accounting") {
    val V = TextAnalysis.VocabSize
    val wordsAll = (0 until V + 8).map(i => s"w$i")
    val dir = writeDocs(Seq(
      (1L, wordsAll.mkString(" ")),     // every word once
      (2L, s"w${V + 7} w${V + 7}")))    // boost the lexicographically-last word
    val rows = TextAnalysis.vocabCoverage(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_rate"))).toMap
    // expected vocab: boosted word (count 3) + lexicographically-first V-1
    // of the remaining count-1 words
    val boosted = s"w${V + 7}"
    val vocab = Set(boosted) ++
      wordsAll.filterNot(_ == boosted).sorted.take(V - 1)
    val oov1 = wordsAll.count(!vocab.contains(_)).toLong
    assert(rows(1L) === ((wordsAll.size.toLong, oov1,
      oov1.toDouble / wordsAll.size)))
    assert(rows(2L) === ((2L, 0L, 0.0)))
  }

  test("tfidf ranks rare high-frequency terms above ubiquitous ones") {
    val dir = writeDocs(Seq(
      (1L, "x x x common"),
      (2L, "y common"),
      (3L, "z common")))
    val rows = TextAnalysis.tfidf(spark, dir).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    // rank-1 term is the document-exclusive one (idf N/df = 3 vs 1)
    assert(byDoc(1L).minBy(_.getAs[Long]("rank")).getAs[String]("term") === "x")
    assert(byDoc(2L).minBy(_.getAs[Long]("rank")).getAs[String]("term") === "y")
    // doc 1: score(x) = tf 3 · (3/1) = 9, score(common) = 1 · (3/3) = 1
    val d1 = byDoc(1L).map(r =>
      r.getAs[String]("term") -> r.getAs[Double]("score")).toMap
    assert(d1("x") === 9.0)
    assert(d1("common") === 1.0)
    // ranks are 1..k and scores non-increasing within each document
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ===
        (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getAs[Double]("score")).toSeq
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("packSequences: spans tile every sequence exactly, cover every " +
      "document completely, and no token is dropped or padded") {
    val L = CorpusPipeline.PackSeqLen.toLong
    val spans = CorpusPipeline.packSequences(spark, sfDir).collect()
    // per (shard, seq): spans tile [0, L) contiguously from seq_off 0;
    // only a shard's LAST sequence may stop short (the stream just ends)
    val byShard = spans.groupBy(_.getAs[Long]("shard"))
    byShard.foreach { case (_, rows) =>
      val bySeq  = rows.groupBy(_.getAs[Long]("seq_id"))
      val lastSeq = bySeq.keys.max
      bySeq.foreach { case (seqId, ss) =>
        val sorted = ss.sortBy(_.getAs[Long]("seq_off"))
        assert(sorted.head.getAs[Long]("seq_off") === 0L)
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getAs[Long]("seq_off") + a.getAs[Long]("span_len") ===
              b.getAs[Long]("seq_off"))
          case _ =>
        }
        val filled = sorted.last.getAs[Long]("seq_off") +
          sorted.last.getAs[Long]("span_len")
        if (seqId < lastSeq) assert(filled === L,
          s"interior sequence $seqId filled $filled of $L")
        else assert(filled <= L)
        assert(ss.forall(r => r.getAs[Long]("span_len") > 0))
      }
    }
    // per document: spans are contiguous from doc_off 0 and sum to n_tok
    val nTok = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val byDoc = spans.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === nTok.keySet) // every doc packed, none invented
    byDoc.foreach { case (id, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("doc_off"))
      assert(sorted.head.getAs[Long]("doc_off") === 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("doc_off") + a.getAs[Long]("span_len") ===
            b.getAs[Long]("doc_off"))
        case _ =>
      }
      assert(ss.map(_.getAs[Long]("span_len")).sum === nTok(id))
    }
    // the testdata actually exercises straddling (some doc crosses a cut)
    assert(byDoc.values.exists(_.length > 1))
  }

  test("langMix: exact match with a local reference, rarest language kept " +
      "whole, the head language actually down-sampled") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang").as[(Long, String)].collect()
    val nLang = docs.groupBy(_._2).map { case (l, ds) => l -> ds.length.toLong }
    val nMin = nLang.values.min
    def rate(n: Long): Long =
      math.floor(math.sqrt(nMin.toDouble / n.toDouble) *
        TextAnalysis.MixCoinMod.toDouble).toLong
    def coin(id: Long): Long =
      (((id % 1000003L) * 2654435761L + 40503L) % 999983L) %
        TextAnalysis.MixCoinMod
    val expected = docs.collect {
      case (id, l) if coin(id) < rate(nLang(l)) => id
    }.toSet
    val got = TextAnalysis.langMix(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(got === expected)
    val keptByLang = docs.filter(t => got.contains(t._1))
      .groupBy(_._2).map { case (l, ds) => l -> ds.length.toLong }
    // rarest language keeps every document (rate == MixCoinMod)
    val rarest = nLang.minBy(_._2)._1
    assert(keptByLang.getOrElse(rarest, 0L) === nLang(rarest))
    // the head language (en, ~3:1 in this corpus) was actually
    // down-sampled — the re-mix is non-vacuous on the testdata
    val head = nLang.maxBy(_._2)._1
    assert(keptByLang.getOrElse(head, 0L) < nLang(head))
  }

  test("qualityTopP keeps exactly floor(n/5) per language, and they are " +
      "the top-ranked by (score desc, doc_id)") {
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        (size(filter(split(col("text"), " "),
          w => w === "the" || w === "a")).cast("double") /
          size(split(col("text"), " ")).cast("double")).as("score"))
      .as[(Long, String, Double)].collect()
    val kept = TextAnalysis.qualityTopP(spark, sfDir)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val keptByLang = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    all.groupBy(_._2).foreach { case (lang, docs) =>
      val expectN = docs.length / TextAnalysis.TopPDen
      val expect  = docs.sortBy { case (id, _, sc) => (-sc, id) }
        .take(expectN).map(_._1).toSet
      assert(keptByLang.getOrElse(lang, Set.empty) === expect,
        s"lang $lang")
    }
  }

  test("tokenBudget: per language, kept docs follow coin order and stop " +
      "at the first doc crossing the budget; coverage reaches the budget") {
    val B = TextAnalysis.LangTokenBudget
    def coin(id: Long): Long =
      (((id % 1000003L) * 2654435761L + 40503L) % 999983L) %
        TextAnalysis.MixCoinMod
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .as[(Long, String, Long)].collect()
    val kept = TextAnalysis.tokenBudget(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    all.groupBy(_._2).foreach { case (lang, docs) =>
      val ordered = docs.sortBy { case (id, _, _) => (coin(id), id) }
      var cum = 0L
      val expect = ordered.takeWhile { case (_, _, n) =>
        val in = cum < B; cum += n; in
      }.map(_._1).toSet
      // local reference: take while the PRE-sum is under budget
      var cum2 = 0L
      val expect2 = ordered.flatMap { case (id, _, n) =>
        val r = if (cum2 < B) Some(id) else None; cum2 += n; r
      }.toSet
      assert(expect === expect2)
      assert(docs.map(_._1).toSet.intersect(kept) === expect, s"lang $lang")
      // the kept set covers the budget (or the language ran dry)
      val keptTok = docs.filter(t => kept.contains(t._1)).map(_._3).sum
      val allTok  = docs.map(_._3).sum
      assert(keptTok >= math.min(B, allTok), s"lang $lang coverage")
      // and the budget actually cut something on the testdata's head lang
    }
    val cutSomething = all.map(_._1).toSet.diff(kept).nonEmpty
    assert(cutSomething)
  }

  test("diversity: exact TTR and Simpson ppm against a sequential count") {
    val got = TextAnalysis.diversity(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      // mirror split(text, " "): every separator yields a token slot,
      // trailing empties included
      val toks = text.split(" ", -1)
      val tf = toks.groupBy(identity).view.mapValues(_.length.toLong)
      val nTok = toks.length.toLong
      val nTyp = tf.size.toLong
      val sumTf2 = tf.values.map(v => v * v).sum
      val (gTok, gTyp, ttr, simpson) = got(id)
      assert(gTok == nTok && gTyp == nTyp)
      assert(ttr == 1000000L * nTyp / nTok)
      assert(simpson == 1000000L * sumTf2 / (nTok * nTok))
    }
    // boundary docs: all-unique tokens → TTR = 1e6; all-same → Simpson 1e6
    val dir = writeDocs(Seq((1L, words(50)), (2L, Seq.fill(40)("x").mkString(" "))))
    val b = TextAnalysis.diversity(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(b(1L)._1 == 1000000L && b(1L)._2 == 1000000L / 50)
    assert(b(2L)._1 == 1000000L / 40 && b(2L)._2 == 1000000L)
  }

  test("featureHash: signed-sum parity with a sequential hasher, zero " +
      "rows dropped only on full cancellation, and index domain bounds") {
    val D = TextAnalysis.FeatureDim
    // sequential reference with the same padded polynomial fold
    def fold(tok: String): Long = {
      val padded = tok.padTo(16, ' ').substring(0, 16)
      padded.foldLeft(0L)((acc, c) => (acc * 31L + c.toLong) % 1000000007L)
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      text.split(" ", -1).map { tok =>
        val h = fold(tok)
        ((id, h % D), if ((h / D) % 2 == 0L) 1L else -1L)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .filter(_._2 != 0L)
    val got = TextAnalysis.featureHash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
    assert(got.keys.forall { case (_, idx) => idx >= 0 && idx < D })
    // the dimension is small enough that collisions actually occur:
    // some doc has fewer live buckets than distinct tokens
    val live = got.keys.groupBy(_._1).view.mapValues(_.size).toMap
    val types = docs.map { case (id, t) =>
      id -> t.split(" ", -1).distinct.length
    }.toMap
    assert(types.exists { case (id, k) => live.getOrElse(id, 0) < k })
  }

  test("ngramLm: top-k bigrams and conditional ppm match a sequential " +
      "count, and conditionals per w1 never exceed one") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("text")).collect().map(_.getString(0))
    val c2 = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { t =>
      val w = t.split(" ", -1)
      w.sliding(2).foreach {
        case Array(a, b) => c2((a, b)) = c2.getOrElse((a, b), 0L) + 1L
        case _           => ()
      }
    }
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val want = c2.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }
      .take(TextAnalysis.NgramLmTopK)
      .map { case ((a, b), c) =>
        (a, b, c, c1(a), 1000000L * c / c1(a))
      }
    val got = TextAnalysis.ngramLm(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == want)
    assert(got.forall(_._5 <= 1000000L))
  }

  test("lmScore: per-doc bigram coverage is exact (tokens - 1), every " +
      "score is a true probability in (0, 1e6] ppm, and exactly the " +
      "multi-token docs are scored") {
    val got = TextAnalysis.lmScore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, nBg, score) =>
      assert(nBg === lens(id) - 1, s"doc $id bigram count")
      assert(score > 0L && score <= 1000000L, s"doc $id score $score")
    }
    assert(got.length === lens.count(_._2 >= 2))
  }

  test("invertedIndex: true df with first-K postings against a " +
      "sequential build, and the window + grouped agg share ONE hash " +
      "exchange") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val postings = scala.collection.mutable.Map[String, List[Long]]()
    docs.sortBy(_._1).foreach { case (id, t) =>
      t.split(" ", -1).distinct.foreach(w =>
        postings(w) = id :: postings.getOrElse(w, Nil))
    }
    val want = postings.toSeq.map { case (w, ids) =>
      val sorted = ids.reverse
      (w, sorted.length.toLong,
        sorted.take(TextAnalysis.IndexPostingCap).mkString("|"))
    }.sortBy(_._1)
    val df = TextAnalysis.invertedIndex(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == want)
    // one token shuffle serves BOTH the windowed rank/df and the grouped
    // aggregate — a second hashpartitioning exchange means the shared
    // partitioning broke (the rangepartitioning of the final orderBy is
    // presentation, not counted; FINAL plan only, since the AQE toString
    // appends the initial plan and would double-count)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(hashExchanges === 1, plan.take(1500))
  }

  test("pmiPairs: top-k association pairs match a sequential document-" +
      "level co-occurrence count with exact integer lift") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("text")).collect().map(_.getString(0))
    val nDocs = docs.length.toLong
    val nw = scala.collection.mutable.Map[String, Long]()
    val n12 = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { t =>
      val ws = t.split(" ", -1).distinct.sorted
      ws.foreach(w => nw(w) = nw.getOrElse(w, 0L) + 1L)
      for (i <- ws.indices; j <- (i + 1) until ws.length)
        n12((ws(i), ws(j))) = n12.getOrElse((ws(i), ws(j)), 0L) + 1L
    }
    // demo vocab (30 words) is far under the cap, so no vocab cutoff here
    assert(nw.size <= TextAnalysis.PmiVocabCap)
    val want = n12.toSeq
      .filter(_._2 >= TextAnalysis.PmiMinSupport)
      .map { case ((a, b), c) =>
        (a, b, c, nw(a), nw(b), 1000000L * c * nDocs / (nw(a) * nw(b)))
      }
      .sortBy { case (a, b, _, _, _, l) => (-l, a, b) }
      .take(TextAnalysis.PmiTopK)
    val got = TextAnalysis.pmiPairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == want)
    // structural sanity: co-occurrence never exceeds either marginal
    got.foreach(p => assert(p._3 <= math.min(p._4, p._5)))
  }

  test("splitLeakfree: split is a pure function of content, duplicates " +
      "never straddle splits, and counts conserve") {
    // synthetic corpus with byte-identical texts under different doc ids
    val dir = java.nio.file.Files.createTempDirectory("graft_split").toString
    val texts = (0 until 40).map(i => words(10, s"t$i"))
    val rows = texts.zipWithIndex.flatMap { case (t, i) =>
      // every 4th text appears twice more with far-apart ids
      if (i % 4 == 0) Seq((i.toLong, t), (1000L + i, t), (2000L + i, t))
      else Seq((i.toLong, t))
    }
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source",
        when(col("doc_id") % 2 === 0, "web").otherwise("books"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = CorpusPipeline.splitLeakfree(spark, dir).collect()
    assert(got.nonEmpty)
    // audit column proves no content group straddles splits
    assert(got.forall(_.getLong(4) == 0L))
    // conservation: every doc lands in exactly one (source, split) cell
    assert(got.map(_.getLong(2)).sum == rows.length)
    // all three splits materialize on this fixture (rep ids 0..39 draw
    // 30 train / 8 val / 2 test coins — precomputed)
    val splits = got.map(_.getString(1)).toSet
    assert(splits == Set("train", "val", "test"))
    // group granularity: distinct groups ≤ docs, strictly fewer here
    assert(got.map(_.getLong(3)).sum < rows.length)
  }

  test("bpe vocabulary induction: merge-count conservation, greedy " +
      "left-to-right semantics, deterministic ranks") {
    // hand-checkable corpus: 'aaab' ×3, 'ab' ×2 — pair counts round 1:
    // (a,a)=6, (a,b)=5, so merge 1 = (a,a) applied GREEDILY left-to-right
    // ('aaab' → 'aa','a','b', NOT 'a','aa','b' — which would leave
    // (a,a)=3 remeergeable); round 2 on the merged table: (a,b) = 3 from
    // 'aa·a·b' + 2 from 'a·b' = 5 beats (aa,a)=3 — merge 2 = (a,b,5)
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val words = CorpusPipeline.initialBpeWords(spark, dir)
    val (merges, finalWords) = CorpusPipeline.bpeTrain(spark, words, 4)
    // round 3: 'aa·ab' → (aa,ab)=3; round 4: both words are single
    // symbols — EARLY EXHAUSTION under a budget of 4 emits 3 merges
    assert(merges.map(m => (m._2, m._3, m._4)) ===
      Seq(("a", "a", 6L), ("a", "b", 5L), ("aa", "ab", 3L)))
    // ranks are 1..n and strictly ordered
    assert(merges.map(_._1) === (1L to merges.length).toSeq)
    def symCount(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(expr(
        "freq * size(regexp_extract_all(enc, '<([^>]+)>', 1))")))
        .head().getLong(0)
    // exact on the fixture: 16 initial symbols (3·4 + 2·2), merge 1
    // collapses 3 (the (a,a) count is 6 but 'aaa' runs merge
    // NON-overlapping — greedy semantics), merge 2 collapses 5, merge 3
    // collapses 3 → 5 remain
    assert(symCount(words) === 16L)
    assert(symCount(finalWords) === 5L)
    // conservation bounds on the real corpus at the full 30-merge
    // budget: each merge k collapses between ⌈count_k/2⌉ (l=r runs
    // merge every OTHER adjacency) and count_k (exact when l≠r — no
    // self-overlap possible) occurrences
    val corpusWords = CorpusPipeline.initialBpeWords(spark, sfDir)
    val (cm, cw) = CorpusPipeline.bpeTrain(spark, corpusWords,
      CorpusPipeline.BpeMerges)
    assert(cm.length === CorpusPipeline.BpeMerges)
    assert(cm.forall(_._4 > 0))
    val removed = symCount(corpusWords) - symCount(cw)
    assert(removed <= cm.map(_._4).sum)
    assert(removed >= cm.map(m => (m._4 + 1) / 2).sum)
    // the merge table is a faithful PROGRAM: replaying it over the fresh
    // word table reproduces the trainer's final state bit for bit
    val replayed = cm.foldLeft(corpusWords) { case (df, (_, l, r, _)) =>
      df.select(col("word"),
        expr(s"replace(enc, '<$l><$r>', '<$l$r>')").as("enc"), col("freq"))
    }
    def encSet(df: org.apache.spark.sql.DataFrame) =
      df.select("word", "enc", "freq").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(encSet(replayed) === encSet(cw))
    // encode consumes the SAME trained state: every corpus token is in
    // the trained vocab, so n_words equals the raw pre-token count and
    // bpe_tokens is bounded by [n_words, chars]
    val enc = CorpusPipeline.bpeEncode(spark, sfDir).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), r.toString) // ≥ 1 token/word
    }
    val rawTokens = Tables.documents(spark, sfDir)
      .select(expr("size(regexp_extract_all(text, '[a-z]+', 0))"))
      .collect().map(r => math.max(r.getInt(0), 0).toLong).sum
    assert(enc.map(_.getLong(1)).sum === rawTokens)
  }
}
