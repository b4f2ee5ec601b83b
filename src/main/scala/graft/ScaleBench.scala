package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Dedup

/** Scale-evidence bench: times the heavy dedup/ANN family (the queries
  * whose cost is dominated by the documents/embeddings tables, so they run
  * against a [[ScaleData]] directory that carries only those two tables) at
  * any data size, with the same noop-sink min-of-2 protocol as [[Bench]].
  *
  * Usage: ScaleBench <dir> [name ...] [ngram_cap=N]
  *  - no names: the whole family
  *  - `ngram_cap=N`: additionally time the n-gram pair join with an
  *    explicit posting-list cap N (the stop-shingle knob) — the scaling
  *    study uses this to show the cap bounding the pair-join blowup on
  *    corpora whose shingle document-frequencies grow with corpus size.
  */
object ScaleBench {

  val Family: Seq[String] = Seq(
    "q_dedup_exact", "q_dedup_ngram", "q_dedup_clusters", "q_dedup_minhash",
    "q_minhash_signature", "q_dedup_simhash", "q_corpus_build",
    "q_embed_neardup", "q_ann_brute", "q_ann_lsh", "q_ann_ivf",
    "q_text_stats", "q_quality_score", "q_fingerprint",
    "q_stratified_sample",
    // round-4/5 corpus-prep additions (documents/embeddings-driven)
    "q_chunk", "q_doc_repetition", "q_decontaminate",
    "q_pii_redact", "q_tfidf", "q_embed_quantize",
    "q_semantic_dedup", "q_pack_sequences", "q_lang_mix",
    "q_quality_topp", "q_token_budget", "q_group_sample",
    "q_heavy_hitters",
    // round-7 session-IV additions (documents/events-driven)
    "q_diversity", "q_split_leakfree", "q_feature_hash", "q_ngram_lm",
    "q_gap_fill", "q_paa",
    // round-8 additions
    "q_embed_lsh_pairs", "q_image_phash", "q_embed_clusters",
    "q_embed_decontaminate", "q_lateness", "q_freshness",
    // round-9 additions (documents/embeddings/lineitem-driven)
    "q_pmi", "q_inverted_index", "q_lm_score", "q_ngram_collision",
    "q_ann_ivf_probe", "q_profile", "q_profile_sketch",
    // round-9 relational additions (orders/customer/supplier-driven)
    "q_tpch_q13", "q_tpch_q21", "q_interval_overlap",
    "q_cumulative_uniques", "q_trend", "q_assoc_rules", "q_winsorize",
    "q_argmax", "q_gini",
    // round-10 additions
    "q_tpch_q17", "q_dpp_star", "q_time_travel", "q_bpe_vocab", "q_bpe_encode",
    // round-10 session-II additions
    "q_tpch_q15", "q_tpch_q22", "q_market_share", "q_skyline", "q_fk_audit",
    "q_mode", "q_rolling_stats", "q_seasonal", "q_audio_features",
    "q_asof_join", "q_asof_native",
    // round-10 session-III additions
    "q_tpch_q2", "q_tpch_q11", "q_tpch_q16", "q_tpch_q19", "q_tpch_q20",
    "q_corr_matrix",
    "q_tpch_q4", "q_tpch_q5", "q_tpch_q6", "q_tpch_q7", "q_tpch_q10",
    "q_tpch_q14", "q_kmeans", "q_tpch_q9", "q_tpch_q12", "q_occ_log",
    "q_active_window", "q_bfs_levels",
    // round-11 additions (graftlog DSv2 connector family)
    "q_log_versions", "q_log_vacuum",
    // round-12 additions (manifest-stats control plane, CDC, catalog,
    // partitioned writes — the whole family reads through the
    // vectorized connector)
    "q_log_cdc", "q_log_partitioned", "q_catalog_asof", "q_log_write",
    "q_log_evolve", "q_log_agg")

  def main(args: Array[String]): Unit = {
    System.setProperty("spark.log.level", "ERROR")
    val dir   = args(0)
    val caps  = args.drop(1).filter(_.startsWith("ngram_cap="))
      .map(_.stripPrefix("ngram_cap=").toInt)
    val picked = args.drop(1).filterNot(_.startsWith("ngram_cap=")).toSeq
    // an unknown name must not kill the whole run after minutes of timing:
    // report it and measure the rest (same spirit as the -1 sentinel)
    val (names0, unknown) =
      (if (picked.isEmpty) Family else picked)
        .partition(SparkEntry.queries.contains)
    unknown.foreach(n => System.err.println(s"[scalebench] unknown query: $n"))
    val names = names0
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus, "graft-scalebench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10000000L).selectExpr("sum(id)").collect() // JVM warmup
    Seq[(SparkSession, String) => DataFrame](
      Tables.documents, Tables.embeddings, Tables.lineitem)
      .foreach { t =>
        try t(spark, dir).count() catch { case _: Throwable => () }
      }
    val bench = SparkEntry.benchQueries
    val capped: Seq[(String, (SparkSession, String) => DataFrame)] =
      caps.toSeq.map { cap =>
        s"q_dedup_ngram_cap$cap" -> ((s: SparkSession, d: String) =>
          Dedup.ngramPairsOf(Tables.documents(s, d), cap))
      }
    val results =
      (names.map(n => n -> bench(n)) ++ capped).map { case (name, fn) =>
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
            catch { case e: Throwable =>
              System.err.println(s"[scalebench] $name failed: ${e.getMessage}")
              false
            }
          ((System.nanoTime() - t0) / 1e9, ok)
        }
        val good = runs.collect { case (t, true) => t }
        name -> (if (good.nonEmpty) good.min else -1.0)
      }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val d = Bench.jsonEscape(dir)
    println(s"""{"metric":"scale_total","value":$total,"unit":"sec","queries":$qs,"dir":"$d"}""")
    spark.stop()
  }
}
