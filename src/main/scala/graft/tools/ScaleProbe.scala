package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke: amplify the sf0.1 documents/embeddings tables (20x / 10x,
  * every row duplicated — a pathological near-dup corpus) into
  * target/tmp/sfbig and time the heavy operators on it. Usage:
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.ScaleProbe [keys...]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val big = "target/tmp/sfbig"
    if (!new java.io.File(s"$big/documents.parquet").exists()) {
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val copies = spark.range(20).select(col("id").as("copy"))
      docs.crossJoin(copies)
        .withColumn("doc_id", col("doc_id") + col("copy") * 1000000L).drop("copy")
        .repartition(32).write.mode("overwrite").parquet(s"$big/documents.parquet")
      emb.crossJoin(copies.where("copy < 10"))
        .withColumn("vec_id", col("vec_id") + col("copy") * 1000000L).drop("copy")
        .repartition(32).write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    }
    if (!new java.io.File(s"$big/events.parquet").exists()) {
      // 10x events with disjoint users per copy — grows both sides of the
      // as-of join without changing per-key density
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      val copies = spark.range(10).select(col("id").as("copy"))
      ev.crossJoin(copies)
        .withColumn("event_id", col("event_id") + col("copy") * 100000000L)
        .withColumn("user_id", col("user_id") + col("copy") * 1000000L)
        .drop("copy")
        .repartition(32).write.mode("overwrite").parquet(s"$big/events.parquet")
    }
    println("PROBE docs=" + spark.read.parquet(s"$big/documents.parquet").count() +
      " emb=" + spark.read.parquet(s"$big/embeddings.parquet").count() +
      " ev=" + spark.read.parquet(s"$big/events.parquet").count())

    val keys = if (args.nonEmpty) args.toSeq else Seq(
      "llm_dedup_exact", "llm_dedup_fuzzy", "llm_dedup_minhash", "llm_dedup_simhash",
      "llm_ngram_jaccard", "llm_tfidf", "llm_lang_id", "llm_similarity_topk",
      "llm_knn_join", "llm_embedding_neardup", "llm_sample_stratified",
      "llm_doc_chunk", "llm_contamination_check", "llm_embedding_quantize",
      "llm_kmeans_step", "llm_clean_pipeline", "llm_semdedup",
      "llm_dedup_levenshtein", "llm_stopword_ratio", "llm_length_histogram",
      // round 2: the all-duplicate corpus is the worst case for the
      // near-dup graph (every doc pairs with its 19 copies), and the 10x
      // events stress the tolerance as-of and interval joins
      "llm_dedup_cluster", "llm_tokenizer_vocab", "llm_curriculum_order",
      "llm_quality_gate_report", "llm_domain_rebalance", "llm_shard_manifest",
      "llm_frame_sample", "rel_join_asof_tolerance", "strm_interval_join",
      "core_validate_quarantine", "llm_dedup_substring", "llm_kmeans_train",
      "llm_reservoir_sample", "llm_ann_refine", "llm_bigram_lm",
      "llm_dataset_card",
      // round 3: BPE/PMI/entropy sweep the full token stream; prefix
      // dedup hits the all-duplicate corpus head on
      "llm_bpe_merge_step", "llm_bpe_train2", "llm_bigram_pmi",
      "llm_token_entropy", "llm_zipf_fit", "llm_prefix_dedup",
      "llm_trigram_backoff", "llm_importance_resample",
      "llm_embedding_norm_stats", "strm_running_totals",
      "strm_topk_windowed", "core_history_rewind",
      // round 4: two-level shard packing, bounded top-N vocab ranks,
      // and the probe-panel ANN audit (core_incremental_pipeline needs
      // the orders table, which the amplified corpus doesn't carry)
      "llm_pack_shards", "llm_packing_efficiency", "llm_vocab_oov_rate",
      "llm_ann_recall_audit", "llm_skipgram_pairs", "llm_minhash_verified",
      "llm_dup_histogram", "llm_gopher_quality", "llm_tokenize_apply",
      "fn_hof_predicates", "llm_dedup_incremental", "llm_contamination_ngram",
      "llm_lsh_precision_audit", "llm_multimodal_resize",
      // round 5: winnowing/novelty shingle sweeps and the trained-IVF
      // pair under the 20x corpus
      "llm_winnow_fingerprint", "llm_ngram_novelty",
      "llm_ann_ivf_trained", "llm_ann_ivf_trained_recall",
      "llm_cdc_chunk", "llm_dataset_shuffle", "llm_langid_confusion",
      "llm_embedding_center", "rel_join_asof_multikey", "llm_chunk_dedup",
      "llm_dedup_verdicts", "llm_minhash_cluster",
      "llm_quality_percentile_gate", "llm_token_freq_drift",
      "core_row_checksum", "llm_vocab_growth", "llm_class_weights",
      "llm_logreg_train", "llm_embedding_pca", "llm_quality_classifier_gate",
      "llm_kmeans_inertia", "llm_classifier_calibration", "llm_classifier_roc",
      "llm_embedding_dim_stats", "llm_embedding_whiten_check",
      "llm_pagerank_centrality", "llm_minhash_recall",
      // round 7: the sketch family under the 20x all-duplicate corpus —
      // KMV buffers must stay k longs and CMS cells 4096 rows however
      // duplicated the input; the KN LM sweeps the full bigram stream
      "rel_agg_kmv_distinct", "llm_heavy_hitters_cms", "llm_kn_bigram_lm",
      "llm_temperature_mix", "llm_source_overlap_kmv",
      "llm_lexical_diversity", "llm_shingle_containment",
      "llm_dup_rate_kmv")
    keys.foreach { k =>
      val t0 = System.nanoTime()
      try {
        val n = graft.Registry.byKey(k).query(spark, big).count()
        println(f"PROBE $k: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      } catch {
        case e: Throwable =>
          println(s"PROBE $k FAILED: ${e.getMessage.take(200)}")
      }
      // measurement hygiene: consumed frames' localCheckpoint blocks
      // linger until the ContextCleaner notices; 70 queries of that in
      // one JVM turns late keys' numbers into storage-pressure noise
      // (observed: llm_ann_ivf_trained 33 s in-sequence vs 3.3 s alone).
      // BUT: checkpoint-backed RDDs must survive — the session memos
      // (AnnIndex.trainFor / Models.logregTrainFor / CorpusStats) hand
      // out localCheckpointed frames whose lineage is GONE; dropping
      // their blocks would turn the next memo hit into a dead
      // 'Checkpoint block not found' failure instead of a timing.
      spark.catalog.clearCache()
      // (isCheckpointed is true for a MATERIALIZED local checkpoint —
      // exactly the case whose lineage is truncated; an unmaterialized
      // mark still has its full lineage and can recompute)
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.isCheckpointed)
        .foreach(_.unpersist(blocking = false))
    }

    // Pathological levenshtein corpus: ONE (lang, n_chars) block holding
    // 100k DISTINCT texts (so the exact-dedup quotient cannot collapse
    // anything) — unbounded blocking would need 5e9 O(len^2) distance
    // computations here and never finish. The prefix sub-blocking caps
    // every all-pairs term at the ~20-doc prefix groups.
    val lev = "target/tmp/sflev"
    if (!new java.io.File(s"$lev/documents.parquet").exists()) {
      spark.range(100000).select(
          col("id").as("doc_id"),
          lit("en").as("lang"),
          // first TWO tokens shared by the 20 docs of each id%5000 group
          // (the sub-block key), third token distinct per doc — so the
          // capped path still has real within-block pairs to find
          format_string("g%05d g%05d d%06d %s", col("id") % 5000L,
            col("id") % 5000L, col("id"),
            lit(Seq.fill(13)("padpadpad").mkString(" "))).as("text"))
        .withColumn("source", lit("synthetic"))
        .withColumn("n_chars", length(col("text")))
        .repartition(32).write.mode("overwrite").parquet(s"$lev/documents.parquet")
    }
    val t0 = System.nanoTime()
    val n = graft.Registry.byKey("llm_dedup_levenshtein").query(spark, lev).count()
    println(f"PROBE llm_dedup_levenshtein[single-block-100k-distinct]: " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    spark.stop()
  }
}
