package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Core TSDB surface (SURVEY §2 #1-9)
    "ts_put_shard" -> (TimeSeriesOps.putShard _),
    "ts_get_point" -> (TimeSeriesOps.getPoint _),
    "ts_scan_range" -> (TimeSeriesOps.scanRange _),
    "ts_scan_latest" -> (TimeSeriesOps.scanLatest _),
    "ts_compact_block" -> (TimeSeriesOps.compactBlock _),
    "ts_outdate" -> (TimeSeriesOps.outdate _),
    "ts_downsample" -> (TimeSeriesOps.downsample _),
    "ts_downsample_salted" -> (TimeSeriesOps.downsampleSalted _),
    "ts_delta_encode" -> (TimeSeriesOps.deltaEncode _),
    "ts_multiget" -> (TimeSeriesOps.multiGet _),
    "ts_codec_roundtrip" -> (TimeSeriesOps.codecRoundtrip _),
    "ts_codec_dispatch" -> (TimeSeriesOps.codecDispatch _),
    "ts_asof_join" -> (TimeSeriesOps.asofJoin _),
    "ts_range_join" -> (TimeSeriesOps.rangeJoin _),
    "q_percentiles" -> (Analytics.qPercentiles _),
    "ts_gap_fill" -> (TimeSeriesOps.gapFill _),
    "ts_rate" -> (TimeSeriesOps.rate _),
    "ts_ema" -> (TimeSeriesOps.ema _),
    "ts_holt" -> (TimeSeriesOps.holt _),
    "ts_resets" -> (TimeSeriesOps.resets _),
    "ts_changepoint" -> (TimeSeriesOps.changepoint _),
    "ts_sliding" -> (TimeSeriesOps.slidingCounts _),
    // Analytics (#10-15)
    "q1_pricing" -> (Analytics.q1Pricing _),
    "q3_topk_revenue" -> (Analytics.q3TopkRevenue _),
    "q5_nation_revenue" -> (Analytics.q5NationRevenue _),
    "q_window_topn" -> (Analytics.qWindowTopn _),
    "q_sessionize" -> (Analytics.qSessionize _),
    "q_json_props" -> (Analytics.qJsonProps _),
    "q6_selective" -> (Analytics.q6Selective _),
    "q_rollup" -> (Analytics.qRollup _),
    "q_cube" -> (Analytics.qCube _),
    "q_funnel" -> (Analytics.qFunnel _),
    "q_funnel_window" -> (Analytics.qFunnelWindow _),
    "q4_order_priority" -> (Analytics.q4OrderPriority _),
    "q_anti_dormant" -> (Analytics.qAntiDormant _),
    "q7_volume" -> (Analytics.q7Volume _),
    "q10_returns" -> (Analytics.q10Returns _),
    "q12_shipmode" -> (Analytics.q12Shipmode _),
    "q_join_salted" -> (Analytics.qJoinSalted _),
    "q14_promo" -> (Analytics.q14Promo _),
    "q8_market_share" -> (Analytics.q8MarketShare _),
    "q9_profit" -> (Analytics.q9Profit _),
    "q13_custdist" -> (Analytics.q13Custdist _),
    "q15_top_supplier" -> (Analytics.q15TopSupplier _),
    "q17_small_qty" -> (Analytics.q17SmallQty _),
    "q18_large_orders" -> (Analytics.q18LargeOrders _),
    "q21_late_supplier" -> (Analytics.q21LateSupplier _),
    "q19_disjunctive" -> (Analytics.q19Disjunctive _),
    "q22_opportunity" -> (Analytics.q22Opportunity _),
    "q2_min_cost_supp" -> (Analytics.q2MinCostSupp _),
    "q11_important_parts" -> (Analytics.q11ImportantParts _),
    "q16_supplier_count" -> (Analytics.q16SupplierCount _),
    "q20_dominant_supp" -> (Analytics.q20DominantSupp _),
    "q_pivot_daily" -> (Analytics.qPivotDaily _),
    "ts_zscore" -> (TimeSeriesOps.zscore _),
    "ts_interp_linear" -> (TimeSeriesOps.interpLinear _),
    "ts_above_p95" -> (Analytics.tsAboveP95 _),
    "q_retention" -> (Analytics.qRetention _),
    "q_cohort_matrix" -> (Analytics.qCohortMatrix _),
    "ts_heavy_hitters" -> (Analytics.heavyHitters _),
    // sketch op: intentionally NO oracle (HLL internals are engine-
    // specific); accuracy vs exact is asserted in OperatorSpec
    "q_approx_distinct" -> (Analytics.qApproxDistinct _),
    // sketch op: likewise rows-only; accuracy asserted in OperatorSpec
    "q_approx_quantiles" -> (Analytics.qApproxQuantiles _),
    "q_histogram" -> (Analytics.qHistogram _),
    "q_corr" -> (Analytics.qCorr _),
    "ts_top_movers" -> (TimeSeriesOps.topMovers _),
    "ts_seasonal" -> (TimeSeriesOps.seasonalProfile _),
    "ts_autocorr" -> (TimeSeriesOps.autocorr _),
    "ts_ohlc" -> (TimeSeriesOps.ohlc _),
    // Dedup (#16-20)
    "dedup_exact" -> (Dedup.exact _),
    "dedup_survivor" -> (Dedup.survivor _),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "dedup_ngram_jaccard_capped" -> (Dedup.ngramJaccardCapped _),
    "dedup_minhash_lsh" -> (Dedup.minhashLsh _),
    "dedup_simhash" -> (Dedup.simhash _),
    "dedup_simhash_pairs" -> (Dedup.simhashPairs _),
    "dedup_embedding" -> (Dedup.embeddingCosine _),
    "dedup_cluster" -> ((s: SparkSession, d: String) => Dedup.clusterDups(s, d)),
    "dedup_cluster_survivor" -> (Dedup.clusterSurvivor _),
    "dedup_cluster_incremental" -> (Dedup.clusterIncremental _),
    "dedup_containment" -> (Dedup.containment _),
    "dedup_containment_capped" -> (Dedup.containmentCapped _),
    "dedup_prefix" -> (Dedup.prefixDups _),
    "dedup_incremental" -> (Dedup.incremental _),
    "dedup_substring" -> (Dedup.substringPairs _),
    "dedup_spans" -> (Dedup.substringSpans _),
    // Similarity search (#21-23)
    "ann_topk_brute" -> (Similarity.annTopkBrute _),
    "ann_lsh_bucket" -> (Similarity.lshBucket _),
    "knn_label_centroid" -> (Similarity.knnLabelCentroid _),
    "ann_ivf_topk" -> (Similarity.annIvfTopk _),
    "ann_batch_topk" -> (Similarity.annBatchTopk _),
    "ann_range" -> (Similarity.annRange _),
    "emb_kmeans_step" -> (Similarity.kmeansStep _),
    "emb_norm_stats" -> (Similarity.normStats _),
    "emb_remove_top_pc" -> (Similarity.removeTopPc _),
    "emb_power_iter" -> (Similarity.powerIter _),
    "ann_pq_topk" -> (PqIndex.annPqTopk _),
    "ann_ivfpq_topk" -> (IvfPqIndex.annIvfPqTopk _),
    // Text analysis (#24-27)
    "text_langid" -> (TextOps.langId _),
    "text_quality" -> (TextOps.quality _),
    "text_tokens" -> (TextOps.tokenCounts _),
    "text_fingerprint" -> (TextOps.fingerprint _),
    "text_rolling_hash" -> (TextOps.rollingHash _),
    "text_bigrams" -> (TextOps.bigrams _),
    "text_bigram_lift" -> (TextOps.bigramLift _),
    "text_top_term" -> (TextOps.topTerm _),
    "pipeline_curate" -> (TextOps.curate _),
    "pipeline_funnel" -> (TextOps.funnel _),
    "sample_stratified" -> (TextOps.sampleStratified _),
    "text_scrub_digits" -> (TextOps.scrubDigits _),
    "text_scrub_pii" -> (TextOps.scrubPii _),
    "text_repetition" -> (TextOps.repetition _),
    "doc_pack_bins" -> (TextOps.docPackBins _),
    "text_decontaminate" -> (TextOps.decontaminate _),
    "text_decontaminate_fuzzy" -> (TextOps.decontaminateFuzzy _),
    "doc_mix_weights" -> (TextOps.mixWeights _),
    "text_gopher_rules" -> (TextOps.gopherRules _),
    "doc_shard_assign" -> (TextOps.shardAssign _),
    "emb_quantize_sq" -> (Similarity.quantizeSq _),
    "ts_histogram_quantile" -> (TimeSeriesOps.histogramQuantile _),
    "doc_mix_temperature" -> (TextOps.mixTemperature _),
    "doc_split_holdout" -> (TextOps.splitHoldout _),
    "ann_mmr_rerank" -> (Similarity.mmrRerank _),
    "ts_sla_burn" -> (TimeSeriesOps.slaBurn _),
    "dedup_minhash_est" -> (Dedup.minhashEstimate _),
    "emb_centroid_shift" -> (Similarity.centroidShift _),
    "dedup_jaccard_histogram" -> (Dedup.jaccardHistogram _),
    "dedup_band_stats" -> (Dedup.bandStats _),
    "emb_ivf_balance" -> (Similarity.ivfBalance _),
    "ts_anomaly_mad" -> (TimeSeriesOps.anomalyMad _),
    "ts_error_bursts" -> (TimeSeriesOps.errorBursts _),
    "text_lang_confusion" -> (TextOps.langConfusion _),
    "doc_len_percentiles" -> (TextOps.lenPercentiles _),
    "mm_phash_clusters" -> (Multimodal.phashClusters _),
    "emb_pq_distortion" -> (Similarity.pqDistortion _),
    "emb_semdedup" -> (Dedup.semDedup _),
    "emb_knn_outliers" -> (Similarity.knnOutliers _),
    "emb_knn_graph" -> (Similarity.knnGraph _),
    "emb_nn_descent_step" -> (Similarity.nnDescentStep _),
    // Multimodal plumbing (#28-29)
    "mm_binary_meta" -> (Multimodal.binaryMeta _),
    "mm_frame_sample" -> (Multimodal.frameSample _),
    "mm_decode_stub" -> (Multimodal.decodeFeatures _),
    "mm_decode_image" -> (Multimodal.decodeImage _),
    "mm_decode_audio" -> (Multimodal.decodeAudio _),
    "mm_decode_image_robust" -> (Multimodal.decodeImageRobust _),
    "mm_decode_audio_robust" -> (Multimodal.decodeAudioRobust _),
    "mm_chunk" -> (Multimodal.chunkLayout _),
    "mm_dedup" -> (Multimodal.payloadDedup _),
    "mm_phash" -> (Multimodal.phashPairs _),
    "mm_phash_incremental" -> (Multimodal.phashIncremental _),
    "q_session_concurrency" -> (Analytics.sessionConcurrency _),
    "text_char_lm" -> (TextOps.charLm _),
    "text_dsir" -> (TextOps.dsirWeights _),
    "ts_rollup_cascade" -> (TimeSeriesOps.rollupCascade _),
    "mm_byte_ioc" -> (Multimodal.byteIoc _),
    "ann_recall_vs_nprobe" -> (Similarity.recallVsNprobe _),
    "emb_ivf_recall" -> (Similarity.ivfRecall _),
    "q_rfm_segments" -> (Analytics.qRfmSegments _),
    "text_heaps_vocab" -> (TextOps.heapsVocab _),
    "dedup_winnow" -> (Dedup.winnow _),
    "dedup_winnow_pairs" -> (Dedup.winnowPairs _),
    "ts_dod_wow" -> (TimeSeriesOps.dodWow _),
    "q_market_basket" -> (Analytics.qMarketBasket _),
    "emb_triplet_mine" -> (Similarity.tripletMine _),
    "ts_cross_corr" -> (TimeSeriesOps.crossCorr _),
    "text_bpe_merge" -> (TextOps.bpeMergeStep _),
    "text_bpe_apply" -> (TextOps.bpeApply _),
    "text_bpe_train" -> (TextOps.bpeTrain _),
    "emb_silhouette" -> (Similarity.silhouette _),
    "emb_pagerank_knn" -> (Similarity.pagerankKnn _),
    "text_dup_ngram_frac" -> (TextOps.dupNgramFrac _),
    "emb_dim_stats" -> (Similarity.dimStats _),
    "q_attribution" -> (Analytics.qAttribution _),
    "ts_holt_backtest" -> (TimeSeriesOps.holtBacktest _),
    "ann_pq_recall" -> (Similarity.pqRecall _),
    "emb_kcenter_init" -> (Similarity.kcenterInit _),
    "emb_kmeans_train" -> (Similarity.kmeansTrain _),
    "ts_trend_fit" -> (TimeSeriesOps.trendFit _),
    "q_growth_accounting" -> (Analytics.qGrowthAccounting _),
    "text_search_tfidf" -> (TextOps.searchTfidf _),
    "ts_sla_multiwindow" -> (TimeSeriesOps.slaMultiwindow _),
    "source_jsonl_roundtrip" -> (graft.sources.DocJsonl.roundtrip _),
    "dedup_span_removal" -> (Dedup.spanRemoval _),
    "helix_scan_range" -> (HelixScan.scanRange _),
    "helix_get_point" -> (HelixScan.getPoint _),
    "helix_multiget" -> (HelixScan.multiget _),
    "helix_latest" -> (HelixScan.latest _),
    "helix_outdate_scan" -> (HelixScan.outdateScan _),
    "q_abc_analysis" -> (Analytics.qAbcAnalysis _),
    "emb_pq_code_balance" -> (Similarity.pqCodeBalance _),
    "dedup_cross_source_matrix" -> (Dedup.crossSourceMatrix _),
    "text_dup_rate_by_source" -> (TextOps.dupRateBySource _),
    "emb_dup_exact" -> (Similarity.dupExact _),
    "emb_centroid_separation" -> (Similarity.centroidSeparation _),
    "ts_gap_stats" -> (TimeSeriesOps.gapStats _),
    "q_part_growth" -> (Analytics.qPartGrowth _),
    "mm_phash_precision" -> (Multimodal.phashPrecision _),
    "ts_value_bands" -> (TimeSeriesOps.valueBands _),
    "emb_rayleigh" -> (Similarity.rayleigh _),
    "doc_shard_diversity" -> (TextOps.shardDiversity _),
    "dedup_lsh_recall" -> (Dedup.lshRecall _),
    "ts_mix_shift" -> (TimeSeriesOps.mixShift _),
    "text_vocab_overlap" -> (TextOps.vocabOverlap _),
    "q_purchase_gap_median" -> (Analytics.qPurchaseGapMedian _),
    "ts_weekday_profile" -> (TimeSeriesOps.weekdayProfile _),
    "ts_lifecycle_tiers" -> (TimeSeriesOps.lifecycleTiers _),
    "emb_knn_accuracy" -> (Similarity.knnAccuracy _),
    "mm_scene_cuts" -> (Multimodal.sceneCuts _),
    // r12 additions (#192-195)
    "helix_stream_scan" -> (HelixScan.streamScan _),
    "helix_scan_custom_order" -> (HelixScan.customOrderScan _),
    "ts_gap_fill_range" -> (TimeSeriesOps.gapFillRange _),
    "ann_filtered_topk" -> (Similarity.annFilteredTopk _),
    "ann_batch_ivf_topk" -> (Similarity.annBatchIvfTopk _),
    "ann_filtered_adaptive" -> (Similarity.annFilteredAdaptive _),
    "dedup_embedding_capped" -> (Dedup.embeddingCosineCapped _),
    "dedup_simhash_pairs_capped" -> (Dedup.simhashPairsCapped _),
    "dedup_minhash_lsh_capped" -> (Dedup.minhashLshCapped _),
    "dedup_index_commit" -> (DedupGen.dedupIndexCommit _),
    "dedup_index_commit_report" -> (DedupGen.dedupIndexCommitReport _),
    "mm_phash_pairs_capped" -> (Multimodal.phashPairsCapped _),
    "dedup_bloom_incremental" -> (Dedup.bloomIncremental _),
    "ann_bq_ivf" -> (Similarity.annBqIvf _),
    "ann_graph_probe" -> (Similarity.annGraphProbe _),
    "ann_graph_recall" -> (Similarity.annGraphRecall _),
    "ann_sq_rerank" -> (Similarity.annSqRerank _),
    "emb_cos_hist" -> (Similarity.embCosHist _),
    "doc_interleave" -> (TextOps.docInterleave _),
    "ts_counter_correct" -> (TimeSeriesOps.counterCorrect _),
    "stream_counter_correct" -> (graft.streaming.StreamOps.counterStateBatch _),
    "text_bpe_fertility" -> (TextOps.bpeFertility _),
    "q_decile_lift" -> (Analytics.qDecileLift _),
    "q_event_paths" -> (Analytics.qEventPaths _),
    "emb_ivf_purity" -> (Similarity.ivfPurity _),
    "mm_phash_hist" -> (Multimodal.phashHist _),
    "q_basket_rules" -> (Analytics.qBasketRules _),
    "text_source_drift" -> (TextOps.sourceDrift _),
    "ts_subquery_maxrate" -> (TimeSeriesOps.subqueryMaxRate _),
    "ts_absent" -> (TimeSeriesOps.absentSeries _),
    "q_skew_stats" -> (Analytics.qSkewStats _),
    "text_zipf_check" -> (TextOps.zipfCheck _),
    "text_simpson_diversity" -> (TextOps.simpsonDiversity _),
    "source_csv_roundtrip" -> (graft.sources.DocCsv.roundtrip _),
    "ann_hybrid_rrf" -> (Similarity.hybridRrf _),
    "stream_topk" -> (graft.streaming.StreamOps.topkBatch _),
    "text_ccnet_bucket" -> (TextOps.ccnetBucket _),
    "ts_sample_reservoir" -> (TimeSeriesOps.sampleReservoir _),
    "emb_matryoshka_recall" -> (Similarity.matryoshkaRecall _),
    "stream_anomaly" -> (graft.streaming.StreamOps.anomalyBatch _),
    "mm_cdc_chunks" -> (Multimodal.cdcChunks _),
    "emb_bq_recall" -> (Similarity.bqRecall _),
    "emb_bq_rerank" -> (Similarity.bqRerank _),
    "mm_cdc_incremental" -> (Multimodal.cdcIncremental _),
    "ann_ivf_delete" -> (Similarity.annIvfDelete _),
    "stream_cdc_incremental" -> (Multimodal.cdcIncrementalStreamTwin _),
    "ann_ivf_incremental" -> (Similarity.annIvfIncremental _),
    "ann_ivf_rebalance" -> (Similarity.annIvfRebalance _),
    "ann_ivf_commit" -> (Similarity.annIvfCommit _),
    "ann_ivf_commit_report" -> (Similarity.annIvfCommitReport _),
    "ann_ivf_gen_delete" -> (Similarity.annIvfGenDelete _),
    "ts_increase" -> (TimeSeriesOps.increase _),
    "ts_irate" -> (TimeSeriesOps.irate _),
    "ts_deriv" -> (TimeSeriesOps.deriv _),
    "ts_predict_linear" -> (TimeSeriesOps.predictLinear _),
    "ts_quantile_daily" -> (TimeSeriesOps.quantileDaily _),
    // Streaming batch twins (#30, #77)
    "stream_tumbling" -> (graft.streaming.StreamOps.tumblingBatch _),
    "stream_late_data" -> (graft.streaming.StreamOps.lateDataBatch _),
    "stream_session_window" -> (graft.streaming.StreamOps.sessionWindowBatch _),
    "stream_dedup" -> (graft.streaming.StreamOps.dedupBatch _),
    "stream_interval_join" -> (graft.streaming.StreamOps.intervalJoinBatch _),
    "stream_dedup_incremental" -> (Dedup.incrementalStreamTwin _),
    "stream_ann_probe" -> (Similarity.annServeTwin _),
  )

  /** DuckDB-equivalent SQL per query key (same column names — the driver
    * sorts columns by name before hashing). */
  /** Shared by q_percentiles and the ts_above_p95 composition. */
  private val PercentilesSql: String =
    """SELECT event_type, n AS n_rows,
      |  lo50 + ((n-1)*0.5::DOUBLE - floor((n-1)*0.5::DOUBLE)) * (coalesce(hi50, lo50) - lo50) AS p50,
      |  lo95 + ((n-1)*0.95::DOUBLE - floor((n-1)*0.95::DOUBLE)) * (coalesce(hi95, lo95) - lo95) AS p95
      |FROM (
      |  SELECT event_type, n,
      |    max(CASE WHEN rn = CAST(floor((n-1)*0.5::DOUBLE) AS BIGINT)+1 THEN value END) AS lo50,
      |    max(CASE WHEN rn = CAST(floor((n-1)*0.5::DOUBLE) AS BIGINT)+2 THEN value END) AS hi50,
      |    max(CASE WHEN rn = CAST(floor((n-1)*0.95::DOUBLE) AS BIGINT)+1 THEN value END) AS lo95,
      |    max(CASE WHEN rn = CAST(floor((n-1)*0.95::DOUBLE) AS BIGINT)+2 THEN value END) AS hi95
      |  FROM (SELECT event_type, value,
      |      row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
      |      count(*) OVER (PARTITION BY event_type) AS n
      |    FROM events)
      |  GROUP BY event_type, n)""".stripMargin

  /** Labelled UNBOUNDED BASELINES (verdict r17 #7 — machine-checkable):
    * queries kept DELIBERATELY quadratic in planted duplicate mass (or
    * spine-unbounded, for ts_gap_fill) as the measuring stick beside
    * their bounded production twin. The grown-copy sweep gate
    * ([[Scale]]) permits a >3× ratio ONLY for these keys and the
    * [[linearInDocs]] codec set — any other query crossing 3× fails
    * the sweep instead of hiding in prose adjudication. */
  val unboundedBaselineOf: Map[String, String] = Map(
    "ts_gap_fill" -> "ts_gap_fill_range",
    "dedup_simhash_pairs" -> "dedup_simhash_pairs_capped",
    "dedup_minhash_lsh" -> "dedup_minhash_lsh_capped",
    "dedup_embedding" -> "dedup_embedding_capped",
    "mm_phash" -> "mm_phash_pairs_capped",
    // the precision gate reads the UNBOUNDED pair population by
    // construction (it measures the index, so it pays the index's
    // pair-mass contract); its capped serving twin is the same
    "mm_phash_precision" -> "mm_phash_pairs_capped",
    // same family: the recall gate's exact ground-truth leg and the
    // similarity histogram both ride the unbounded exact-pair
    // population by construction — pair mass grows quadratically in
    // planted copies; the capped twins are the serving path
    "dedup_lsh_recall" -> "dedup_minhash_lsh_capped",
    "dedup_jaccard_histogram" -> "dedup_ngram_jaccard_capped",
  )

  /** Queries whose grown-sweep ratio tracks the DOCS growth factor by
    * contract: real per-doc work — payload codec stages for the
    * decoders, per-doc signature/distinct stages for the capped
    * simhash miner (its PAIR leg is copy-count-invariant over distinct
    * representatives; the residual growth is the linear re-signature
    * pass, measured 2.9× quiet best-of-3 under 4× docs — sublinear).
    * The sweep grows docs 4×, so ratios near 4 are the expected shape,
    * not a plan defect. */
  val linearInDocs: Set[String] = Set(
    "mm_decode_image", "mm_decode_audio",
    "mm_decode_image_robust", "mm_decode_audio_robust",
    "dedup_simhash_pairs_capped")

  /** Shared by dedup_survivor and the pipeline_curate composition. */
  private val SurvivorSql: String =
    """SELECT doc_id, md5(text) AS text_md5,
      |  CAST(row_number() OVER (PARTITION BY md5(text)
      |    ORDER BY n_chars DESC, doc_id) = 1 AS INTEGER) AS keep
      |FROM documents""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "ts_put_shard" ->
      """SELECT user_id % 8 AS shard_id,
        |  epoch_us(date_trunc('day', ts)) AS bucket_us, count(*) AS cnt
        |FROM events GROUP BY 1, 2""".stripMargin,
    "ts_get_point" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, value FROM events
        |WHERE user_id = 42
        |  AND ts = (SELECT max(ts) FROM events WHERE user_id = 42)""".stripMargin,
    "ts_scan_range" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, event_type, value FROM events
        |WHERE user_id BETWEEN 10 AND 50
        |  AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-12'
        |ORDER BY user_id, ts_us""".stripMargin,
    "ts_scan_latest" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, value FROM (
        |  SELECT user_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
        |  FROM events WHERE ts < TIMESTAMP '2024-01-15') WHERE rn = 1""".stripMargin,
    "ts_compact_block" ->
      """SELECT user_id % 8 AS shard_id, user_id,
        |  epoch_us(date_trunc('day', ts)) AS bucket_us,
        |  count(*) AS n_entries, min(epoch_us(ts)) AS min_ts_us,
        |  max(epoch_us(ts)) AS max_ts_us,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "ts_outdate" ->
      """SELECT epoch_us(date_trunc('day', ts)) AS bucket_us, count(*) AS cnt,
        |  count(DISTINCT user_id) AS n_keys
        |FROM events WHERE ts >= TIMESTAMP '2024-01-10' GROUP BY 1""".stripMargin,
    "ts_downsample" ->
      """SELECT user_id, epoch_us(date_trunc('hour', ts)) AS hour_us,
        |  count(*) AS cnt, min(value) AS min_value, max(value) AS max_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // identical semantics to ts_downsample — the salted two-phase plan
    // must produce exactly the same result
    "ts_downsample_salted" ->
      """SELECT user_id, epoch_us(date_trunc('hour', ts)) AS hour_us,
        |  count(*) AS cnt, min(value) AS min_value, max(value) AS max_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "ts_delta_encode" ->
      """SELECT user_id, count(*) AS n_deltas, min(delta_us) AS min_delta_us,
        |  max(delta_us) AS max_delta_us,
        |  CAST(sum(delta_us) AS BIGINT) AS sum_delta_us
        |FROM (SELECT user_id, epoch_us(ts) -
        |    epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS delta_us
        |  FROM events)
        |WHERE delta_us IS NOT NULL GROUP BY user_id""".stripMargin,
    "ts_multiget" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, value FROM (
        |  SELECT user_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
        |  FROM events WHERE user_id IN (7, 42, 99, 123)) WHERE rn = 1""".stripMargin,
    "ts_codec_roundtrip" ->
      "SELECT user_id, epoch_us(ts) AS ts_us, value FROM events",
    // identity: per-key codec dispatch changes storage bytes, not data
    "ts_codec_dispatch" ->
      "SELECT user_id, epoch_us(ts) AS ts_us, value FROM events",
    "ts_asof_join" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, prior_view_us FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    max(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) OVER (
        |      PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_us
        |  FROM events) WHERE event_type = 'purchase'""".stripMargin,
    "ts_range_join" ->
      """SELECT event_id, user_id, ts_us, n_recent FROM (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
        |    count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |      RANGE BETWEEN 300000000 PRECEDING AND 1 PRECEDING) AS n_recent
        |  FROM events) WHERE event_type = 'purchase'""".stripMargin,
    "q_percentiles" -> PercentilesSql,
    // the sketch audits: the exact columns are recomputed, the flags are
    // the CONTRACT — the oracle claims 1, so an engine sketch drifting
    // past its budget hash-mismatches and fails the gate
    "q_approx_distinct" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  CAST(1 AS BIGINT) AS sketch_ok
        |FROM events GROUP BY 1""".stripMargin,
    "q_approx_quantiles" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(1 AS BIGINT) AS p50_rank_ok, CAST(1 AS BIGINT) AS p95_rank_ok
        |FROM events GROUP BY 1""".stripMargin,
    "q_histogram" ->
      """WITH st AS (SELECT event_type, min(value) AS mn, max(value) AS mx
        |  FROM events GROUP BY 1)
        |SELECT e.event_type,
        |  CASE WHEN st.mx = st.mn THEN 0
        |    ELSE least(19, CAST(floor((e.value - st.mn) / (st.mx - st.mn) * 20)
        |      AS INTEGER)) END AS bucket,
        |  count(*) AS cnt
        |FROM events e JOIN st USING(event_type)
        |GROUP BY 1, 2""".stripMargin,
    "q_corr" ->
      """WITH daily AS (
        |  SELECT epoch_us(date_trunc('day', ts)) AS day_us,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS HUGEINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS HUGEINT) AS y
        |  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS DOUBLE) /
        |    (sqrt(CAST(count(*) * sum(x*x) - sum(x) * sum(x) AS DOUBLE)) *
        |     sqrt(CAST(count(*) * sum(y*y) - sum(y) * sum(y) AS DOUBLE))) AS corr_xy
        |FROM daily""".stripMargin,
    "ts_seasonal" ->
      """SELECT event_type, CAST(hour(ts) AS INTEGER) AS hod, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // integer-cent sums (DECIMAL(18,2)·100 → HUGEINT) make every
    // aggregate exact; the closed-form division chain mirrors the Spark
    // expression verbatim (the q_corr discipline)
    "ts_autocorr" ->
      """WITH p AS (SELECT user_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS x,
        |    lead(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT), 1)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CASE WHEN count(*) * sum(x*x) - sum(x) * sum(x) = 0
        |         OR count(*) * sum(y*y) - sum(y) * sum(y) = 0 THEN NULL
        |    ELSE CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS DOUBLE) /
        |      (sqrt(CAST(count(*) * sum(x*x) - sum(x) * sum(x) AS DOUBLE)) *
        |       sqrt(CAST(count(*) * sum(y*y) - sum(y) * sum(y) AS DOUBLE)))
        |  END AS acf1
        |FROM p WHERE y IS NOT NULL GROUP BY user_id""".stripMargin,
    // open/close via the same (ts, event_id) endpoint ordering the
    // Spark struct-min/max compares by ((ts, event_id) is unique, so
    // the value component never decides)
    "ts_ohlc" ->
      """WITH r AS (SELECT user_id, epoch_us(date_trunc('hour', ts)) AS hour_us, value,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY ts, event_id) AS ra,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM events),
        |agg AS (SELECT user_id, hour_us, count(*) AS n_events,
        |    max(value) AS high, min(value) AS low FROM r GROUP BY 1, 2)
        |SELECT a.user_id, a.hour_us, f.value AS open, a.high, a.low,
        |  l.value AS close, a.n_events
        |FROM agg a
        |JOIN (SELECT user_id, hour_us, value FROM r WHERE ra = 1) f
        |  USING (user_id, hour_us)
        |JOIN (SELECT user_id, hour_us, value FROM r WHERE rd = 1) l
        |  USING (user_id, hour_us)""".stripMargin,
    "ts_top_movers" ->
      """WITH r AS (SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ra,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM events)
        |SELECT f.user_id, f.value AS first_v, l.value AS last_v,
        |  l.value - f.value AS delta
        |FROM (SELECT user_id, value FROM r WHERE ra = 1) f
        |JOIN (SELECT user_id, value FROM r WHERE rd = 1) l USING(user_id)
        |ORDER BY abs(delta) DESC, user_id LIMIT 10""".stripMargin,
    "ts_above_p95" ->
      s"""SELECT e.event_type, count(*) AS n_total,
         |  CAST(sum(CASE WHEN e.value > p.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_above
         |FROM events e JOIN ($PercentilesSql) p ON e.event_type = p.event_type
         |GROUP BY 1""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk_revenue" ->
      """SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' GROUP BY n_name""".stripMargin,
    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 2""".stripMargin,
    "q_sessionize" ->
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM (SELECT user_id,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT user_id, ts,
        |      epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS prev_us
        |    FROM events))
        |GROUP BY user_id""".stripMargin,
    // NULLIF guard: a props value with no digits must become a NULL group
    // (matching Spark's cast('' as long) = null), not a cast error
    "q_json_props" ->
      """SELECT CAST(NULLIF(regexp_extract(props, '[0-9]+'), '') AS BIGINT) % 10 AS k_mod,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    "q_cohort_matrix" ->
      """WITH weekly AS (SELECT DISTINCT user_id,
        |    CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS wk
        |  FROM events),
        |cohort AS (SELECT user_id, min(wk) AS c0 FROM weekly GROUP BY 1),
        |sizes AS (SELECT c0, CAST(count(*) AS BIGINT) AS cohort_n
        |  FROM cohort GROUP BY 1),
        |m AS (SELECT c.c0, w.wk - c.c0 AS week_offset,
        |    CAST(count(*) AS BIGINT) AS n_active
        |  FROM weekly w JOIN cohort c ON w.user_id = c.user_id
        |  GROUP BY 1, 2)
        |SELECT m.c0 AS cohort_wk, m.week_offset, m.n_active, s.cohort_n,
        |  CAST(m.n_active AS DOUBLE) / CAST(s.cohort_n AS DOUBLE) AS share
        |FROM m JOIN sizes s ON m.c0 = s.c0""".stripMargin,
    "q_funnel_window" ->
      s"""WITH t1s AS (SELECT user_id,
         |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t1
         |  FROM events GROUP BY 1),
         |t2s AS (SELECT e.user_id, min(CASE WHEN e.event_type = 'click'
         |      AND epoch_us(e.ts) > t.t1 THEN epoch_us(e.ts) END) AS t2
         |  FROM events e JOIN t1s t USING (user_id) GROUP BY 1),
         |t3s AS (SELECT e.user_id, min(CASE WHEN e.event_type = 'purchase'
         |      AND epoch_us(e.ts) > t.t2 THEN epoch_us(e.ts) END) AS t3
         |  FROM events e JOIN t2s t USING (user_id) GROUP BY 1),
         |u AS (SELECT a.user_id, a.t1, b.t2, c.t3,
         |    CASE WHEN c.t3 IS NOT NULL AND c.t3 - a.t1 <= ${operators.Analytics.FunnelWindowUs} THEN 3
         |         WHEN b.t2 IS NOT NULL AND b.t2 - a.t1 <= ${operators.Analytics.FunnelWindowUs} THEN 2
         |         WHEN a.t1 IS NOT NULL THEN 1 ELSE 0 END AS depth
         |  FROM t1s a JOIN t2s b USING (user_id) JOIN t3s c USING (user_id))
         |SELECT CAST(depth AS BIGINT) AS depth, CAST(count(*) AS BIGINT) AS n_users,
         |  CAST(CAST(sum(CASE WHEN depth = 3 THEN t3 - t1 END) AS BIGINT) AS DOUBLE)
         |    / count(*) AS mean_convert_us
         |FROM u GROUP BY 1""".stripMargin,
    "q_funnel" ->
      """SELECT user_id, CAST(t_view IS NOT NULL AS INTEGER) AS did_view,
        |  CAST(t_view < t_click AS INTEGER) AS view_then_click,
        |  CAST(t_view < t_click AND t_click < t_purchase AS INTEGER) AS full_funnel
        |FROM (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
        |  FROM events GROUP BY user_id)""".stripMargin,
    "ts_gap_fill" ->
      """WITH hourly AS (
        |  SELECT user_id, epoch_us(date_trunc('hour', ts)) // 3600000000 AS hour,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(h0, h1)) AS hour FROM (
        |    SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1))
        |SELECT s.user_id, s.hour * 3600000000 AS hour_us,
        |  last_value(h.cnt IGNORE NULLS) OVER (
        |    PARTITION BY s.user_id ORDER BY s.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cnt,
        |  CASE WHEN h.cnt IS NULL THEN 1 ELSE 0 END AS is_gap
        |FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour""".stripMargin,
    "ts_rate" ->
      """SELECT user_id, epoch_us(date_trunc('day', ts)) AS day_us,
        |  count(*) AS n_deltas,
        |  CAST(sum(dv) AS DOUBLE) / (CAST(sum(dt_us) AS BIGINT) / 1000000) AS rate_per_s
        |FROM (
        |  SELECT user_id, ts,
        |    CAST(value AS DECIMAL(18,2)) -
        |      lag(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts) AS dv,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS dt_us
        |  FROM events)
        |WHERE dt_us IS NOT NULL AND dt_us > 0
        |GROUP BY 1, 2""".stripMargin,
    // mirrors the bounded-state composition: per (key, day) affine
    // partials (a, b), then an ordered a*acc+b chain — identical
    // operation order on both engines, so the doubles are bit-equal
    "ts_ema" ->
      """WITH b AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, count(*) AS n,
        |    list_reduce(list_prepend(1.0::DOUBLE, list(value ORDER BY epoch_us(ts), value)),
        |      (acc, v) -> 0.75 * acc) AS a,
        |    list_reduce(list_prepend(0.0::DOUBLE, list(value ORDER BY epoch_us(ts), value)),
        |      (acc, v) -> 0.25 * v + 0.75 * acc) AS b
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
        |  list_reduce(
        |    list_prepend([0.0::DOUBLE, 0.0::DOUBLE], list([a, b] ORDER BY day)),
        |    (acc, x) -> [x[1] * acc[1] + x[2], 0.0::DOUBLE])[1] AS ema
        |FROM b GROUP BY 1""".stripMargin,
    // denominators cleared: both engines argmax an EXACT integer score
    // (HUGEINT here, DECIMAL(38,0) in Spark); one double division at
    // the end, written in the same order
    "ts_changepoint" ->
      """WITH sc AS (SELECT user_id, ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v100,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, value) AS t,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |sc2 AS (SELECT user_id, epoch_us(ts) AS tus, t, n,
        |    abs(sum(v100) OVER (PARTITION BY user_id ORDER BY t
        |        ROWS UNBOUNDED PRECEDING) * n
        |      - t * sum(v100) OVER (PARTITION BY user_id)) AS score
        |  FROM sc)
        |SELECT user_id, tus AS cp_us,
        |  CAST(score AS DOUBLE) / (100.0 * n) AS dev
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY score DESC, t) AS rn FROM sc2)
        |WHERE rn = 1""".stripMargin,
    "ts_resets" ->
      """SELECT user_id, epoch_us(date_trunc('day', ts)) AS day_us,
        |  count(*) AS n_deltas,
        |  CAST(sum(CASE WHEN value < prev THEN 1 ELSE 0 END) AS BIGINT) AS n_resets
        |FROM (SELECT user_id, ts, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, value) AS prev
        |  FROM events)
        |WHERE prev IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    // same bounded-state shape as ts_ema, lifted to the 2-D (level,
    // trend) state: per-bucket 6-double affine fold, per-key chain
    "ts_holt" ->
      """WITH m AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, count(*) AS n,
        |    list_reduce(
        |      list_prepend([1.0::DOUBLE, 0.0, 0.0, 1.0, 0.0, 0.0],
        |        list([value, 0.0, 0.0, 0.0, 0.0, 0.0] ORDER BY epoch_us(ts), value)),
        |      (acc, x) -> [0.8 * acc[1] + 0.8 * acc[3],
        |                   0.8 * acc[2] + 0.8 * acc[4],
        |                   -0.02 * acc[1] + 0.98 * acc[3],
        |                   -0.02 * acc[2] + 0.98 * acc[4],
        |                   0.8 * acc[5] + 0.8 * acc[6] + 0.2 * x[1],
        |                   -0.02 * acc[5] + 0.98 * acc[6] + 0.02 * x[1]]) AS f
        |  FROM events GROUP BY 1, 2),
        |chains AS (
        |  SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
        |    list_reduce(list_prepend([0.0::DOUBLE, 0.0], list(f ORDER BY day)),
        |      (acc, x) -> [x[1] * acc[1] + x[2] * acc[2] + x[5],
        |                   x[3] * acc[1] + x[4] * acc[2] + x[6]]) AS st
        |  FROM m GROUP BY 1)
        |SELECT user_id, n_events, st[1] AS level, st[2] AS trend FROM chains""".stripMargin,
    "ts_sliding" ->
      """WITH ev AS (SELECT epoch_us(ts) AS t, event_type FROM events),
        |wins AS (SELECT event_type,
        |    900000000 * unnest(generate_series(
        |      (t - 3600000000) // 900000000 + 1, t // 900000000)) AS win_us
        |  FROM ev)
        |SELECT win_us, event_type, count(*) AS cnt
        |FROM wins GROUP BY 1, 2""".stripMargin,
    "q_retention" ->
      """WITH daily AS (
        |  SELECT DISTINCT user_id, epoch_us(date_trunc('day', ts)) AS day_us
        |  FROM events),
        |u AS (SELECT user_id, min(day_us) AS d0 FROM daily GROUP BY 1),
        |flags AS (
        |  SELECT u.user_id, u.d0,
        |    max(CASE WHEN d.day_us = u.d0 + 86400000000 THEN 1 ELSE 0 END) AS r1,
        |    max(CASE WHEN d.day_us > u.d0 AND d.day_us <= u.d0 + 604800000000
        |      THEN 1 ELSE 0 END) AS r7
        |  FROM u JOIN daily d USING (user_id) GROUP BY 1, 2)
        |SELECT d0 AS cohort_us, count(*) AS n_users,
        |  CAST(sum(r1) AS BIGINT) AS n_d1, CAST(sum(r7) AS BIGINT) AS n_d7
        |FROM flags GROUP BY 1""".stripMargin,
    "ts_heavy_hitters" ->
      """SELECT user_id, count(*) AS cnt FROM events
        |GROUP BY 1 ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY 1""".stripMargin,
    "q_anti_dormant" ->
      """SELECT c_mktsegment, count(*) AS n_dormant, min(c_custkey) AS first_custkey
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY 1""".stripMargin,
    "q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3""".stripMargin,
    "q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q12_shipmode" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,
    "q_join_salted" ->
      """SELECT o_orderpriority, l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_year,
        |  CAST(sum(CASE WHEN n_name = 'NATION_7'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS mkt_share,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    "q14_promo" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 /
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS promo_revenue_pct,
        |  count(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    "q6_selective" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q9_profit" ->
      """SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) -
        |    CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(4,0)))
        |    AS DOUBLE) AS profit,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_custkey) AS c_count
        |  FROM customer c
        |  LEFT JOIN (SELECT o_custkey FROM orders
        |    WHERE o_orderpriority <> '5-LOW') o
        |    ON c.c_custkey = o.o_custkey
        |  GROUP BY 1)
        |GROUP BY 1""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin,
    // threshold arithmetic ordered exactly as the Spark side:
    // 0.2 * (double(sum) / n)
    "q17_small_qty" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |    AS avg_yearly,
        |  count(*) AS n_rows
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (
        |    SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / count(*))
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
        |FROM (SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY 1) big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE sum_qty > 250.0""".stripMargin,
    "q21_late_supplier" ->
      """WITH f AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |    CAST(epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + 7776000000000
        |      AS INTEGER) AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |po AS (
        |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp
        |  FROM f GROUP BY 1),
        |q AS (SELECT l_orderkey FROM po WHERE n_supp > 1 AND n_late_supp = 1),
        |ls AS (SELECT DISTINCT f.l_orderkey, f.l_suppkey
        |  FROM f JOIN q USING(l_orderkey) WHERE late = 1)
        |SELECT s.s_suppkey, s.s_name, count(*) AS n_orders
        |FROM ls JOIN supplier s ON ls.l_suppkey = s.s_suppkey
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, s_suppkey LIMIT 10""".stripMargin,
    "q19_disjunctive" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |    AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q22_opportunity" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer c
        |WHERE c_acctbal > (
        |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1""".stripMargin,
    // arg-min via row_number ordered exactly as the Spark struct-min:
    // (integer min cents, suppkey) — deterministic ties
    "q2_min_cost_supp" ->
      """WITH es AS (
        |  SELECT s_suppkey, s_name, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |ps AS (
        |  SELECT l_partkey, p_size, l_suppkey, s_name, n_name,
        |    min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS min_pc
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN es ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT l_partkey AS p_partkey, p_size,
        |  CAST(min_pc AS DOUBLE) / 100.0 AS min_price,
        |  l_suppkey AS s_suppkey, s_name, n_name
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_partkey
        |    ORDER BY min_pc, l_suppkey) AS rn FROM ps)
        |WHERE rn = 1""".stripMargin,
    // HAVING compares EXACT decimals (value*1000 > total) on both sides
    "q11_important_parts" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS val_dec
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_0')
        |  GROUP BY 1)
        |SELECT l_partkey AS p_partkey, CAST(val_dec AS DOUBLE) AS part_value
        |FROM pp WHERE val_dec * 1000 > (SELECT sum(val_dec) FROM pp)""".stripMargin,
    "q16_supplier_count" ->
      """SELECT p_brand, p_size % 10 AS size_class,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2""".stripMargin,
    // dominance compares exact integer cents: qty*2 > part total
    "q20_dominant_supp" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS qty_c
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-01-01'
        |  GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, sum(qty_c) AS total_c, count(*) AS n_supp
        |  FROM ps GROUP BY 1)
        |SELECT s_suppkey, s_name, n_parts_dominated FROM (
        |  SELECT ps.l_suppkey, count(*) AS n_parts_dominated
        |  FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
        |  WHERE pt.n_supp > 1 AND ps.qty_c * 2 > pt.total_c
        |  GROUP BY 1) d
        |JOIN supplier ON l_suppkey = s_suppkey""".stripMargin,
    "q_pivot_daily" ->
      """SELECT epoch_us(date_trunc('day', ts)) AS day_us,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        |FROM events GROUP BY 1""".stripMargin,
    // stats from exact decimal sums; z arithmetic ordered identically
    "ts_zscore" ->
      """WITH st AS (
        |  SELECT user_id, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean,
        |    CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
        |      AS DOUBLE) / count(*) AS msq
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, e.value,
        |  (e.value - st.mean) / sqrt(st.msq - st.mean * st.mean) AS z_score
        |FROM events e JOIN st USING (user_id)
        |WHERE st.n >= 2 AND st.msq - st.mean * st.mean > 0
        |  AND abs((e.value - st.mean) / sqrt(st.msq - st.mean * st.mean)) > 2.5""".stripMargin,
    "ts_interp_linear" ->
      """WITH hourly AS (
        |  SELECT user_id, epoch_us(date_trunc('hour', ts)) // 3600000000 AS hour,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_v
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(h0, h1)) AS hour FROM (
        |    SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1)),
        |j AS (
        |  SELECT s.user_id, s.hour, h.avg_v,
        |    last_value(h.avg_v IGNORE NULLS) OVER (
        |      PARTITION BY s.user_id ORDER BY s.hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        |    last_value(CASE WHEN h.avg_v IS NOT NULL THEN s.hour END IGNORE NULLS)
        |      OVER (PARTITION BY s.user_id ORDER BY s.hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
        |    first_value(h.avg_v IGNORE NULLS) OVER (
        |      PARTITION BY s.user_id ORDER BY s.hour
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        |    first_value(CASE WHEN h.avg_v IS NOT NULL THEN s.hour END IGNORE NULLS)
        |      OVER (PARTITION BY s.user_id ORDER BY s.hour
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
        |  FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour)
        |SELECT user_id, hour * 3600000000 AS hour_us,
        |  CASE WHEN avg_v IS NOT NULL THEN avg_v
        |    ELSE prev_v + (next_v - prev_v) *
        |      (CAST(hour - prev_h AS DOUBLE) / CAST(next_h - prev_h AS DOUBLE))
        |  END AS interp_v,
        |  CAST(avg_v IS NULL AS INTEGER) AS is_gap
        |FROM j""".stripMargin,
    "stream_interval_join" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  epoch_us(v.ts) AS v_ts_us
        |FROM events p JOIN events v
        |  ON v.user_id = p.user_id
        |  AND v.event_type = 'view' AND p.event_type = 'purchase'
        |  AND v.ts >= p.ts - INTERVAL 4 HOUR AND v.ts < p.ts""".stripMargin,
    "stream_dedup" ->
      """SELECT event_type, count(*) AS n_unique FROM (
        |  SELECT DISTINCT event_id, event_type FROM (
        |    SELECT event_id, event_type FROM events
        |    UNION ALL SELECT event_id, event_type FROM events))
        |GROUP BY 1""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "dedup_exact" -> OracleSqlGen.dedupExact,
    "dedup_prefix" ->
      """SELECT md5(substr(text, 1, 64)) AS prefix_md5,
        |  count(*) AS n_docs, min(doc_id) AS keep_doc_id
        |FROM documents GROUP BY 1 HAVING count(*) >= 2""".stripMargin,
    "dedup_survivor" -> SurvivorSql,
    "pipeline_curate" ->
      s"""SELECT l.doc_id,
         |  CAST(s.keep = 1 AND l.pred_lang = 'en' AND q.n_tokens >= 10
         |    AND q.stop_ratio >= 0.1 AS INTEGER) AS kept
         |FROM (${OracleSqlGen.textLangid}) l
         |JOIN (${OracleSqlGen.textQuality}) q ON l.doc_id = q.doc_id
         |JOIN ($SurvivorSql) s ON l.doc_id = s.doc_id""".stripMargin,
    "pipeline_funnel" ->
      s"""SELECT count(*) AS n_total,
         |  CAST(sum(CASE WHEN s.keep = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_survivor,
         |  CAST(sum(CASE WHEN l.pred_lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_en,
         |  CAST(sum(CASE WHEN q.n_tokens >= 10 AND q.stop_ratio >= 0.1
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |  CAST(sum(CASE WHEN s.keep = 1 AND l.pred_lang = 'en'
         |    AND q.n_tokens >= 10 AND q.stop_ratio >= 0.1
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM (${OracleSqlGen.textLangid}) l
         |JOIN (${OracleSqlGen.textQuality}) q ON l.doc_id = q.doc_id
         |JOIN ($SurvivorSql) s ON l.doc_id = s.doc_id""".stripMargin,
    "dedup_ngram_jaccard" -> OracleSqlGen.dedupNgramJaccard,
    "dedup_ngram_jaccard_capped" -> OracleSqlGen.dedupNgramJaccardCapped,
    "dedup_containment" -> OracleSqlGen.dedupContainment,
    "dedup_containment_capped" -> OracleSqlGen.dedupContainmentCapped,
    "dedup_minhash_lsh" -> OracleSqlGen.dedupMinhashLsh,
    "dedup_simhash" -> OracleSqlGen.dedupSimhash,
    "dedup_simhash_pairs" -> OracleSqlGen.dedupSimhashPairs,
    "dedup_embedding" -> OracleSqlGen.dedupEmbedding,
    "dedup_cluster" -> OracleSqlGen.dedupCluster,
    "dedup_cluster_survivor" -> OracleSqlGen.dedupClusterSurvivor,
    "dedup_cluster_incremental" -> OracleSqlGen.dedupClusterIncremental,
    "dedup_incremental" -> OracleSqlGen.dedupIncremental,
    // #207 shares #96's semantics by construction (streaming-safe shape)
    "stream_dedup_incremental" -> OracleSqlGen.dedupIncremental,
    "stream_ann_probe" -> OracleSqlGen.annBatchIvfTopk,
    "dedup_substring" -> OracleSqlGen.dedupSubstring,
    "dedup_spans" -> OracleSqlGen.dedupSpans,
    "ann_topk_brute" -> OracleSqlGen.annTopkBrute,
    "ann_lsh_bucket" -> OracleSqlGen.annLshBucket,
    "knn_label_centroid" -> OracleSqlGen.knnLabelCentroid,
    "ann_ivf_topk" -> OracleSqlGen.annIvfTopk,
    "ann_batch_topk" -> OracleSqlGen.annBatchTopk,
    "ann_range" -> OracleSqlGen.annRange,
    "emb_kmeans_step" -> OracleSqlGen.embKmeansStep,
    "emb_norm_stats" -> OracleSqlGen.embNormStats,
    "emb_remove_top_pc" -> OracleSqlGen.embRemoveTopPc,
    "emb_power_iter" -> OracleSqlGen.embPowerIter,
    "ann_pq_topk" -> OracleSqlGen.annPqTopk,
    "ann_ivfpq_topk" -> OracleSqlGen.annIvfPqTopk,
    "text_langid" -> OracleSqlGen.textLangid,
    "text_quality" -> OracleSqlGen.textQuality,
    "text_tokens" -> OracleSqlGen.textTokens,
    "text_fingerprint" -> OracleSqlGen.textFingerprint,
    "text_rolling_hash" -> OracleSqlGen.textRollingHash,
    "text_bigrams" -> OracleSqlGen.textBigrams,
    "text_bigram_lift" -> OracleSqlGen.textBigramLift,
    "text_top_term" -> OracleSqlGen.textTopTerm,
    "sample_stratified" ->
      """SELECT source, count(*) AS n_sampled, min(doc_id) AS first_doc
        |FROM documents
        |WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT % 10 = 0
        |GROUP BY source""".stripMargin,
    "text_scrub_digits" ->
      """SELECT doc_id,
        |  md5(regexp_replace(text, '[0-9]{3,}', '<NUM>', 'g')) AS scrubbed_md5,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
        |    AS n_digits,
        |  CAST(text <> regexp_replace(text, '[0-9]{3,}', '<NUM>', 'g') AS INTEGER)
        |    AS was_scrubbed
        |FROM documents""".stripMargin,
    "text_scrub_pii" -> OracleSqlGen.textScrubPii,
    "text_repetition" -> OracleSqlGen.textRepetition,
    "doc_pack_bins" -> OracleSqlGen.docPackBins,
    "text_decontaminate" -> OracleSqlGen.textDecontaminate,
    "text_decontaminate_fuzzy" -> OracleSqlGen.textDecontaminateFuzzy,
    "doc_mix_weights" -> OracleSqlGen.docMixWeights,
    "doc_mix_temperature" -> OracleSqlGen.docMixTemperature,
    "ann_mmr_rerank" -> OracleSqlGen.annMmrRerank,
    "dedup_minhash_est" -> OracleSqlGen.dedupMinhashEst,
    "emb_centroid_shift" -> OracleSqlGen.embCentroidShift,
    "dedup_jaccard_histogram" -> OracleSqlGen.dedupJaccardHistogram,
    "dedup_band_stats" -> OracleSqlGen.dedupBandStats,
    "emb_ivf_balance" -> OracleSqlGen.embIvfBalance,
    "text_lang_confusion" -> OracleSqlGen.textLangConfusion,
    "mm_phash_clusters" -> OracleSqlGen.mmPhashClusters,
    "emb_pq_distortion" -> OracleSqlGen.embPqDistortion,
    "emb_semdedup" -> OracleSqlGen.embSemDedup,
    "text_char_lm" -> OracleSqlGen.textCharLm,
    "text_dsir" -> OracleSqlGen.textDsir,
    "ann_recall_vs_nprobe" -> OracleSqlGen.annRecallVsNprobe,
    "emb_ivf_recall" -> OracleSqlGen.embIvfRecall,
    "q_rfm_segments" -> OracleSqlGen.qRfmSegments,
    "text_heaps_vocab" -> OracleSqlGen.textHeapsVocab,
    "dedup_winnow" -> OracleSqlGen.dedupWinnow,
    "dedup_winnow_pairs" -> OracleSqlGen.dedupWinnowPairs,
    "emb_triplet_mine" -> OracleSqlGen.embTripletMine,
    // day-value lags: missing days must yield NULL deltas
    "ts_dod_wow" ->
      """WITH pd AS (SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
        |    count(*) AS cnt FROM events GROUP BY 1, 2)
        |SELECT a.event_type, a.day_us, a.cnt,
        |  a.cnt - p.cnt AS dod, a.cnt - w.cnt AS wow
        |FROM pd a
        |LEFT JOIN pd p ON a.event_type = p.event_type
        |  AND p.day_us = a.day_us - 86400000000
        |LEFT JOIN pd w ON a.event_type = w.event_type
        |  AND w.day_us = a.day_us - 604800000000""".stripMargin,
    "q_market_basket" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pairs AS (SELECT a.pk AS p1, b.pk AS p2, count(*) AS c_ab
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
        |supp AS (SELECT pk, count(*) AS c FROM op GROUP BY 1),
        |n AS (SELECT count(DISTINCT ok) AS n FROM op)
        |SELECT p1, p2, c_ab,
        |  CAST(CAST(c_ab AS DECIMAL(38,0)) * n AS DOUBLE)
        |    / CAST(CAST(sa.c AS DECIMAL(38,0)) * sb.c AS DOUBLE) AS lift
        |FROM pairs JOIN supp sa ON p1 = sa.pk JOIN supp sb ON p2 = sb.pk, n
        |ORDER BY c_ab DESC, p1, p2 LIMIT 20""".stripMargin,
    // the cascade's decimal sums are associative-exact, so each grain
    // equals the direct-at-grain aggregate
    "ts_rollup_cascade" ->
      """SELECT 'hour' AS grain, epoch_us(date_trunc('hour', ts)) AS bucket_us,
        |  event_type, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 2, 3
        |UNION ALL
        |SELECT 'day', epoch_us(date_trunc('day', ts)), event_type, count(*),
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |FROM events GROUP BY 2, 3
        |UNION ALL
        |SELECT 'month', epoch_us(date_trunc('month', ts)), event_type, count(*),
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |FROM events GROUP BY 2, 3""".stripMargin,
    "mm_byte_ioc" ->
      """WITH b AS (SELECT doc_id,
        |    ('0x' || substr(hex(text), 2 * CAST(i AS INTEGER) - 1, 2))::BIGINT AS byte
        |  FROM (SELECT doc_id, text, unnest(generate_series(1, strlen(text))) AS i
        |    FROM documents WHERE strlen(text) >= 2)),
        |c AS (SELECT doc_id, byte, count(*) AS cnt FROM b GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bytes,
        |  count(*) AS n_distinct,
        |  CAST(sum(cnt * (cnt - 1)) AS DOUBLE) /
        |    CAST(sum(cnt) * (sum(cnt) - 1) AS DOUBLE) AS ioc
        |FROM c GROUP BY doc_id""".stripMargin,
    "emb_knn_outliers" -> OracleSqlGen.embKnnOutliers,
    "emb_knn_graph" -> OracleSqlGen.embKnnGraph,
    "emb_nn_descent_step" -> OracleSqlGen.embNnDescentStep,
    // doubled-integer p50 (no division until the report); p95 = exact
    // order statistic at the first rank with 20*rn >= 19*n
    "doc_len_percentiles" ->
      """WITH t AS (SELECT source, doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))
        |      AS n_toks
        |  FROM documents),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY source ORDER BY n_toks, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n FROM t)
        |SELECT source, max(n) AS n_docs,
        |  CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN n_toks END) +
        |    sum(CASE WHEN rn = (n + 2) // 2 THEN n_toks END) AS DOUBLE) / 2.0
        |    AS p50_tokens,
        |  CAST(min(CASE WHEN rn * 20 >= n * 19 THEN n_toks END) AS BIGINT)
        |    AS p95_tokens
        |FROM r GROUP BY 1""".stripMargin,
    // islands via the same lag + running-sum pair, all integers
    "ts_error_bursts" ->
      """WITH m AS (SELECT user_id, event_id, ts,
        |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        |  FROM events),
        |b AS (SELECT *,
        |    CASE WHEN is_err = 1 AND coalesce(lag(is_err, 1) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id), 0) = 1
        |      THEN 0 ELSE 1 END AS brk
        |  FROM m),
        |i AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS island
        |  FROM b)
        |SELECT user_id, epoch_us(min(ts)) AS start_us,
        |  epoch_us(max(ts)) AS end_us, count(*) AS burst_len
        |FROM i WHERE is_err = 1 GROUP BY user_id, island
        |HAVING count(*) >= 3""".stripMargin,
    // doubled-integer medians: odd n -> 2·middle, even -> lower+upper;
    // the flag compares integers (2d > 3·mad2 <=> |v-med| > 3·MAD)
    "ts_anomaly_mad" ->
      """WITH b AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v100
        |  FROM events),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id ORDER BY v100, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n FROM b),
        |m AS (SELECT user_id,
        |    CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN v100 END) +
        |      sum(CASE WHEN rn = (n + 2) // 2 THEN v100 END) AS BIGINT) AS m2
        |  FROM r GROUP BY 1),
        |d AS (SELECT b.*, m.m2, abs(2 * b.v100 - m.m2) AS dd
        |  FROM b JOIN m USING (user_id)),
        |r2 AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id ORDER BY dd, event_id) AS rn2,
        |    count(*) OVER (PARTITION BY user_id) AS n2 FROM d),
        |mt AS (SELECT user_id,
        |    CAST(sum(CASE WHEN rn2 = (n2 + 1) // 2 THEN dd END) +
        |      sum(CASE WHEN rn2 = (n2 + 2) // 2 THEN dd END) AS BIGINT) AS mad2
        |  FROM r2 GROUP BY 1)
        |SELECT event_id, d.user_id, ts_us, value,
        |  CAST(dd AS DOUBLE) / 200.0 AS dev,
        |  CAST(mad2 AS DOUBLE) / 400.0 AS mad
        |FROM d JOIN mt ON d.user_id = mt.user_id
        |WHERE mad2 > 0 AND 2 * dd > 3 * mad2""".stripMargin,
    // breach compares integers (err*100 > total); burn divides in the
    // same (double(err) / total) / 0.01 order
    "ts_sla_burn" ->
      """SELECT epoch_us(date_trunc('day', ts)) AS day_us,
        |  count(*) AS n_total,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_err,
        |  (CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*)) / 0.01 AS burn,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 100
        |    > count(*) AS INTEGER) AS breach
        |FROM events GROUP BY 1""".stripMargin,
    "doc_split_holdout" ->
      """WITH d AS (SELECT source,
        |    CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
        |      1, 8))::BIGINT % 20 = 0 THEN 'val' ELSE 'train' END AS split,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))
        |      AS n_toks
        |  FROM documents)
        |SELECT source, split, count(*) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens
        |FROM d GROUP BY 1, 2""".stripMargin,
    // every ratio compares as an integer cross-product (no float divs)
    "text_gopher_rules" ->
      """WITH g AS (SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(t) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(t, x -> length(x))), 0)
        |      AS BIGINT) AS n_tok_chars,
        |    CAST(length(text) -
        |      length(regexp_replace(text, '[#*>|=_~]', '', 'g')) AS BIGINT) AS n_sym,
        |    CAST(len(list_filter(t,
        |      x -> x IN ('the','a','and','of','to','in','is'))) AS BIGINT) AS n_stop
        |  FROM g)
        |SELECT doc_id, n_words,
        |  CAST(n_words >= 10 AND n_words <= 100000 AS INTEGER) AS ok_words,
        |  CAST(n_tok_chars >= 3 * n_words AND n_tok_chars <= 10 * n_words
        |    AS INTEGER) AS ok_mean_len,
        |  CAST(n_sym * 100 < 10 * n_words AS INTEGER) AS ok_symbols,
        |  CAST(n_stop >= 2 AS INTEGER) AS ok_stops,
        |  CAST(n_words >= 10 AND n_words <= 100000
        |    AND n_tok_chars >= 3 * n_words AND n_tok_chars <= 10 * n_words
        |    AND n_sym * 100 < 10 * n_words AND n_stop >= 2 AS INTEGER) AS keep
        |FROM m""".stripMargin,
    "doc_shard_assign" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))
        |      AS n_toks
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM d GROUP BY 1""".stripMargin,
    // quantize/reconstruct/error chains parenthesized exactly as the
    // Spark side; per-row error sums floor onto the 2^40 fixed-point
    // grid so cross-row sums are exact integers
    "emb_quantize_sq" ->
      """WITH v AS (SELECT label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
        |mm AS (SELECT min(list_min(e)) AS lo, max(list_max(e)) AS hi FROM v),
        |p AS (SELECT label,
        |    list_transform(e, x -> x - (lo +
        |      ((least(255.0, greatest(0.0, floor(((x - lo) * 255) / (hi - lo))))
        |        + 0.5) * (hi - lo)) / 255)) AS errs
        |  FROM v CROSS JOIN mm),
        |r AS (SELECT label,
        |    CAST(list_sum(list_transform(errs,
        |      er -> CAST(floor((er * er) * 1099511627776) AS BIGINT))) AS HUGEINT)
        |      AS sse_fix,
        |    list_max(list_transform(errs, er -> abs(er))) AS max_abs
        |  FROM p)
        |SELECT label, count(*) AS n_vecs,
        |  (CAST(sum(sse_fix) AS DOUBLE) / 1099511627776) / (count(*) * 64) AS mse,
        |  max(max_abs) AS max_abs_err
        |FROM r GROUP BY 1""".stripMargin,
    // bucket selection compares integers (10*cum >= 9*total); the
    // interpolation division chain mirrors the Spark when()-chain
    // lowest-bucket-first
    "ts_histogram_quantile" ->
      """WITH a AS (SELECT event_type, count(*) AS total,
        |  CAST(sum(CASE WHEN value <= 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |  CAST(sum(CASE WHEN value <= 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |  CAST(sum(CASE WHEN value <= 25.0 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |  CAST(sum(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |  CAST(sum(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
        |  CAST(sum(CASE WHEN value <= 250.0 THEN 1 ELSE 0 END) AS BIGINT) AS c5,
        |  CAST(sum(CASE WHEN value <= 500.0 THEN 1 ELSE 0 END) AS BIGINT) AS c6
        |  FROM events GROUP BY 1)
        |SELECT event_type, total, c0, c1, c2, c3, c4, c5, c6,
        |  CASE
        |  WHEN c0 * 10 >= total * 9 AND c0 - 0 > 0 THEN
        |    0.0 + (((total * 9) / 10.0 - CAST(0 AS DOUBLE)) / CAST(c0 - 0 AS DOUBLE)) * (5.0 - 0.0)
        |  WHEN c1 * 10 >= total * 9 AND c1 - c0 > 0 THEN
        |    5.0 + (((total * 9) / 10.0 - CAST(c0 AS DOUBLE)) / CAST(c1 - c0 AS DOUBLE)) * (10.0 - 5.0)
        |  WHEN c2 * 10 >= total * 9 AND c2 - c1 > 0 THEN
        |    10.0 + (((total * 9) / 10.0 - CAST(c1 AS DOUBLE)) / CAST(c2 - c1 AS DOUBLE)) * (25.0 - 10.0)
        |  WHEN c3 * 10 >= total * 9 AND c3 - c2 > 0 THEN
        |    25.0 + (((total * 9) / 10.0 - CAST(c2 AS DOUBLE)) / CAST(c3 - c2 AS DOUBLE)) * (50.0 - 25.0)
        |  WHEN c4 * 10 >= total * 9 AND c4 - c3 > 0 THEN
        |    50.0 + (((total * 9) / 10.0 - CAST(c3 AS DOUBLE)) / CAST(c4 - c3 AS DOUBLE)) * (100.0 - 50.0)
        |  WHEN c5 * 10 >= total * 9 AND c5 - c4 > 0 THEN
        |    100.0 + (((total * 9) / 10.0 - CAST(c4 AS DOUBLE)) / CAST(c5 - c4 AS DOUBLE)) * (250.0 - 100.0)
        |  WHEN c6 * 10 >= total * 9 AND c6 - c5 > 0 THEN
        |    250.0 + (((total * 9) / 10.0 - CAST(c5 AS DOUBLE)) / CAST(c6 - c5 AS DOUBLE)) * (500.0 - 250.0)
        |  END AS p90
        |FROM a""".stripMargin,
    "mm_binary_meta" -> OracleSqlGen.mmBinaryMeta,
    "mm_frame_sample" -> OracleSqlGen.mmFrameSample,
    "mm_decode_stub" -> OracleSqlGen.mmDecodeStub,
    // the REAL decode: the oracle recomputes the rasterized formula;
    // the engine must round-trip it through actual PNG bytes
    "mm_decode_image" -> {
      val side = graft.operators.Multimodal.ImgSide
      val cell = side / graft.operators.Multimodal.ImgGrid
      s"""WITH g AS (SELECT unnest(generate_series(0, ${side - 1})) AS i),
         |px AS (SELECT d.doc_id, gx.i AS x, gy.i AS y,
         |    (d.doc_id * 31 + gx.i * 7 + gy.i * 13) % 256 AS p
         |  FROM documents d, g gx, g gy)
         |SELECT doc_id, CAST($side AS BIGINT) AS width,
         |  CAST($side AS BIGINT) AS height,
         |  CAST(x // $cell AS BIGINT) AS gx, CAST(y // $cell AS BIGINT) AS gy,
         |  CAST(sum(p) AS BIGINT) AS luma_sum
         |FROM px GROUP BY doc_id, x // $cell, y // $cell""".stripMargin
    },
    // the REAL audio decode: oracle recomputes the PCM formula; the
    // engine must round-trip it through actual WAV container bytes
    "mm_decode_audio" -> {
      val nf = graft.operators.Multimodal.AudFrames
      val nb = graft.operators.Multimodal.AudBlocks
      val rate = graft.operators.Multimodal.AudRate
      s"""WITH s AS (SELECT d.doc_id, g.i,
         |    (d.doc_id * 17 + g.i * 11) % 256 AS p
         |  FROM documents d, (SELECT unnest(generate_series(0, ${nf - 1})) AS i) g)
         |SELECT doc_id, CAST($rate AS BIGINT) AS sample_rate,
         |  CAST($nf AS BIGINT) AS n_frames,
         |  CAST(i // ${nf / nb} AS BIGINT) AS blk,
         |  CAST(sum(p) AS BIGINT) AS pcm_sum
         |FROM s GROUP BY doc_id, i // ${nf / nb}""".stripMargin
    },
    // robust decoders: varied containers + the poison slice — the
    // oracle replays formulas, container cycle and corruption arithmetic
    "mm_decode_image_robust" -> OracleSqlGen.mmDecodeImageRobust,
    "mm_decode_audio_robust" -> OracleSqlGen.mmDecodeAudioRobust,
    "mm_chunk" -> {
      val cb = graft.operators.Multimodal.ChunkBytes
      s"""WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents),
         |c AS (SELECT doc_id, n_bytes,
         |    unnest(generate_series(0, (n_bytes - 1) // $cb)) AS chunk_idx
         |  FROM b WHERE n_bytes > 0)
         |SELECT doc_id, n_bytes, chunk_idx,
         |  least($cb, n_bytes - chunk_idx * $cb) AS chunk_len FROM c""".stripMargin
    },
    "mm_dedup" ->
      """SELECT md5(text) AS payload_md5, count(*) AS n_blobs,
        |  min(doc_id) AS keep_doc_id,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1""".stripMargin,
    "mm_phash" -> OracleSqlGen.mmPhashPairs,
    "mm_phash_incremental" -> OracleSqlGen.mmPhashIncremental,
    "ts_cross_corr" -> OracleSqlGen.tsCrossCorr,
    "text_bpe_merge" -> OracleSqlGen.textBpeMerge,
    "text_bpe_apply" -> OracleSqlGen.textBpeApply,
    "text_bpe_fertility" -> OracleSqlGen.textBpeFertility,
    "emb_ivf_purity" -> OracleSqlGen.embIvfPurity,
    "mm_phash_hist" -> OracleSqlGen.mmPhashHist,
    "q_basket_rules" ->
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |pairs AS (SELECT a.pk AS p1, b.pk AS p2, count(*) AS c_ab
         |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2
         |  HAVING count(*) >= ${Analytics.RuleMinSup}),
         |supp AS (SELECT pk, count(*) AS c FROM op GROUP BY 1),
         |n AS (SELECT count(DISTINCT ok) AS n_ord FROM op),
         |scored AS (SELECT p1, p2, c_ab, sa.c AS c_1, sb.c AS c_2
         |  FROM pairs JOIN supp sa ON p1 = sa.pk JOIN supp sb ON p2 = sb.pk),
         |rules AS (
         |  SELECT p1 AS ante, p2 AS cons, c_ab, c_1 AS c_a, c_2 AS c_b FROM scored
         |  UNION ALL
         |  SELECT p2, p1, c_ab, c_2, c_1 FROM scored)
         |SELECT ante, cons, CAST(c_ab AS BIGINT) AS c_ab,
         |  CAST(c_ab AS DOUBLE) / c_a AS conf,
         |  CAST(CAST(c_ab AS DECIMAL(38,0)) * n_ord AS DOUBLE)
         |    / CAST(CAST(c_a AS DECIMAL(38,0)) * c_b AS DOUBLE) AS lift
         |FROM rules, n
         |ORDER BY lift DESC, ante, cons LIMIT ${Analytics.RuleTopK}""".stripMargin,
    "text_source_drift" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sw AS (SELECT d.source, unnest(t.t) AS w
        |  FROM documents d JOIN toks t USING (doc_id)),
        |wc AS (SELECT source, w, count(*) AS c FROM sw GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM wc GROUP BY 1),
        |co AS (SELECT a.source AS s1, b.source AS s2,
        |    sum(abs(CAST(a.c AS DECIMAL(38,0)) * tb.n
        |          - CAST(b.c AS DECIMAL(38,0)) * ta.n)) AS co_abs,
        |    sum(CAST(a.c AS DECIMAL(38,0)) * tb.n) AS co_12,
        |    sum(CAST(b.c AS DECIMAL(38,0)) * ta.n) AS co_21
        |  FROM wc a JOIN wc b ON a.w = b.w AND a.source < b.source
        |  JOIN tot ta ON ta.source = a.source
        |  JOIN tot tb ON tb.source = b.source
        |  GROUP BY 1, 2),
        |pairs AS (SELECT a.source AS s1, a.n AS n1, b.source AS s2, b.n AS n2
        |  FROM tot a JOIN tot b ON a.source < b.source)
        |SELECT s1, s2, n1, n2,
        |  CAST(coalesce(co_abs, 0)
        |    + (CAST(n1 AS DECIMAL(38,0)) * n2 - coalesce(co_12, 0))
        |    + (CAST(n1 AS DECIMAL(38,0)) * n2 - coalesce(co_21, 0)) AS DOUBLE)
        |    / (2.0 * n1 * n2) AS tv
        |FROM pairs LEFT JOIN co USING (s1, s2)""".stripMargin,
    "q_decile_lift" ->
      """WITH pc AS (SELECT o_custkey,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nc,
        |    CAST(sum(rev) AS BIGINT) AS total_rev FROM pc),
        |r AS (SELECT rev,
        |    row_number() OVER (ORDER BY rev DESC, o_custkey) AS rn FROM pc),
        |d AS (SELECT ((rn - 1) * 10) // nc + 1 AS decile, rev, total_rev
        |  FROM r CROSS JOIN tot),
        |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
        |    CAST(sum(rev) AS BIGINT) AS rev_cents,
        |    max(total_rev) AS total_rev
        |  FROM d GROUP BY 1)
        |SELECT CAST(decile AS BIGINT) AS decile, n_customers, rev_cents,
        |  CAST(rev_cents AS DOUBLE) / total_rev AS rev_share,
        |  CAST(sum(rev_cents) OVER (ORDER BY decile
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / total_rev AS cum_rev_share
        |FROM g""".stripMargin,
    "q_event_paths" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
        |  FROM events),
        |p AS (SELECT event_type || '>' ||
        |    lead(event_type, 1) OVER w || '>' ||
        |    lead(event_type, 2) OVER w AS path
        |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
        |SELECT path, CAST(count(*) AS BIGINT) AS cnt
        |FROM p WHERE path IS NOT NULL
        |GROUP BY 1 ORDER BY cnt DESC, path LIMIT 10""".stripMargin,
    "text_bpe_train" -> OracleSqlGen.textBpeTrain,
    "emb_silhouette" -> OracleSqlGen.embSilhouette,
    "emb_pagerank_knn" -> OracleSqlGen.embPagerankKnn,
    "text_dup_ngram_frac" -> OracleSqlGen.textDupNgramFrac,
    "emb_dim_stats" -> OracleSqlGen.embDimStats,
    "q_attribution" -> OracleSqlGen.qAttribution,
    "ts_holt_backtest" -> OracleSqlGen.tsHoltBacktest,
    "ann_pq_recall" -> OracleSqlGen.annPqRecall,
    "emb_kcenter_init" -> OracleSqlGen.embKcenterInit,
    "emb_kmeans_train" -> OracleSqlGen.embKmeansTrain,
    "ts_trend_fit" -> OracleSqlGen.tsTrendFit,
    "q_growth_accounting" -> OracleSqlGen.qGrowthAccounting,
    "text_search_tfidf" -> OracleSqlGen.textSearchTfidf,
    "ts_sla_multiwindow" -> OracleSqlGen.tsSlaMultiwindow,
    "source_jsonl_roundtrip" -> OracleSqlGen.sourceJsonlRoundtrip,
    "dedup_span_removal" -> OracleSqlGen.dedupSpanRemoval,
    "helix_scan_range" -> OracleSqlGen.helixScanRange,
    "helix_get_point" -> OracleSqlGen.helixGetPoint,
    "helix_multiget" -> OracleSqlGen.helixMultiget,
    "helix_latest" -> OracleSqlGen.helixLatest,
    "helix_outdate_scan" -> OracleSqlGen.helixOutdateScan,
    "helix_stream_scan" -> OracleSqlGen.helixStreamScan,
    "helix_scan_custom_order" -> OracleSqlGen.helixScanCustomOrder,
    "ts_gap_fill_range" -> OracleSqlGen.tsGapFillRange,
    "ann_filtered_topk" -> OracleSqlGen.annFilteredTopk,
    "ann_batch_ivf_topk" -> OracleSqlGen.annBatchIvfTopk,
    "ann_filtered_adaptive" -> OracleSqlGen.annFilteredAdaptive,
    "dedup_embedding_capped" -> OracleSqlGen.dedupEmbeddingCapped,
    "dedup_simhash_pairs_capped" -> OracleSqlGen.dedupSimhashPairsCapped,
    "dedup_minhash_lsh_capped" -> OracleSqlGen.dedupMinhashLshCapped,
    // #dedup_index_commit shares #241's oracle: the committed
    // generation must serve the from-scratch capped miner bit-equal
    "dedup_index_commit" -> OracleSqlGen.dedupMinhashLshCapped,
    "dedup_index_commit_report" -> OracleSqlGen.dedupIndexCommitReport,
    "mm_phash_pairs_capped" -> OracleSqlGen.mmPhashPairsCapped,
    "dedup_bloom_incremental" -> OracleSqlGen.dedupBloomIncremental,
    "ann_bq_ivf" -> OracleSqlGen.annBqIvf,
    "ann_graph_probe" -> OracleSqlGen.annGraphProbe,
    "ann_graph_recall" -> OracleSqlGen.annGraphRecall,
    "ann_sq_rerank" -> OracleSqlGen.annSqRerank,
    "emb_cos_hist" -> OracleSqlGen.embCosHist,
    "doc_interleave" ->
      """WITH h AS (SELECT doc_id, source,
        |    md5(CAST(doc_id AS VARCHAR)) AS hk FROM documents),
        |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY hk, doc_id) AS grank FROM h),
        |si AS (SELECT source, row_number() OVER (ORDER BY source) - 1 AS sidx
        |  FROM (SELECT DISTINCT source FROM documents)),
        |n AS (SELECT count(*) AS ns FROM si)
        |SELECT r.doc_id, r.source, CAST(r.grank AS BIGINT) AS grank,
        |  CAST((r.grank - 1) * ns + sidx AS BIGINT) AS slot
        |FROM r JOIN si USING (source) CROSS JOIN n""".stripMargin,
    "ts_counter_correct" ->
      """WITH b AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |l AS (SELECT user_id, ts_us, event_id, cents,
        |    lag(cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |      AS prev FROM b),
        |c AS (SELECT user_id, ts_us, event_id, cents,
        |    sum(CASE WHEN prev > cents THEN prev ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS UNBOUNDED PRECEDING) AS comp
        |  FROM l)
        |SELECT user_id, ts_us, event_id,
        |  CAST(cents + comp AS BIGINT) AS adj_cents,
        |  CAST(cents + comp AS DOUBLE) / 100 AS adj
        |FROM c""".stripMargin,
    "stream_counter_correct" ->
      """WITH b AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |l AS (SELECT user_id, cents,
        |    lag(cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |      AS prev FROM b),
        |a AS (SELECT user_id,
        |    CAST(sum(CASE WHEN prev > cents THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_resets,
        |    CAST(sum(CASE WHEN prev > cents THEN prev ELSE 0 END) AS BIGINT)
        |      AS comp_total
        |  FROM l GROUP BY 1),
        |last AS (SELECT user_id, cents AS last_cents FROM (
        |    SELECT user_id, cents, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_us DESC, event_id DESC) AS rn FROM b) WHERE rn = 1)
        |SELECT a.user_id, n_resets,
        |  CAST(last_cents + comp_total AS BIGINT) AS final_adj_cents
        |FROM a JOIN last USING (user_id)""".stripMargin,
    "ts_subquery_maxrate" ->
      """WITH hourly AS (
        |  SELECT user_id, epoch_us(date_trunc('day', ts)) AS day_us,
        |    epoch_us(date_trunc('hour', ts)) AS hour_us,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / 3600.0 AS hr_rate
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT user_id, day_us, max(hr_rate) AS max_rate,
        |  CAST(count(*) AS BIGINT) AS n_hours
        |FROM hourly GROUP BY 1, 2""".stripMargin,
    "ts_absent" ->
      s"""WITH agg AS (
         |  SELECT user_id, max(epoch_us(ts)) AS last_ts_us,
         |    sum(CASE WHEN ts >= TIMESTAMP '${TimeSeriesOps.AbsentCutoff}'
         |      THEN 1 ELSE 0 END) AS recent_cnt
         |  FROM events GROUP BY 1)
         |SELECT user_id, last_ts_us,
         |  CAST(floor((epoch_us(TIMESTAMP '${TimeSeriesOps.AbsentNow}') - last_ts_us)
         |    / 3600000000.0) AS BIGINT) AS stale_hours
         |FROM agg WHERE recent_cnt = 0""".stripMargin,
    "q_skew_stats" ->
      """WITH perkey AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |hist AS (SELECT cnt, count(*) AS nk FROM perkey GROUP BY 1),
        |cum AS (SELECT cnt, nk, sum(nk) OVER (ORDER BY cnt) AS ck FROM hist),
        |tot AS (SELECT CAST(sum(cnt * nk) AS BIGINT) AS n_rows,
        |    CAST(sum(nk) AS BIGINT) AS n_keys, max(cnt) AS top1_rows FROM hist),
        |sel AS (SELECT
        |    min(CASE WHEN ck >= (n_keys + 1) // 2 THEN cnt END) AS p50_key_rows,
        |    min(CASE WHEN ck >= (n_keys * 99 + 99) // 100 THEN cnt END) AS p99_key_rows
        |  FROM cum, tot)
        |SELECT n_rows, n_keys, top1_rows,
        |  CAST(top1_rows AS DOUBLE) / n_rows AS top1_share,
        |  p50_key_rows, p99_key_rows,
        |  CAST(p99_key_rows AS DOUBLE) / p50_key_rows AS skew_ratio
        |FROM tot, sel""".stripMargin,
    "text_zipf_check" ->
      s"""WITH toks AS (SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |lw AS (SELECT d.lang, unnest(t.t) AS w
         |  FROM documents d JOIN toks t USING (doc_id)),
         |wc AS (SELECT lang, w, count(*) AS cnt FROM lw GROUP BY 1, 2),
         |tot AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_types FROM wc GROUP BY 1),
         |top AS (SELECT lang, cnt, rnk, rnk * cnt AS k FROM (
         |    SELECT lang, cnt, w, row_number() OVER (PARTITION BY lang
         |      ORDER BY cnt DESC, w) AS rnk FROM wc)
         |  WHERE rnk <= ${graft.operators.TextOps.ZipfTopR}),
         |ts AS (SELECT lang, min(k) AS min_k, max(k) AS max_k,
         |    CAST(sum(CASE WHEN rnk <= ${graft.operators.TextOps.ZipfHead}
         |      THEN cnt ELSE 0 END) AS BIGINT) AS head_tokens,
         |    CAST(sum(cnt) AS BIGINT) AS top_tokens FROM top GROUP BY 1)
         |SELECT ts.lang, n_tokens, n_types, min_k, max_k,
         |  CAST(max_k AS DOUBLE) / min_k AS k_spread,
         |  CAST(head_tokens AS DOUBLE) / n_tokens AS head_share,
         |  CAST(top_tokens AS DOUBLE) / n_tokens AS top_share
         |FROM ts JOIN tot USING (lang)""".stripMargin,
    "text_simpson_diversity" ->
      s"""WITH toks AS (SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |tw AS (SELECT doc_id, unnest(t) AS w FROM toks),
         |c AS (SELECT doc_id, w, count(*) AS c FROM tw GROUP BY 1, 2),
         |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_types,
         |    CAST(sum(c * (c - 1)) AS BIGINT) AS rep_num FROM c GROUP BY 1)
         |SELECT doc_id, n_tokens, n_types, rep_num,
         |  CASE WHEN n_tokens < 2 THEN 0.0
         |    ELSE CAST(rep_num AS DOUBLE) / (n_tokens * (n_tokens - 1)) END AS simpson,
         |  CAST(CASE WHEN n_tokens >= 2 AND rep_num * ${graft.operators.TextOps.SimpsonDen}
         |      >= n_tokens * (n_tokens - 1) * ${graft.operators.TextOps.SimpsonNum}
         |    THEN 1 ELSE 0 END AS BIGINT) AS repetitive
         |FROM a""".stripMargin,
    "source_csv_roundtrip" ->
      """SELECT doc_id, md5(text) AS text_md5, lang, source, n_chars
        |FROM documents""".stripMargin,
    "ann_hybrid_rrf" -> OracleSqlGen.annHybridRrf,
    "stream_topk" -> OracleSqlGen.streamTopk,
    "text_ccnet_bucket" -> OracleSqlGen.textCcnetBucket,
    "ts_sample_reservoir" -> OracleSqlGen.tsSampleReservoir,
    "emb_matryoshka_recall" -> OracleSqlGen.embMatryoshkaRecall,
    "stream_anomaly" -> OracleSqlGen.streamAnomaly,
    "mm_cdc_chunks" -> OracleSqlGen.mmCdcChunks,
    "emb_bq_recall" -> OracleSqlGen.embBqRecall,
    "emb_bq_rerank" -> OracleSqlGen.embBqRerank,
    "mm_cdc_incremental" -> OracleSqlGen.mmCdcIncremental,
    "ann_ivf_delete" -> OracleSqlGen.annIvfDelete,
    // #221 shares #219's oracle: same output contract by construction
    "stream_cdc_incremental" -> OracleSqlGen.mmCdcIncremental,
    "ann_ivf_incremental" -> OracleSqlGen.annIvfIncremental,
    "ann_ivf_rebalance" -> OracleSqlGen.annIvfRebalance,
    "ann_ivf_commit" -> OracleSqlGen.annIvfCommit,
    "ann_ivf_commit_report" -> OracleSqlGen.annIvfCommitReport,
    "ann_ivf_gen_delete" -> OracleSqlGen.annIvfGenDelete,
    "ts_increase" ->
      """SELECT user_id, epoch_us(date_trunc('day', ts)) AS day_us,
        |  count(*) AS n_samples,
        |  CAST(sum(CASE WHEN prev IS NULL THEN 0
        |    WHEN cents >= prev THEN cents - prev ELSE cents END) AS BIGINT)
        |    AS increase_cents
        |FROM (SELECT user_id, ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    lag(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER (
        |      PARTITION BY user_id, date_trunc('day', ts)
        |      ORDER BY ts, event_id) AS prev
        |  FROM events)
        |GROUP BY 1, 2""".stripMargin,
    "ts_irate" ->
      """SELECT user_id,
        |  CAST(CASE WHEN cents >= prev_c THEN cents - prev_c ELSE cents END
        |    AS BIGINT) AS d_cents,
        |  CAST(ts_us - prev_ts AS BIGINT) AS dt_us,
        |  CAST(CASE WHEN cents >= prev_c THEN cents - prev_c ELSE cents END
        |    AS DOUBLE) / (CAST(ts_us - prev_ts AS DOUBLE) / 1000000.0)
        |    AS rate_per_s
        |FROM (SELECT user_id, epoch_us(ts) AS ts_us, cents,
        |    lag(epoch_us(ts)) OVER w AS prev_ts,
        |    lag(cents) OVER w AS prev_c,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM (SELECT user_id, ts, event_id,
        |      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |    FROM events)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |WHERE rn = 1 AND prev_ts IS NOT NULL""".stripMargin,
    "ts_deriv" ->
      """WITH b AS (SELECT user_id,
        |    (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))
        |      // 1000000 AS x,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM events),
        |xy AS (SELECT user_id, CAST(x AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y
        |  FROM b)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_samples,
        |  CASE WHEN count(*) * sum(x*x) - sum(x) * sum(x) = 0 THEN NULL
        |    ELSE CAST(CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS BIGINT)
        |        AS DOUBLE) /
        |      CAST(CAST(count(*) * sum(x*x) - sum(x) * sum(x) AS BIGINT)
        |        AS DOUBLE) END
        |    AS slope_cents_per_s
        |FROM xy GROUP BY user_id""".stripMargin,
    "ts_predict_linear" ->
      """WITH b AS (SELECT user_id,
        |    (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))
        |      // 60000000 AS x,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM events),
        |xy AS (SELECT user_id, CAST(x AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y
        |  FROM b)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_samples,
        |  CASE WHEN count(*) * sum(x*x) - sum(x) * sum(x) = 0 THEN NULL
        |    ELSE CAST(CAST(sum(y) * sum(x*x) - sum(x) * sum(x*y) +
        |        (count(*) * sum(x*y) - sum(x) * sum(y)) * (max(x) + 60)
        |        AS BIGINT) AS DOUBLE) /
        |      CAST(CAST(count(*) * sum(x*x) - sum(x) * sum(x) AS BIGINT)
        |        AS DOUBLE) END
        |    AS predicted_cents
        |FROM xy GROUP BY user_id""".stripMargin,
    "ts_quantile_daily" ->
      """WITH r AS (SELECT user_id,
        |    epoch_us(date_trunc('day', ts)) AS day_us, value,
        |    row_number() OVER (PARTITION BY user_id,
        |      epoch_us(date_trunc('day', ts)) ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id,
        |      epoch_us(date_trunc('day', ts))) AS n
        |  FROM events),
        |g AS (SELECT user_id, day_us, CAST(count(*) AS BIGINT) AS n_samples,
        |    min(CASE WHEN rn = floor(CAST(n - 1 AS DOUBLE) * 0.5) + 1
        |      THEN value END) AS v50l,
        |    min(CASE WHEN rn = ceil(CAST(n - 1 AS DOUBLE) * 0.5) + 1
        |      THEN value END) AS v50h,
        |    min(CASE WHEN rn = floor(CAST(n - 1 AS DOUBLE) * 0.95) + 1
        |      THEN value END) AS v95l,
        |    min(CASE WHEN rn = ceil(CAST(n - 1 AS DOUBLE) * 0.95) + 1
        |      THEN value END) AS v95h
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, day_us, n_samples,
        |  v50l + (CAST(n_samples - 1 AS DOUBLE) * 0.5 -
        |    floor(CAST(n_samples - 1 AS DOUBLE) * 0.5)) * (v50h - v50l) AS p50,
        |  v95l + (CAST(n_samples - 1 AS DOUBLE) * 0.95 -
        |    floor(CAST(n_samples - 1 AS DOUBLE) * 0.95)) * (v95h - v95l) AS p95
        |FROM g""".stripMargin,
    "q_abc_analysis" -> OracleSqlGen.qAbcAnalysis,
    "emb_pq_code_balance" -> OracleSqlGen.embPqCodeBalance,
    "dedup_cross_source_matrix" -> OracleSqlGen.dedupCrossSourceMatrix,
    "text_dup_rate_by_source" -> OracleSqlGen.textDupRateBySource,
    "emb_dup_exact" -> OracleSqlGen.embDupExact,
    "emb_centroid_separation" -> OracleSqlGen.embCentroidSeparation,
    "ts_gap_stats" -> OracleSqlGen.tsGapStats,
    "q_part_growth" -> OracleSqlGen.qPartGrowth,
    "mm_phash_precision" -> OracleSqlGen.mmPhashPrecision,
    "ts_value_bands" -> OracleSqlGen.tsValueBands,
    "emb_rayleigh" -> OracleSqlGen.embRayleigh,
    "doc_shard_diversity" -> OracleSqlGen.docShardDiversity,
    "dedup_lsh_recall" -> OracleSqlGen.dedupLshRecall,
    "ts_mix_shift" -> OracleSqlGen.tsMixShift,
    "text_vocab_overlap" -> OracleSqlGen.textVocabOverlap,
    "q_purchase_gap_median" -> OracleSqlGen.qPurchaseGapMedian,
    "ts_weekday_profile" -> OracleSqlGen.tsWeekdayProfile,
    "ts_lifecycle_tiers" -> OracleSqlGen.tsLifecycleTiers,
    "emb_knn_accuracy" -> OracleSqlGen.embKnnAccuracy,
    "mm_scene_cuts" -> OracleSqlGen.mmSceneCuts,
    "stream_tumbling" -> OracleSqlGen.streamTumbling,
    // watermark accounting: the oracle replays the deterministic
    // arrival model (jitter, slices, trajectory, drop rule) in SQL
    "stream_late_data" -> {
      import graft.streaming.StreamOps._
      s"""WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us,
         |    epoch_us(ts) + ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT
         |      % $LateJitterUs AS arr
         |  FROM events),
         |eb AS (SELECT ts_us, arr // $LateSliceUs AS b FROM e),
         |wm AS (SELECT b, (max(m) OVER (ORDER BY b
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) // 1000) * 1000
         |    - $LateWmUs AS wm
         |  FROM (SELECT b, max(ts_us) AS m FROM eb GROUP BY b)),
         |f AS (SELECT ts_us,
         |    (wm IS NOT NULL AND (ts_us // $LateWinUs + 1) * $LateWinUs <= wm) AS late
         |  FROM eb JOIN wm USING (b))
         |SELECT (ts_us // $LateWinUs) * $LateWinUs AS window_start_us,
         |  count(*) AS n_total,
         |  CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
         |  CAST(sum(CASE WHEN late THEN 0 ELSE 1 END) AS BIGINT) AS n_accepted
         |FROM f GROUP BY 1""".stripMargin
    },
    // session_window contract: merge requires ts < prev session end
    // (strict), so the island rule is diff >= gap; end = last + gap
    "stream_session_window" ->
      """WITH b AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS prev_us
        |  FROM events),
        |m AS (SELECT user_id, ts_us,
        |    CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 1800000000
        |      THEN 1 ELSE 0 END AS new_s FROM b),
        |g AS (SELECT user_id, ts_us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us) AS sid FROM m)
        |SELECT user_id, min(ts_us) AS session_start_us,
        |  max(ts_us) + 1800000000 AS session_end_us, count(*) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin,
    // two-level sweep line: within-day running sum + midnight carry
    // (ends before starts at equal ts via d ascending; peak may precede
    // the first delta of a day, hence greatest(0, max_run))
    "q_session_concurrency" ->
      """WITH b AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS prev_us
        |  FROM events),
        |m AS (SELECT user_id, ts_us,
        |    CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 1800000000
        |      THEN 1 ELSE 0 END AS new_s FROM b),
        |g AS (SELECT user_id, ts_us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us) AS sid FROM m),
        |sess AS (SELECT min(ts_us) AS s_us, max(ts_us) + 1800000000 AS e_us
        |  FROM g GROUP BY user_id, sid),
        |deltas AS (SELECT s_us AS ts_us, 1 AS d FROM sess
        |  UNION ALL SELECT e_us, -1 FROM sess),
        |dd AS (SELECT ts_us, d,
        |    (ts_us // 86400000000) * 86400000000 AS day_us FROM deltas),
        |r AS (SELECT day_us, d,
        |    sum(d) OVER (PARTITION BY day_us ORDER BY ts_us, d) AS run FROM dd),
        |pd AS (SELECT day_us, max(run) AS max_run,
        |    CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
        |    sum(d) AS net FROM r GROUP BY 1)
        |SELECT day_us, n_starts,
        |  CAST(COALESCE(sum(net) OVER (ORDER BY day_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + greatest(0, max_run) AS BIGINT) AS max_concurrent
        |FROM pd""".stripMargin,
  )
}
