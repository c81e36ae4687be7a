package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/testdata/sf0.1"
    // stage sf0.1 events x10 with disjoint user ids (uid range is 0..1499, so offset by 10000)
    val ev = graft.core.Tables.events(spark, base)
    val big = (0 until 10).map(i =>
      ev.withColumn("user_id", col("user_id") + lit(i * 10000L))
        .withColumn("event_id", col("event_id") + lit(i * 10000000L)))
      .reduce(_.unionAll(_))
    big.write.mode("overwrite").parquet("/tmp/scale/events.parquet")
    // likewise documents x4 (20k docs)
    val docs = graft.core.Tables.documents(spark, base)
    (0 until 4).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 100000L)))
      .reduce(_.unionAll(_)).write.mode("overwrite").parquet("/tmp/scale/documents.parquet")
    // embeddings x4 (8k vectors) — vec_id 0 stays unique so the ANN
    // query set is unchanged while the corpus quadruples
    val emb = graft.core.Tables.embeddings(spark, base)
    (0 until 4).map(i => emb
        .withColumn("vec_id", when(lit(i) === 0, col("vec_id"))
          .otherwise(col("vec_id") + lit(i * 100000L)))
        .filter(lit(i) === 0 || col("vec_id") >= 100000L))
      .reduce(_.unionAll(_)).write.mode("overwrite").parquet("/tmp/scale/embeddings.parquet")
    spark.range(1).count()
    def time(n: String)(f: => Any): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); f
      println(f"SCALE $n%-22s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    import graft.operators._
    for (pass_ <- 1 to 2; dir <- Seq(base, "/tmp/scale")) {
      println(s"pass $pass_")
      println(s"--- $dir")
      time("ts_downsample")(TimeSeriesOps.downsample(spark, dir).count())
      time("ts_compact_block")(TimeSeriesOps.compactBlock(spark, dir).count())
      time("q_sessionize")(Analytics.qSessionize(spark, dir).count())
      time("ts_asof_join")(TimeSeriesOps.asofJoin(spark, dir).count())
      time("dedup_minhash_lsh")(Dedup.minhashLsh(spark, dir).count())
      time("dedup_ngram_jaccard")(Dedup.ngramJaccard(spark, dir).count())
      time("text_langid")(TextOps.langId(spark, dir).count())
      time("q_percentiles")(Analytics.qPercentiles(spark, dir).count())
      time("dedup_embedding")(Dedup.embeddingCosine(spark, dir).count())
      time("ann_batch_topk")(Similarity.annBatchTopk(spark, dir).count())
      time("ts_zscore")(TimeSeriesOps.zscore(spark, dir).count())
      time("ts_interp_linear")(TimeSeriesOps.interpLinear(spark, dir).count())
      time("dedup_containment")(Dedup.containment(spark, dir).count())
      time("q_pivot_daily")(Analytics.qPivotDaily(spark, dir).count())
      time("doc_pack_bins")(TextOps.docPackBins(spark, dir).count())
      time("text_repetition")(TextOps.repetition(spark, dir).count())
      time("q_histogram")(Analytics.qHistogram(spark, dir).count())
      time("ts_top_movers")(TimeSeriesOps.topMovers(spark, dir).count())
      time("ts_autocorr")(TimeSeriesOps.autocorr(spark, dir).count())
      time("ts_ohlc")(TimeSeriesOps.ohlc(spark, dir).count())
      time("emb_norm_stats")(Similarity.normStats(spark, dir).count())
      time("dedup_spans")(Dedup.substringSpans(spark, dir).count())
      time("ann_ivfpq_topk")(IvfPqIndex.annIvfPqTopk(spark, dir).count())
      time("mm_phash_incremental")(Multimodal.phashIncremental(spark, dir).count())
      time("text_gopher_rules")(TextOps.gopherRules(spark, dir).count())
      time("doc_shard_assign")(TextOps.shardAssign(spark, dir).count())
      time("doc_split_holdout")(TextOps.splitHoldout(spark, dir).count())
      time("emb_quantize_sq")(Similarity.quantizeSq(spark, dir).count())
      time("ann_mmr_rerank")(Similarity.mmrRerank(spark, dir).count())
      time("ts_histogram_quantile")(TimeSeriesOps.histogramQuantile(spark, dir).count())
      time("ts_anomaly_mad")(TimeSeriesOps.anomalyMad(spark, dir).count())
      time("ts_error_bursts")(TimeSeriesOps.errorBursts(spark, dir).count())
      time("text_lang_confusion")(TextOps.langConfusion(spark, dir).count())
      time("doc_len_percentiles")(TextOps.lenPercentiles(spark, dir).count())
      time("dedup_minhash_est")(Dedup.minhashEstimate(spark, dir).count())
      time("emb_centroid_shift")(Similarity.centroidShift(spark, dir).count())
      time("emb_semdedup")(Dedup.semDedup(spark, dir).count())
      time("emb_knn_graph")(Similarity.knnGraph(spark, dir).count())
      time("text_char_lm")(TextOps.charLm(spark, dir).count())
      time("text_dsir")(TextOps.dsirWeights(spark, dir).count())
      time("mm_byte_ioc")(Multimodal.byteIoc(spark, dir).count())
      time("ts_rollup_cascade")(TimeSeriesOps.rollupCascade(spark, dir).count())
      time("q_session_concurrency")(Analytics.sessionConcurrency(spark, dir).count())
      time("dedup_winnow")(Dedup.winnow(spark, dir).count())
      time("q_market_basket")(Analytics.qMarketBasket(spark, dir).count())
      time("emb_triplet_mine")(Similarity.tripletMine(spark, dir).count())
      time("ts_dod_wow")(TimeSeriesOps.dodWow(spark, dir).count())
      time("text_heaps_vocab")(TextOps.heapsVocab(spark, dir).count())
    }
    spark.stop()
  }
}
