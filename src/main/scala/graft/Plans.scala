package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val picks = Seq(
      "ts_scan_range" -> "Predicate pushdown: time bounds reach the scan as raw int64 filters; sort is the only exchange.",
      "q1_pricing" -> "Map-side partial aggregation: HashAggregate(partial) -> single Exchange -> HashAggregate(final); scan reads only 6 columns.",
      "q3_topk_revenue" -> "Dims broadcast (customer filtered first); TakeOrderedAndProject keeps top-10 without a global sort.",
      "dedup_minhash_lsh" -> "One shuffle to build per-doc hash sets; native MinHashSig; band self-join on small signatures; set-verify via array_intersect.",
      "ann_topk_brute" -> "Query vector broadcast; codegen'd graft_dot in the projection; top-k via TakeOrdered.",
      "ts_asof_join" -> "As-of join as a running conditional max window - one Exchange on the key, no join operator.",
      "dedup_embedding" -> "Banded hyperplane LSH end-to-end: native graft_band_codes signature, salted (band,bkey) self-join carrying vectors, inline cosine verify - no all-pairs product anywhere.",
      "q_percentiles" -> "Two-phase rank selection: map-side-combinable bucket histogram, prefix-sum over <=256 bucket rows per group, in-bucket rank only for target buckets - no whole-group window.",
      "dedup_ngram_jaccard" -> "Exact jaccard via prefix filtering over the STAGED rarity-sorted 52-bit-hashed shingle sets (DedupIndex rset): the query slices its prefix, joins candidates on prefix hashes only, then array_intersect verifies - hot shingles never fan out, shingling is never repaid, and no string ever shuffles.",
      "ann_ivf_topk" -> "Probe-only IVF search: reads the staged cell-partitioned assignment table; dynamic partition pruning restricts the scan to the 2 probed cells; no query-time index build.",
      "dedup_containment" -> "Asymmetric containment via prefix filtering over the STAGED rarity-sorted hashed sets (DedupIndex rset): a doc's rarest-hash prefix joins full sets; each consumer re-reads the column-pruned staged parquet and every join/verify runs over longs.",
      "ts_interp_linear" -> "Linear gap interpolation: spine from sequence()+explode, neighbors via two RUNNING window frames (ascending + descending) - no [current, unbounded following] frame, which would rescan the partition tail per row.",
      "ts_holt" -> "Bounded-state Holt smoothing: first aggregate keyed (user_id, day) folds each bucket to one affine (M^k, q) pair; per-key chain composes the pairs - no row ever holds a full key history.",
      "q9_profit" -> "Three broadcast dims (part filter prunes facts via the broadcast hash); the fact table shuffles only for the final small (nation, year) rollup.",
      "ann_ivfpq_topk" -> "IVFADC probe: staged cell-partitioned code table; the NProbe-row LUT broadcast join IS the cell pruning; map-side 8-lookup ADC into TakeOrdered shortlist; raw vectors touched only for the shortlist re-rank.",
      "dedup_spans" -> "Span mining over the STAGED positioned fingerprints (DedupIndex fpos): fp-keyed df filter, shared-fp semi-join, then one doc-keyed sort feeding both the lag and the running-sum island windows - partitions bounded by per-doc window counts.",
      "ts_ohlc" -> "OHLC endpoints via struct-ordered min/max aggregates - one map-side-combinable HashAggregate pair on a single (key, hour) shuffle, no rank window.",
      "mm_phash_incremental" -> "Incremental media near-dup: the new batch is window-hashed inline; the corpus side scans the staged 8-byte-per-doc fingerprint parquet; bounded (band, byte) pigeonhole join, payload bytes never shuffle.",
      "q2_min_cost_supp" -> "Per-part arg-min supplier with NO rank window: two struct-ordered min aggregates hash on the same l_partkey key; part filter and region-pruned suppliers broadcast, so other regions' fact rows never aggregate.",
      "q20_dominant_supp" -> "Nested aggregation without a second fact scan: per-(part,supplier) sums shuffle once on partkey; the per-part total re-aggregates that frame and AQE broadcasts it back for the dominance filter.",
      "text_gopher_rules" -> "Quality gate as a ZERO-exchange codegen projection: all four rules and the keep bit evaluate inside one WholeStageCodegen span over the corpus scan; ratios compare as integer cross-products.",
      "emb_quantize_sq" -> "Scalar-quantization report with no explode: the 1-row (lo,hi) broadcast feeds in-array quantize/reconstruct/error folds; per-row fixed-point error sums combine map-side on the label shuffle.",
      "ann_mmr_rerank" -> "MMR after retrieval at O(1) post-scan cost: the corpus appears only under the shortlist TakeOrdered (cached, <=10 rows); pairwise sims and every greedy round are broadcast joins over that in-memory relation.",
      "ts_histogram_quantile" -> "PromQL histogram_quantile from bucket counters: 7 conditional counts fold map-side into one HashAggregate pair on the type shuffle; selection + interpolation are per-row expressions over 5 rows.",
      "ts_anomaly_mad" -> "Two exact medians, ONE scan, ONE exchange: both doubled-integer medians are full-partition conditional window sums over the same user_id partitioning - each pass adds only a Sort, never a join-back or second shuffle.",
      "emb_ivf_balance" -> "Zero data bytes: the cell counts come from the staged assignment table's PARTITION column alone (ReadSchema: struct<>); the skew division joins a 1-row broadcast total.",
      "emb_semdedup" -> "SemDeDup: broadcast seed assignment (fold-argmax projection, no window), salted within-cluster pair join — all-pairs cost collapses to cluster-bounded buckets; the keep bit is one left join against the tiny dropped set.",
      "emb_knn_graph" -> "k-NN graph SERVED FROM the staged KnnIndex (one column-pruned parquet scan, zero exchanges): the banded self-join with unrolled first-match-band dedup and the per-src rank are index build, paid once per corpus fingerprint.",
      "emb_nn_descent_step" -> "NN-descent over the STAGED KnnIndex graph: the n*k edge parquet seeds symmetrize + 2-hop joins; the corpus appears only as two key-equi joins fetching endpoint vectors — no band re-mining.",
      "q_session_concurrency" -> "Interval-overlap sweep split by day: within-day running sums partition on day_us; the midnight carry is a prefix sum over the one-row-per-day net frame — no corpus-spanning window.",
      "text_char_lm" -> "Char-LM over the STAGED bigram profiles (TextIndex bgc/ - the corpus tokenization and (doc, bigram) aggregate are index build): the query derives the tiny add-1 model and scores, both over the profile parquet; text never enters the plan.",
      "mm_byte_ioc" -> "Byte histogram without byte rows leaving codegen: one regex chunk split per payload, explode -> (doc, code) HashAggregate with map-side combine (<=256 keys/doc), one doc re-agg; the IoC is a single integer-ratio division.",
      "ts_rollup_cascade" -> "Materialized rollup cascade: ONE corpus scan builds the hourly frame; day and month aggregate the previous grain's calendar-bounded checkpoint — the events table appears exactly once in the plan.",
      "emb_ivf_recall" -> "Recall gate: the IVF side joins the staged cell-partitioned table on the probed cells; the exact side is the one unavoidable ground-truth scan over a SAMPLED query set; both rankings share per-qid windows.",
      "q_market_basket" -> "Pair mining over the STAGED (order, part) incidence frame (BasketIndex - the lineitem distinct is index build): fanout bounded by lines-per-order squared; pairs, supports and the order count all read the small staged parquet; lineitem never enters the plan.",
      "emb_triplet_mine" -> "Batch-hard triplet mining: anchors broadcast, ONE corpus pass, two conditional struct-extrema HashAggregates (map-side combinable) — no per-anchor rank window funneling the corpus through 16 partitions.",
      "dedup_winnow" -> "Winnowing selection SERVED FROM the staged wfp artifact (one column-pruned parquet scan, zero exchanges): the packed-integer argmin, its windows and the tokenization are index build, paid once per corpus fingerprint.",
      "dedup_winnow_pairs" -> "MOSS matching over the staged wfp: distinct doc-level fp sets, boilerplate df-cap as an anti-join against the tiny over-cap list (never a per-fp window), fp-keyed self-join bounded by WinDfCap^2 per fingerprint.",
      "ts_cross_corr" -> "Cross-metric correlation: ONE corpus-sized aggregate to (type, hour) counts; spine completion, lag shift, and the pair Pearson all run over the tiny aggregated frame - pair*lag work grows with n_types^2*hours, not data volume.",
      "emb_silhouette" -> "Centroid silhouette: fixed-point centroid aggregate collapses to ONE broadcast array row; own + nearest-other distances are a pure map-side fold over the corpus - zero row expansion, no per-vector window.",
      "emb_pagerank_knn" -> "Integer PageRank: per iteration one src-keyed join + one dst HashAggregate over the staged n*k edge parquet; ranks stay a node-sized frame; the embeddings table appears only as the node-id scan.",
      "text_dup_ngram_frac" -> "Duplicate-ngram fraction: explodes the STAGED hashed shingle sets (rset) - no tokenization, text column never read; one df shuffle on the hash key, one doc_id count back.",
      "emb_dim_stats" -> "Per-dim stats: one global HashAggregate with 128 fixed-point sums + 64 min/max pairs, all map-side combinable; the corpus never posexplodes through a shuffle - the 1x256 row unpivots after aggregation.",
      "q_attribution" -> "Last-touch attribution with NO join: running conditional struct-max over the (ts, event_id)-ordered user shuffle carries each purchase's latest prior touch; one window + one rollup aggregate.",
      "ts_holt_backtest" -> "Walk-forward backtest: same bounded-state shape as ts_holt - per-day affine fold inside the array, per-key chain fold now also accumulating |forecast - actual| sequentially; two keyed shuffles, no window.",
      "ann_pq_recall" -> "PQ recall: the production probe batched - broadcast query*8x16 LUT, map-side ADC over the staged CODE table only, per-query shortlist window; raw vectors fetched just for shortlist rows; the exact side is the sampled ground-truth scan.",
      "emb_kcenter_init" -> "Farthest-first seeding: each round is one corpus pass against a <=K-row broadcast array (min-dist folds in the array, argmax as a combinable struct-max) - K passes total, zero windows, no all-pairs join.",
      "ts_trend_fit" -> "Trend fit: corpus folds to (key, day) counts map-side; the regression is five integer sums on ONE key shuffle; slope/intercept are per-group closed-form projections.",
      "q_growth_accounting" -> "Growth ledger: one distinct pass to (user, week); a single user-keyed window feeds both lag and lead; churn rows union in before one conditional-count rollup clipped by a broadcast max-week row.",
      "text_bpe_merge" -> "BPE merge counting: the corpus-sized stage is one combinable word-count aggregate; the pair explode runs over the DISTINCT vocabulary (Heaps-law small); top-20 via TakeOrderedAndProject.",
      "text_search_tfidf" -> "Keyword search: the explode filters to the 3 query terms map-side (posting-list cost model); one combinable conditional-count aggregate per doc; df/N broadcast back as one row; top-10 via TakeOrderedAndProject.",
      "ts_sla_multiwindow" -> "Multiwindow burn alert: one combinable aggregate to the calendar-bounded 5-min bucket frame (checkpointed); spine completion + trailing ROWS-12 window run over that tiny frame, never the corpus.",
      "source_jsonl_roundtrip" -> "JSONL ingest roundtrip: to_json -> from_json as per-row codegen expressions; zero exchanges, zero joins - the plan is scan + project only.",
      "ts_lifecycle_tiers" -> "Reviewer replay: the state machine folds over ONE sorted calendar-bounded day array (1-row frame); classification joins the broadcast final state against the per-day counts - the corpus appears once, in the day aggregate.",
      "emb_knn_accuracy" -> "kNN eval over the STAGED edge parquet: label join + (src,label) count + combinable struct-max argmax; no window, no band re-mining, corpus touched only for the 2-column label projection.",
      "mm_scene_cuts" -> "Shot boundaries decode-free: one regex pair-split + codegen conv per byte; the per-frame sum IS the groupBy's map-side combine (32:1 before the shuffle); payload bytes stay in the scan stage.",
      "dedup_span_removal" -> "Span excision: spans collapse to one per-doc array off the staged-probe miner; removal is an in-array indexed filter (tokens x spans of ONE doc); the only corpus-shaped stages are the doc-keyed join and the token projection.",
      "helix_scan_range" -> "Store-served scan: the staged HelixStore's bucket partition filter + pushed (key, ts) predicates reach the block parquet; compacted fast path = no LWW rank window anywhere in the plan.",
      "helix_latest" -> "Store-served newest-wins (TimeIterator): compacted fast path - no LWW rank shuffle in the read; the as-of filter pushes to the block scan and ONE per-key argmax window resolves latest.",
      "helix_outdate_scan" -> "Retention as PARTITION PRUNING: the committed cutoff is a bucket >= minb filter on the bucket partition column - dropped buckets are never read, and the fully-compacted store reads with no LWW window.",
      "q_abc_analysis" -> "Pareto cut: one fact shuffle to the checkpointed per-part revenue; the cumulative window and total ride the part-dimension frame; every class compare is an integer cross-product.",
      "ts_value_bands" -> "Exact percentile envelope: the rank window and both full-partition conditional mins share ONE user_id shuffle; selection is all-integer on cents.",
      "emb_rayleigh" -> "Eigenvalue estimate at matvec cost: the 64-row powerIter output collapses to one array row; both quadratic forms are sequential in-array folds over a broadcast pair of rows.",
      "mm_phash_precision" -> "Index-quality gate: staged-probe pairs + one md5-per-doc join; payload bytes never enter the plan; per-ham rollup is a combinable count.",
      "dedup_lsh_recall" -> "Ground-truth gate: the exact prefix-filtered jaccard pipeline runs (it IS the ground truth being measured); the LSH side reads the STAGED pair table (pairs/ = the verified banded output); one pair-keyed intersection join; 1-row output with NULL-guarded divisions.",
      "q_part_growth" -> "MoM growth: one fact shuffle (map-side partials) to the (part, month) decimal frame; the month shift is a lag window guarded by mi_prev = mi-1, whose part-keyed exchange moves only the aggregated frame - no checkpoint job, no self-join; top-10 via TakeOrderedAndProject.",
      "emb_centroid_separation" -> "Centroid geometry: the corpus collapses to K fixed-point centroid rows in one combinable aggregate; all pairwise separations run over the K-row broadcast - corpus appears once.",
      "text_dsir" -> "DSIR importance weights over the STAGED feature profiles (TextIndex dsir/ - <=128 hashed-bucket count rows per doc): target/raw ratios derive from one tiny aggregate, the score from one combinable per-doc aggregate; text never enters the plan.",
      "ts_above_p95" -> "Threshold composition: the exact per-type p95 frame (rank selection, no whole-group window) broadcasts against the events scan; one conditional-count aggregate on the type shuffle.",
      "dedup_cluster" -> "Star contraction over the STAGED pair parquet: each round is one bounded checkpointed job (largeStar+smallStar); the convergence probe folds two emptiness checks over the tiny edge set. Converges in 1 round on this corpus (profiled: ~1.1 s warm, cost is fixed job overhead, not data).",
      "q21_late_supplier" -> "Q21 shape: the lineitem self-joins key on l_orderkey (exists/not-exists as semi/anti joins on the same shuffle); supplier/nation broadcast; top via TakeOrderedAndProject.",
      "dedup_cluster_survivor" -> "Cluster survivorship: contraction output (vanishing fraction of the corpus) joins documents on doc_id - AQE broadcasts it; one per-cluster window with partitions bounded by cluster size.",
      "dedup_simhash_pairs" -> "SimHash pair mining via byte blocking: 4-way (position, byte) explode of the fingerprint frame; equality join on the block key (pigeonhole-exact for hamming<=3); bit_count verifies; distinct only on survivors.",
      "q16_supplier_count" -> "Q16 shape: part filter reaches the parquet scan; complaint suppliers anti-join; the distinct supplier count is a two-level aggregate on the (brand,type,size) shuffle.",
      "q8_market_share" -> "Q8 shape: dims chain as broadcast hash joins pruning the fact scan; the share is a per-year conditional decimal division over the small (year) rollup.",
      "emb_centroid_shift" -> "Centroid drift: two seeded assignments (broadcast fold-argmax projections, no window) each collapse to K centroid rows; the shift is a K-row matched-label join - corpus passes twice, nothing else grows.",
      "text_heaps_vocab" -> "Heaps curve: first-occurrence doc per bigram type is one min(doc_id) combinable aggregate over the exploded bigrams; the bucket rollup + running total ride the type-count-sized frame.",
      "mm_phash_clusters" -> "Media dup clusters: the star contraction runs verbatim over the staged phash pair source (bounded byte-block join over 8-byte fingerprints); payload bytes never enter the plan.",
      "ts_gap_fill" -> "Gap fill: per-key hourly spine from sequence()+explode (bounded by each key's time span); LOCF is one running last_value window on the key shuffle - no corpus-spanning frame.",
      "q_cube" -> "CUBE rollup: Spark Expand feeds one combinable HashAggregate pair - grouping-set fanout is 4x map-side, one exchange total.",
      "text_top_term" -> "Top tf/df term: the explode shuffles once to (doc, term) counts; df derives from that frame (no second explode); the per-doc argmax window partitions by doc_id - bounded by one doc's vocabulary.",
      "q10_returns" -> "Q10 shape: returned-lineitem filter pushed to the scan; customer/nation broadcast; one custkey rollup then top-20 via TakeOrderedAndProject.",
      "q_approx_distinct" -> "HLL sketch: approx_count_distinct folds map-side into one combinable aggregate - a single exchange carries only sketch buffers (rows-only gate by design).",
      "ts_mix_shift" -> "Mix drift: ONE corpus scan to checkpointed per-day conditional counts (+ residual 'other' mass); the day-value self-join and L1 fold run over the calendar-bounded frame.",
      "emb_kmeans_step" -> "One Lloyd iteration: seed centroids broadcast as an array row; assignment is an in-array fold-argmax projection (no window, no explode); new centroids are one fixed-point combinable aggregate.",
      "knn_label_centroid" -> "Label-centroid assignment: one fixed-point combinable aggregate collapses the corpus to K centroid rows; assignment is the broadcast fold-argmax projection on a second corpus pass - no window, no explode, cost = two scans + one K-row exchange.",
      "helix_stream_scan" -> "Scan over the STREAMING-ingested store (spool -> AvailableNow micro-batches -> put + reviewer-scheduled compactions, all index build): the serving plan is the compacted fast path - bucket partition filter + pushed (key, ts) predicates on the block parquet, no LWW window.",
      "helix_scan_custom_order" -> "User-comparator scan (Comparator trait parity): the sort key is a codegen Column over the entry key, so the ordered scan plans the SAME range-partitioned sort shape as lexical order with one extra leading sort expression; ord is a row_number Window over the comparator's total order - all Tungsten, no RDD round-trip, frame bounded by the scan's key x time rectangle.",
      "ann_batch_ivf_topk" -> "Batched IVF probe: each query ranks the broadcast centroid table for its nprobe cells (ncells x nqueries rows); the probed (qid, cell) set broadcast-equi-joins the staged cell-partitioned lists under dynamic partition pruning - a thousand-query batch costs the UNION of its probed cells, never the corpus crossJoin of the exact baseline (ann_batch_topk).",
      "ann_filtered_adaptive" -> "Selectivity-adaptive filtered ANN: cells widen in probe-rank order until the staged per-(cell,label) stats cover k*margin filter-satisfying candidates (fixed nprobe=2 floor, so the cell set is a superset of ann_filtered_topk's); sizing reads ONLY the ncells x nlabels stats parquet, and candidates stay the pushed-In-filter cell-pruned scan.",
      "dedup_simhash_pairs_capped" -> "Capped pair miner, compute-bounded: byte-pigeonhole join over DISTINCT fingerprints (exact-dedup-first - c exact copies collapse to one fingerprint before the quadratic join), per-doc neighbours reconstructed from per-fingerprint id rankings, final per-doc rank window keeps m=5 - both output AND join volume stay bounded under planted-copy mass.",
      "dedup_embedding_capped" -> "Capped embedding pair miner: banded hyperplane candidates + inline cosine verify unchanged; a per-vector rank window (cos desc, nbr asc - the shared deterministic fold) keeps m=5 neighbours per vector, bounding output volume under planted-duplicate mass.",
      "dedup_minhash_lsh_capped" -> "Capped minhash pair miner: the staged band self-join + exact-jaccard verify unchanged; per-doc rank window (jaccard desc - one mirrored IEEE division - then nbr asc) keeps m=5 neighbours, completing the capped family over all three pair miners.",
      "ann_ivf_incremental" -> "Index-freshness probe: the staged index covers only the indexed slice (vec_id % 20 != 7); the probe partition-prunes its cells AND brute-scans the 5% unindexed fresh tail, merging both candidate sets under one (cos desc, vec_id) rank - how production serves vectors that arrived after the last reindex.",
      "ts_gap_fill_range" -> "Bounded gap fill: the key-range x time-window rectangle pushes to the parquet scan, so spine, LOCF window and output are all capped by keys-in-range x window-hours - the 100 TB form of ts_gap_fill, whose spine grows with keys x full history.",
      "ann_filtered_topk" -> "Filtered vector search: the metadata tag set is a PUSHED parquet In filter on the cell-pruned staged index scan (the label lives IN the inverted lists), composing with the probe's dynamic partition pruning - filtered rows drop at the reader, never fetched and post-filtered; no query-time index build.",
      "q18_large_orders" -> "Q18 shape: the big-order aggregate is one combinable l_orderkey HashAggregate pair; the orders join rides the SAME orderkey shuffle key (AQE broadcasts the vanishing >250-qty side); customers broadcast.",
      "q_rollup" -> "ROLLUP: Spark Expand feeds one combinable HashAggregate pair - 3x map-side grouping-set fanout, one exchange total, 6-column pruned scan.",
      "q5_nation_revenue" -> "Q5 shape: customer/nation/region chain as broadcast hash joins (region filter prunes before the fact); the orderkey fact-fact join is the one shuffle pair; final rollup on 5 nation rows.",
      "q7_volume" -> "Q7 shape: both nation legs broadcast; AQE broadcasts the small customer/supplier dims; the orderkey fact-fact join is the one shuffle pair; the two-nation disjunction evaluates in the post-join codegen stage before the tiny (nation, nation, year) rollup.",
      "emb_power_iter" -> "One power-iteration matvec: a single corpus pass computes dot(v, x) against the broadcast 1-row vector and folds 64 fixed-point component sums in ONE combinable aggregate (no explode below the agg); the 1x64 result posexplodes above it.",
      "ts_deriv" -> "PromQL deriv: the per-key first-sample window min and the closed-form OLS regression agg share ONE user_id exchange; five exact integer sums (map-side combinable), slope is one mirrored double division.",
      "ts_predict_linear" -> "predict_linear: same one-exchange OLS shape as deriv; the forecast collapses intercept + slope*(x_last + horizon) to ONE division with an exact-integer numerator on a minute grid - no multi-division ULP drift between engines.",
      "stream_dedup_incremental" -> "Streaming-safe incremental dedup (batch twin of the continuous form): ROW-WISE hashed-shingle signatures (array_distinct over the in-array hash map - no explode+groupBy, stateless on a stream), arrival-bounded repartition spreads the hashing, band equi-join against the STAGED corpus signature store, pair dropDuplicates, staged-hset exact-jaccard verify - per-batch cost is arrivals x a columnar signature scan, the corpus never re-shingles.",
      "ts_quantile_daily" -> "quantile_over_time: the rank/count windows and the bracketing-rank groupBy all ride ONE (key, day) exchange (the agg sees the window's partitioning, no reshuffle); per-group frames are scrape-bounded, so the window is safe at any corpus size.",
      "mm_phash_pairs_capped" -> "Capped media pair miner: the shared cappedHamPairs engine over the staged 8-byte fingerprints - DISTINCT-fingerprint pigeonhole join (exact copies collapse before the quadratic step), per-fingerprint id rankings reconstruct per-doc neighbours, final rank window keeps m=5; payload bytes never shuffle and never re-hash.",
      "dedup_bloom_incremental" -> "Bloom-gated incremental dedup: the staged corpus bloom enters as a literal into a codegen might_contain predicate on the batch scan (no UDF, no join to test membership); only bloom-positives reach the verify join, and they BROADCAST - the corpus side streams map-side, no SortMergeJoin anywhere.",
      "ann_hybrid_rrf" -> "Hybrid RRF fusion: both legs are the registered staged pipelines (tf-idf's one corpus aggregate; the IVF probe's partition-pruned cell scan), so the fusion layer itself joins two <=10-row frames full-outer and ranks - no corpus work is added on top of the legs.",
      "stream_topk" -> "Windowed top-k: the streaming-safe half is one combinable (window, user) count agg (state = one counter per active pair, watermark-evicted); the rank runs over closed windows' emitted rows - each rank partition is one window's active users, parallel across windows.",
      "text_ccnet_bucket" -> "CCNet bucketing at scale: the per-lang tercile rank runs ONLY over the deterministic sample frame; thresholds broadcast and the corpus assigns map-side by value comparison - no corpus-wide window, no skew exposure to a big language.",
      "ts_sample_reservoir" -> "Deterministic reservoir: md5-of-id rank keeps k exemplars per (key, day) - no RNG state crosses machines, re-runs reproduce bit-identically, and every rank partition is one scrape-bounded (key, day) group.",
      "emb_matryoshka_recall" -> "Truncation eval: the 16-dim prefix is a map-side slice feeding the same broadcast-query/per-qid-rank shape as the exact batch leg; the hit join touches two 30-row frames.",
      "stream_anomaly" -> "Stream-static anomaly flags: the per-key baseline is a static frame (one row per key, AQE-broadcast while small); arrivals probe it in a stateless equi-join + filter - no state store, no watermark bookkeeping, per-event cost is one hash probe.",
      "mm_cdc_chunks" -> "CDC storage dedup: the stride-1 rolling-hash pass is STAGED ingest work (CdcIndex spans/); the registered query is one hash-group shuffle over the 40-byte span rows - payload bytes never touch the query path at all.",
      "emb_bq_recall" -> "Binary-quantization eval: the BQ leg reads the STAGED BqIndex longs (8 bytes/vector, packed once per corpus) and takes its top-3 via the bounded-heap graft_topk_min aggregate - map-side partials keep <=3 longs per (task, qid), no corpus-wide rank window; only the brute-force ground-truth leg windows, by contract.",
      "emb_bq_rerank" -> "BQ serve path: staged BqIndex fingerprints score by bit_count(xor); the 32-survivor shortlist is the bounded-heap graft_topk_min aggregate (hamming<<40|vec_id packs the tie order into one long), so no corpus x nqueries shuffle exists; floats are fetched only behind the shortlist join and the lone window ranks <=32 rows per qid.",
      "mm_cdc_incremental" -> "Incremental CDC: only the arriving batch is chunked (one bounded rolling-hash pass); the corpus side is the staged span store shed to distinct hashes before the probe join - historical bytes are never re-chunked.",
      "ann_ivf_delete" -> "Deletion-aware probe: the tombstone filter composes with the cell prune on the staged scan (pushed, source-translatable) and the rank still fills k - deletes serve correctly between reindexes with zero index mutation.",
      "stream_cdc_incremental" -> "Continuous CDC: the in-array chunker is pure scalar expressions over one row's hex (streaming-safe - no window, no state); the probe is a stream-static join against the staged span store's distinct hashes.")
    val sb = new StringBuilder
    sb.append("# PLANS — annotated physical plans (sf0.01, local[8])\n\n")
    sb.append("Generated by `graft.Plans`. What to look for in each: pushed filters,\npruned ReadSchema, exchange count, broadcast vs shuffle joins, codegen spans.\n")
    for ((q, note) <- picks) {
      sb.append(s"\n## $q\n\n$note\n\n```\n")
      val full = SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // keep the tree + scan details, drop the long per-node attribute dumps
      val lines = full.linesIterator.toList
      val treeEnd = lines.indexWhere(_.trim.isEmpty, 2) match { case -1 => lines.length; case i => i }
      val tree = lines.take(treeEnd)
      val details = lines.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema") || l.startsWith("(") )
      sb.append((tree ++ Seq("...") ++ details.filterNot(tree.contains)).mkString("\n"))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("written PLANS.md")
    spark.stop()
  }
}
