package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{EventAnalytics, Frontier, Relational, Stats, Temporal, TypedAggs, Windows}
import graft.dedup.Dedup
import graft.multimodal.Media
import graft.plans.TopK
import graft.similarity.Ann
import graft.sources.Io
import graft.streaming.StreamWatcher
import graft.syncer.{BackupPipeline, SyncOps}
import graft.text.TextAnalysis

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each `queries` key has a matching DuckDB `oracleSql` entry with
  * identical column names/aliases and identical rounding of every
  * floating-point output (double summation order differs between
  * engines; rounding to fixed decimals on BOTH sides makes the
  * driver's hash compare exact).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 sync core
    "sync_inventory" -> (SyncOps.syncInventory(_, _)),
    "sync_live_set" -> (SyncOps.syncLiveSet(_, _)),
    "sync_temp_filter" -> (SyncOps.syncTempFilter(_, _)),
    "sync_diff_upload" -> (SyncOps.syncDiffUpload(_, _)),
    "sync_restore_set" -> ((s, d) => SyncOps.syncRestoreSet(s, d)),
    "sync_prune" -> ((s, d) => SyncOps.syncPrune(s, d)),
    "sync_full_or_incr" -> (SyncOps.syncFullOrIncr(_, _)),
    "sync_bucket_stats" -> (SyncOps.syncBucketStats(_, _)),
    "sync_retry_ledger" -> (SyncOps.syncRetryLedger(_, _)),
    "sync_manifest_diff" -> ((s, d) => SyncOps.syncManifestDiff(s, d)),
    "sync_lww_merge" -> (SyncOps.syncLwwMerge(_, _)),
    "sync_skip_vanished" -> (SyncOps.syncSkipVanished(_, _)),
    "sync_path_parse" -> (SyncOps.syncPathParse(_, _)),
    "sync_slot_schedule" -> ((s, d) => SyncOps.syncSlotSchedule(s, d)),
    "sync_bandwidth_windows" -> ((s, d) => SyncOps.syncBandwidthWindows(s, d)),
    "sync_restore_bandwidth" -> ((s, d) => SyncOps.syncRestoreBandwidth(s, d)),
    "text_rerank_sweep" -> (TextAnalysis.textRerankSweep(_, _)),
    "q_anova" -> (Stats.qAnova(_, _)),
    "q_cramers_v" -> (EventAnalytics.qCramersV(_, _)),
    "q_hhi" -> (Relational.qHhi(_, _)),
    "text_ngram_novelty" -> (TextAnalysis.textNgramNovelty(_, _)),
    "io_age_tiering" -> (SyncOps.ioAgeTiering(_, _)),
    "q_rate_ztest" -> (Stats.qRateZtest(_, _)),
    "q_abc_class" -> (Relational.qAbcClass(_, _)),
    "q7_volume_shipping" -> (Relational.q7VolumeShipping(_, _)),
    "q8_market_share" -> (Relational.q8MarketShare(_, _)),
    "text_readability" -> (TextAnalysis.textReadability(_, _)),
    "vec_pq_distortion" -> (graft.similarity.Pq.vecPqDistortion(_, _)),
    "sync_compaction_plan" -> (SyncOps.syncCompactionPlan(_, _)),
    "sync_daily_ingest" -> (SyncOps.syncDailyIngest(_, _)),
    "sync_generation_gaps" -> (SyncOps.syncGenerationGaps(_, _)),
    "sync_restore_delta" -> ((s, d) => SyncOps.syncRestoreDelta(s, d)),
    "sync_replication_audit" -> (SyncOps.syncReplicationAudit(_, _)),
    "sync_restore_resume" -> (BackupPipeline.syncRestoreResume(_, _)),
    // §2.2 relational core
    "q1_agg" -> (Relational.q1Agg(_, _)),
    "q3_topn_join" -> (Relational.q3TopnJoin(_, _)),
    "q5_snowflake_join" -> (Relational.q5SnowflakeJoin(_, _)),
    "q6_filter_sum" -> (Relational.q6FilterSum(_, _)),
    "q_exists_semi" -> (Relational.qExistsSemi(_, _)),
    "q_not_exists_anti" -> (Relational.qNotExistsAnti(_, _)),
    "q_conditional_agg" -> (Relational.qConditionalAgg(_, _)),
    "q_rollup" -> (Relational.qRollup(_, _)),
    "q_grouping_sets" -> (Relational.qGroupingSets(_, _)),
    "q_asof_tolerance" -> (Temporal.qAsofTolerance(_, _)),
    "q_scd2_history" -> (Temporal.qScd2History(_, _)),
    "q_pivot" -> (Relational.qPivot(_, _)),
    "q_percentiles" -> (Relational.qPercentiles(_, _)),
    "q_percentiles_approx" -> (Relational.qPercentilesApprox(_, _)),
    "q_distinct_hll" -> (Relational.qDistinctHll(_, _)),
    "q_distinct_hll_sketch" -> (Relational.qDistinctHllSketch(_, _)),
    "q_stream_batch_twin" -> (Relational.qStreamBatchTwin(_, _)),
    "q_join_skew_salt" -> (Relational.qJoinSkewSalt(_, _)),
    "q_cube" -> (Relational.qCube(_, _)),
    "q_sample_hash" -> (Relational.qSampleHash(_, _)),
    "q_sample_stratified" -> (Relational.qSampleStratified(_, _)),
    "q_set_ops" -> (Relational.qSetOps(_, _)),
    "q_scalar_subquery" -> (Relational.qScalarSubquery(_, _)),
    "q_histogram" -> (Relational.qHistogram(_, _)),
    "q_correlated_agg" -> (Relational.qCorrelatedAgg(_, _)),
    "q_json_extract" -> (Relational.qJsonExtract(_, _)),
    "q_minmax_by" -> (Relational.qMinmaxBy(_, _)),
    "q_session_window" -> (Relational.qSessionWindow(_, _)),
    "q10_returns" -> (Relational.q10Returns(_, _)),
    "q_full_outer" -> (Relational.qFullOuter(_, _)),
    "q_date_parts" -> (Relational.qDateParts(_, _)),
    "q_string_funcs" -> (Relational.qStringFuncs(_, _)),
    "q_window_running" -> (Windows.qWindowRunning(_, _)),
    "q_window_topn" -> (Windows.qWindowTopn(_, _)),
    "q_window_lag" -> (Windows.qWindowLag(_, _)),
    "q_sessionize" -> (Windows.qSessionize(_, _)),
    "q_rank_family" -> (Windows.qRankFamily(_, _)),
    "q_moving_window" -> (Windows.qMovingWindow(_, _)),
    "q_window_first_last" -> (Windows.qWindowFirstLast(_, _)),
    "q_window_time_range" -> (Windows.qWindowTimeRange(_, _)),
    "q_unpivot" -> (Relational.qUnpivot(_, _)),
    "q_weighted_median" -> (Relational.qWeightedMedian(_, _)),
    "q_gaps_islands" -> (EventAnalytics.qGapsIslands(_, _)),
    "q_running_distinct" -> (EventAnalytics.qRunningDistinct(_, _)),
    "q_calendar_densify" -> (EventAnalytics.qCalendarDensify(_, _)),
    "q_type_user_overlap" -> (EventAnalytics.qTypeUserOverlap(_, _)),
    "q_moments" -> (Relational.qMoments(_, _)),
    "q_percent_of_total" -> (Relational.qPercentOfTotal(_, _)),
    "q_fuzzy_join" -> (Relational.qFuzzyJoin(_, _)),
    "q_chi_square" -> (EventAnalytics.qChiSquare(_, _)),
    "q_linreg" -> (Stats.qLinreg(_, _)),
    "q_decay_score" -> (EventAnalytics.qDecayScore(_, _)),
    "q_attribution" -> (EventAnalytics.qAttribution(_, _)),
    "q_d7_retention" -> (EventAnalytics.qD7Retention(_, _)),
    "ann_ivf_recall_sweep" -> (Ann.annIvfRecallSweep(_, _)),
    "vec_centroid_drift" -> (Ann.vecCentroidDrift(_, _)),
    "q_seasonal_decompose" -> (Stats.qSeasonalDecompose(_, _)),
    "q_weighted_sample" -> (Stats.qWeightedSample(_, _)),
    "q_equidepth_hist" -> (Stats.qEquidepthHist(_, _)),
    "sync_replica_sets" -> (SyncOps.syncReplicaSets(_, _)),
    "sync_hinted_handoff" -> ((s, d) => SyncOps.syncHintedHandoff(s, d)),
    "cass_secondary_index" -> (SyncOps.cassSecondaryIndex(_, _)),
    "io_dynamic_overwrite" -> (Io.ioDynamicOverwrite(_, _)),
    "q_dataset_drift" -> (Stats.qDatasetDrift(_, _)),
    "q_ttest_ab" -> (Stats.qTtestAb(_, _)),
    "q_forecast_backtest" -> (Stats.qForecastBacktest(_, _)),
    "q_ab_cuped" -> (Stats.qAbCuped(_, _)),
    "q_power_analysis" -> (Stats.qPowerAnalysis(_, _)),
    "q_gini" -> (Stats.qGini(_, _)),
    "q_survival_curve" -> (Stats.qSurvivalCurve(_, _)),
    "q_ucb_arms" -> (Stats.qUcbArms(_, _)),
    "io_shard_balance" -> (Io.ioShardBalance(_, _)),
    "q_daily_anomaly" -> (EventAnalytics.qDailyAnomaly(_, _)),
    "q_interpolate_gaps" -> (EventAnalytics.qInterpolateGaps(_, _)),
    "q_holt_forecast" -> (Stats.qHoltForecast(_, _)),
    "q_basket_lift" -> (EventAnalytics.qBasketLift(_, _)),
    "q_changepoint" -> (EventAnalytics.qChangepoint(_, _)),
    "q_new_vs_returning" -> (EventAnalytics.qNewVsReturning(_, _)),
    "q_session_path_topk" -> (EventAnalytics.qSessionPathTopk(_, _)),
    "q_churn_by_engagement" -> (EventAnalytics.qChurnByEngagement(_, _)),
    "q_rfm_segments" -> (EventAnalytics.qRfmSegments(_, _)),
    "q_cohort_ltv" -> (EventAnalytics.qCohortLtv(_, _)),
    "q_funnel_latency" -> (EventAnalytics.qFunnelLatency(_, _)),
    "sync_token_ring" -> (SyncOps.syncTokenRing(_, _)),
    "q_copurchase_jaccard" -> (graft.graph.GraphOps.copurchaseJaccard(_, _)),
    "q_ks_test" -> (Stats.qKsTest(_, _)),
    "q_mutual_info" -> (Stats.qMutualInfo(_, _)),
    "q_cms_estimate" -> (Stats.qCmsEstimate(_, _)),
    "q_bootstrap_ci" -> (Stats.qBootstrapCi(_, _)),
    "q_user_entropy" -> (EventAnalytics.qUserEntropy(_, _)),
    "q_event_pattern" -> (EventAnalytics.qEventPattern(_, _)),
    "q_hll_setops" -> (Relational.qHllSetops(_, _)),
    "q_profile_table" -> (Relational.qProfileTable(_, _)),
    "sync_table_checksum" -> (SyncOps.syncTableChecksum(_, _)),
    "sync_merkle_diff" -> (SyncOps.syncMerkleDiff(_, _)),
    "sync_tombstone_gc" -> ((s, d) => SyncOps.syncTombstoneGc(s, d)),
    "graph_kcore" -> ((s, d) => graft.graph.GraphOps.graphKcore(s, d)),
    "q_dp_counts" -> (EventAnalytics.qDpCounts(_, _)),
    "q_growth_rate" -> (EventAnalytics.qGrowthRate(_, _)),
    "q_upsert_merge" -> (Relational.qUpsertMerge(_, _)),
    "q_zscore_outliers" -> (EventAnalytics.qZscoreOutliers(_, _)),
    "q_retention_cohort" -> (EventAnalytics.qRetentionCohort(_, _)),
    "q_rolling_retention_matrix" -> (EventAnalytics.qRollingRetentionMatrix(_, _)),
    "q_funnel" -> (EventAnalytics.qFunnel(_, _)),
    "q_transition_matrix" -> (EventAnalytics.qTransitionMatrix(_, _)),
    "q_ewma" -> (EventAnalytics.qEwma(_, _)),
    "q_time_weighted_avg" -> (EventAnalytics.qTimeWeightedAvg(_, _)),
    "q_dow_profile" -> (EventAnalytics.qDowProfile(_, _)),
    "q_correlation" -> (EventAnalytics.qCorrelation(_, _)),
    "q_having" -> (Relational.qHaving(_, _)),
    "q_null_semantics" -> (Relational.qNullSemantics(_, _)),
    "q_median_abs_dev" -> (Relational.qMedianAbsDev(_, _)),
    "q_winsorized_mean" -> (Relational.qWinsorizedMean(_, _)),
    "q_order_aging" -> (Relational.qOrderAging(_, _)),
    "q_basket_size_hist" -> (Relational.qBasketSizeHist(_, _)),
    "q_asof_join" -> (Temporal.qAsofJoin(_, _)),
    "q_range_join" -> (Temporal.qRangeJoin(_, _)),
    // §2.3 dedup
    "dedup_exact" -> (Dedup.dedupExact(_, _)),
    "corpus_dedup_by_source" -> (Dedup.corpusDedupBySource(_, _)),
    "text_length_profile" -> (TextAnalysis.textLengthProfile(_, _)),
    "dedup_exact_survivors" -> (Dedup.dedupExactSurvivors(_, _)),
    "dedup_minhash_lsh" -> (Dedup.dedupMinhashLsh(_, _)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.dedupNgramJaccard(s, d)),
    "dedup_simhash" -> (Dedup.dedupSimhash(_, _)),
    "dedup_threshold_sweep" -> (Dedup.dedupThresholdSweep(_, _)),
    "text_quality_sweep" -> (TextAnalysis.textQualitySweep(_, _)),
    "corpus_lang_weights" -> (graft.text.CorpusOps.corpusLangWeights(_, _)),
    "dedup_embedding_cos" -> ((s, d) => Ann.dedupEmbeddingCos(s, d)),
    "dedup_minhash_by_lang" -> (Dedup.dedupMinhashByLang(_, _)),
    "dedup_pipeline_verified" -> ((s, d) => Dedup.dedupPipelineVerified(s, d)),
    "dedup_incremental" -> ((s, d) => Dedup.dedupIncremental(s, d)),
    "dedup_substring" -> ((s, d) => Dedup.dedupSubstring(s, d)),
    "dedup_semantic" -> ((s, d) => Ann.dedupSemantic(s, d)),
    "dedup_quality_survivors" -> (Dedup.dedupQualitySurvivors(_, _)),
    "dedup_containment" -> (Dedup.dedupContainment(_, _)),
    "ann_knn_classify" -> (Ann.annKnnClassify(_, _)),
    // §2.4 similarity
    "ann_bruteforce_topk" -> (Ann.annBruteforceTopk(_, _)),
    "ann_lsh_topk" -> (Ann.annLshTopk(_, _)),
    "ann_lsh_multiprobe" -> (Ann.annLshMultiprobe(_, _)),
    "vec_norms" -> (Ann.vecNorms(_, _)),
    "ann_ivf_assign" -> (Ann.annIvfAssign(_, _)),
    "vec_quantize" -> (Ann.vecQuantize(_, _)),
    "ann_recall_at_k" -> (Ann.annRecallAtK(_, _)),
    "ann_ivf_topk" -> (Ann.annIvfTopk(_, _)),
    "ann_ivf_multiprobe" -> (Ann.annIvfMultiprobe(_, _)),
    "ann_rh_bucket" -> (Ann.annRhBucketStats(_, _)),
    "ann_dim_truncation" -> ((s, d) => Ann.annDimTruncation(s, d)),
    "ann_pq_codes" -> (graft.similarity.Pq.annPqCodes(_, _)),
    "ann_pq_adc" -> (graft.similarity.Pq.annPqAdc(_, _)),
    "ann_pq_rerank" -> (graft.similarity.Pq.annPqRerank(_, _)),
    "ann_rerank_sweep" -> (graft.similarity.Pq.annRerankSweep(_, _)),
    "ann_ivf_pq_search" -> (graft.similarity.Pq.annIvfPqSearch(_, _)),
    "ann_label_separation" -> (Ann.annLabelSeparation(_, _)),
    "vec_argmax" -> (Ann.vecArgmax(_, _)),
    "vec_gram_matrix" -> (Ann.vecGramMatrix(_, _)),
    "vec_pca_project" -> (Ann.vecPcaProject(_, _)),
    // §2.5 text
    "text_tokens" -> (TextAnalysis.textTokens(_, _)),
    "text_quality" -> (TextAnalysis.textQuality(_, _)),
    "text_langid" -> (TextAnalysis.textLangid(_, _)),
    "text_langid_confusion" -> (TextAnalysis.textLangidConfusion(_, _)),
    "vec_label_outliers" -> (Ann.vecLabelOutliers(_, _)),
    "text_line_dedup" -> (TextAnalysis.textLineDedup(_, _)),
    "q_incremental_reagg" -> (Relational.qIncrementalReagg(_, _)),
    "q_decile_report" -> (Relational.qDecileReport(_, _)),
    "sync_quota_forecast" -> (SyncOps.syncQuotaForecast(_, _)),
    "text_fingerprint" -> (TextAnalysis.textFingerprint(_, _)),
    "text_ngram_stats" -> (TextAnalysis.textNgramStats(_, _)),
    "text_tfidf" -> (TextAnalysis.textTfidf(_, _)),
    "text_tfidf_knn" -> (TextAnalysis.textTfidfKnn(_, _)),
    "text_lexical_complexity" -> (TextAnalysis.textLexicalComplexity(_, _)),
    "text_bm25" -> (TextAnalysis.textBm25(_, _)),
    "text_pmi" -> (TextAnalysis.textPmi(_, _)),
    "text_winnowing" -> ((s, d) => TextAnalysis.textWinnowing(s, d)),
    "text_bigram_model" -> (TextAnalysis.textBigramModel(_, _)),
    "text_perplexity" -> (TextAnalysis.textPerplexity(_, _)),
    "text_perplexity_kn" -> (TextAnalysis.textPerplexityKn(_, _)),
    "q_acf" -> (EventAnalytics.qAcf(_, _)),
    "q_benford" -> (Relational.qBenford(_, _)),
    "text_zipf_fit" -> (TextAnalysis.textZipfFit(_, _)),
    "text_token_len_hist" -> (TextAnalysis.textTokenLenHist(_, _)),
    "text_quality_filter" -> (TextAnalysis.textQualityFilter(_, _)),
    "text_repetition" -> (TextAnalysis.textRepetition(_, _)),
    "text_common_spans" -> (TextAnalysis.textCommonSpans(_, _)),
    "text_pii_mask" -> (TextAnalysis.textPiiMask(_, _)),
    "text_freq_tokens" -> (TextAnalysis.textFreqTokens(_, _)),
    "text_heavy_hitters_exact" -> (TextAnalysis.textHeavyHittersExact(_, _)),
    "text_pack_chunks" -> ((s, d) => graft.text.CorpusOps.textPackChunks(s, d)),
    "corpus_chunk_overlap" -> ((s, d) => graft.text.CorpusOps.corpusChunkOverlap(s, d)),
    "text_contamination" -> ((s, d) => graft.text.CorpusOps.textContamination(s, d)),
    "ann_semantic_contamination" -> (Ann.annSemanticContamination(_, _)),
    "corpus_curriculum_order" -> (graft.text.CorpusOps.corpusCurriculumOrder(_, _)),
    "corpus_mixture" -> (graft.text.CorpusOps.corpusMixture(_, _)),
    "corpus_source_overlap" -> (graft.text.CorpusOps.corpusSourceOverlap(_, _)),
    "corpus_dsir_select" -> (graft.text.CorpusOps.corpusDsirSelect(_, _)),
    "dedup_url_norm" -> (graft.text.CorpusOps.dedupUrlNorm(_, _)),
    // §2.6 multimodal
    "mm_ingest" -> (Media.mmIngest(_, _)),
    "mm_features" -> (Media.mmFeatures(_, _)),
    "mm_resize_frames" -> (Media.mmResizeFrames(_, _)),
    "mm_phash" -> (Media.mmPhash(_, _)),
    "mm_vad_segments" -> (Media.mmVadSegments(_, _)),
    "mm_audio_fingerprint" -> (Media.mmAudioFingerprint(_, _)),
    "mm_scene_detect" -> (Media.mmSceneDetect(_, _)),
    "mm_payload_dedup" -> (Media.mmPayloadDedup(_, _)),
    "mm_phash_dedup" -> (Media.mmPhashDedup(_, _)),
    // §2.7 streaming (bounded replay into a memory sink)
    "stream_windowed_agg" -> (StreamWatcher.streamWindowedAggQuery(_, _)),
    "stream_sketch_distinct" -> (StreamWatcher.streamSketchDistinctQuery(_, _)),
    "stream_quantile_sketch" -> (StreamWatcher.streamQuantileSketchQuery(_, _)),
    "stream_file_watch" -> (StreamWatcher.streamFileWatchQuery(_, _)),
    "sync_watch_stream" -> (StreamWatcher.syncWatchStreamQuery(_, _)),
    "stream_retry_queue" -> (StreamWatcher.streamRetryQueueQuery(_, _)),
    "stream_change_feed" -> (StreamWatcher.streamChangeFeedQuery(_, _)),
    "stream_state_metrics" -> (StreamWatcher.streamStateMetrics(_, _)),
    "stream_interval_join" -> (StreamWatcher.streamIntervalJoinQuery(_, _)),
    "stream_interval_join_outer" -> (StreamWatcher.streamIntervalJoinOuterQuery(_, _)),
    "stream_dedup" -> (StreamWatcher.streamDedupQuery(_, _)),
    "stream_dedup_incremental" -> ((s, d) => Dedup.dedupIncrementalStreamQuery(s, d)),
    "stream_static_join" -> (StreamWatcher.streamStaticJoinQuery(_, _)),
    "stream_append_windows" -> (StreamWatcher.streamAppendWindowsQuery(_, _)),
    "stream_late_drop" -> (StreamWatcher.streamLateDropQuery(_, _)),
    "stream_fb_upsert" -> (StreamWatcher.streamForeachBatchUpsert(_, _)),
    "stream_incremental_batch" -> (StreamWatcher.streamIncrementalBatch(_, _)),
    "stream_txn_feed" -> (StreamWatcher.streamTxnFeedQuery(_, _)),
    // §2.8 sources/sinks
    "fs_inventory" -> (graft.syncer.FsInventory.fsInventoryQuery(_, _)),
    "sync_watch_service" -> (graft.streaming.WatchService.watchServiceQuery(_, _)),
    "sync_fsck_verify" -> (graft.streaming.WatchService.fsckQuery(_, _)),
    "sync_watch_dedup" -> (graft.streaming.WatchService.watchDedupQuery(_, _)),
    "cass_lww_read" -> (graft.sources.cass.CassandraLikeStore.cassLwwRead(_, _)),
    "cass_token_scan" -> (graft.sources.cass.CassandraLikeStore.cassTokenScan(_, _)),
    "cass_compact" -> (graft.sources.cass.CassandraLikeStore.cassCompact(_, _)),
    "cass_read_repair" -> (SyncOps.cassReadRepair(_, _)),
    "sync_ring_rebalance" -> (SyncOps.syncRingRebalance(_, _)),
    "q_did" -> (Stats.qDid(_, _)),
    "graph_label_prop" -> ((s, d) => graft.graph.GraphOps.graphLabelProp(s, d)),
    "graph_modularity" -> ((s, d) => graft.graph.GraphOps.graphModularity(s, d)),
    "graph_community_members" -> ((s, d) => graft.graph.GraphOps.graphCommunityMembers(s, d)),
    "graph_communities" -> ((s, d) => graft.graph.GraphOps.graphCommunities(s, d)),
    "io_partitioned_inventory" -> (Io.ioPartitionedInventory(_, _)),
    "io_csv_json" -> (Io.ioCsvJson(_, _)),
    "io_bucketed_join" -> (Io.ioBucketedJoin(_, _)),
    "io_orc_roundtrip" -> (Io.ioOrcRoundtrip(_, _)),
    "io_schema_evolution" -> (Io.ioSchemaEvolution(_, _)),
    "io_compact_small_files" -> (Io.ioCompactSmallFiles(_, _)),
    "io_zorder_layout" -> (graft.sources.ZOrder.ioZorderLayout(_, _)),
    "io_txn_log" -> (graft.sources.TxnLog.ioTxnLog(_, _)),
    "io_txn_vacuum" -> (graft.sources.TxnLog.ioTxnVacuum(_, _)),
    "io_delete_vectors" -> (graft.sources.TxnLog.ioDeleteVectors(_, _)),
    "io_stats_prune_scan" -> (graft.sources.TxnLog.ioStatsPruneScan(_, _)),
    "io_stats_prune_bloom" -> (graft.sources.TxnLog.ioStatsPruneBloom(_, _)),
    "sync_leveled_compaction" -> (SyncOps.syncLeveledCompaction(_, _)),
    "q_skyline" -> (Frontier.qSkyline(_, _)),
    "q_max_concurrency" -> (Frontier.qMaxConcurrency(_, _)),
    // end-to-end pipeline + custom-operator/typed surfaces
    "backup_pipeline" -> (BackupPipeline.backupPipelineQuery(_, _)),
    "topk_per_group" -> (TopK.topkPerGroupQuery(_, _)),
    "rewrite_window_topk" -> (TopK.rewriteWindowTopkQuery(_, _)),
    "typed_aggregator" -> (TypedAggs.typedAggregatorQuery(_, _)),
    "kmeans" -> (Ann.kmeansQuery(_, _)),
    "dedup_cc_clusters" -> (Dedup.dedupCcClusters(_, _)),
    "dedup_cluster_stats" -> (Dedup.dedupClusterStats(_, _)),
    "graph_degree_hist" -> (graft.graph.GraphOps.graphDegreeHist(_, _)),
    "graph_triangles" -> (graft.graph.GraphOps.graphTriangles(_, _)),
    "graph_pagerank" -> ((s, d) => graft.graph.GraphOps.graphPagerank(s, d)),
    "graph_assortativity" -> (graft.graph.GraphOps.graphAssortativity(_, _)),
    "graph_bfs_layers" -> ((s, d) => graft.graph.GraphOps.graphBfsLayers(s, d)),
    "q_bloom_prefilter" -> (graft.analytics.RuntimeFilters.qBloomPrefilter(_, _)),
    "stream_session_window" -> (StreamWatcher.streamSessionWindowQuery(_, _)),
    "q_stickiness" -> (EventAnalytics.qStickiness(_, _)),
    "q_peak_days" -> (EventAnalytics.qPeakDays(_, _)),
    "q_inter_event_gaps" -> (EventAnalytics.qInterEventGaps(_, _)),
    "q_modal_hour" -> (EventAnalytics.qModalHour(_, _)),
    "q_pareto_share" -> (Relational.qParetoShare(_, _)),
    "q_repeat_interval" -> (Relational.qRepeatInterval(_, _)),
    "text_hapax_ratio" -> (TextAnalysis.textHapaxRatio(_, _)),
    "ann_cell_balance" -> (Ann.annCellBalance(_, _)),
    "ann_ivf_incremental" -> (Ann.annIvfIncremental(_, _)),
    "vec_dim_stats" -> (Ann.vecDimStats(_, _)),
    "sync_oldest_pending" -> (SyncOps.syncOldestPending(_, _)),
    "corpus_token_budget" -> (graft.text.CorpusOps.corpusTokenBudget(_, _)),
    "text_bpe_tokens" -> (graft.text.CorpusOps.textBpeTokens(_, _)),
    "corpus_token_budget_bpe" -> (graft.text.CorpusOps.corpusTokenBudgetBpe(_, _)),
    "vec_cosine_hist" -> (Ann.vecCosineHist(_, _)),
    "q_trend_slope" -> (Stats.qTrendSlope(_, _)),
    "sync_catchup_eta" -> (SyncOps.syncCatchupEta(_, _)),
    "q_top_movers" -> (EventAnalytics.qTopMovers(_, _)),
    "mm_format_profile" -> (Media.mmFormatProfile(_, _)),
    "vec_sim_threshold_sweep" -> (Ann.vecSimThresholdSweep(_, _)),
    "q_weekend_effect" -> (EventAnalytics.qWeekendEffect(_, _)),
    "text_char_entropy" -> (TextAnalysis.textCharEntropy(_, _)),
    "io_snapshot_diff" -> (graft.sources.TxnLog.ioSnapshotDiff(_, _)),
    "text_top_terms" -> (TextAnalysis.textTopTerms(_, _)),
    "corpus_near_dup_by_source" -> (Dedup.corpusNearDupBySource(_, _)),
    "corpus_dup_provenance" -> (Dedup.corpusDupProvenance(_, _)),
    "dedup_minhash_calibration" -> (Dedup.dedupMinhashCalibration(_, _)),
    "mm_size_outliers" -> (Media.mmSizeOutliers(_, _)),
    "sync_twcs_compaction" -> (SyncOps.syncTwcsCompaction(_, _)),
    "graph_transitivity" -> (graft.graph.GraphOps.graphTransitivity(_, _)),
    "q_mann_whitney" -> (Stats.qMannWhitney(_, _)),
    "q_kendall_tau" -> (Stats.qKendallTau(_, _)),
    "io_prune_effectiveness" -> (graft.sources.ZOrder.ioPruneEffectiveness(_, _)),
    "q_theil_sen" -> (Stats.qTheilSen(_, _)),
    "q_spearman" -> (Stats.qSpearman(_, _)),
    "io_clustering_depth" -> (graft.sources.ZOrder.ioClusteringDepth(_, _)),
  )

  // ---- oracle SQL ----

  /** Shared CTE: the file-inventory derivation (FileInventory.scala). */
  private val invCte =
    """inv AS (
      |  SELECT event_type AS cf,
      |         CAST(user_id % 10 AS BIGINT) AS node_id,
      |         CAST(event_id % 7 AS BIGINT) AS shard_id,
      |         event_id AS generation,
      |         (event_id % 20 = 0) AS is_temp,
      |         'ks1/' || event_type || '/node' ||
      |           CAST(user_id % 10 AS VARCHAR) || '/na-' ||
      |           CAST(event_id AS VARCHAR) ||
      |           (CASE WHEN event_id % 20 = 0 THEN '-tmp' ELSE '' END) || '-Data.db' AS path,
      |         CAST(floor(value * 1000) AS BIGINT) AS size_bytes,
      |         ts AS mtime,
      |         CAST(ts AS DATE) AS snap_date
      |  FROM events)""".stripMargin

  private val durCte = "dur AS (SELECT * FROM inv WHERE NOT is_temp)"

  private val liveCte =
    """live AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY cf, node_id, shard_id
      |                                 ORDER BY generation DESC) AS rn
      |    FROM dur) WHERE rn = 1)""".stripMargin

  /** Tokenized-documents CTE shared by text/dedup oracles. */
  private val toksCte =
    """t AS (SELECT doc_id, lang, n_chars, text,
      |  string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents)""".stripMargin

  /** Exact integer money columns over lineitem (see Money.scala). */
  private val lpCte =
    """lp AS (SELECT *, CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
      |  CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
      |  CAST(round(l_tax * 100) AS BIGINT) AS tax_c FROM lineitem)""".stripMargin

  private val embCte =
    "e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)"

  /** Nearest-centroid scoring (label-seeded centroids), shared by
    * `ann_ivf_assign` and `ann_cell_balance`. Requires [[embCte]].
    */
  private val ivfScoredCtes =
    """comp AS (SELECT label AS c_id, pos - 1 AS pos, x
      |         FROM (SELECT label, unnest(v) AS x,
      |               generate_subscripts(v, 1) AS pos FROM e)),
      |cent AS (SELECT c_id, list(cx ORDER BY pos) AS cv FROM (
      |  SELECT c_id, pos, avg(x) AS cx FROM comp GROUP BY c_id, pos) GROUP BY c_id),
      |scored AS (SELECT vec_id, label, c_id,
      |  round(list_cosine_similarity(v, cv), 4) + 0.0 AS cos FROM e CROSS JOIN cent)""".stripMargin

  /** Shared by `sync_restore_set` (analytical) and `backup_pipeline`
    * (through real storage sinks): the minimal restore set as of
    * 2024-01-15.
    */
  private lazy val restoreSetSql =
    s"""WITH $invCte, $durCte
       |SELECT cf, node_id, shard_id, generation, path, size_bytes FROM (
       |  SELECT *, row_number() OVER (PARTITION BY cf, node_id, shard_id
       |                               ORDER BY generation DESC) AS rn
       |  FROM dur WHERE snap_date <= DATE '2024-01-15') WHERE rn = 1
       |ORDER BY cf, node_id, shard_id""".stripMargin

  /** Shared by `q_stream_batch_twin` (batch) and `stream_windowed_agg`
    * (replayed stream): hourly windowed accounting per event type.
    */
  private val streamTwinSql =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
      |  count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Shared by `q_session_window` (batch) and `stream_session_window`
    * (replayed streaming state): 30-min-gap sessions per user via the
    * portable lag→cumsum definition.
    */
  private val sessionWindowSql =
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) >= 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged),
      |per_sess AS (SELECT user_id, session_id, count(*) AS n_events FROM sess GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS n_events,
      |  CAST(max(n_events) AS BIGINT) AS max_session_events
      |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin

  /** `vec_pca_project` oracle: the same deterministic 10-step power
    * iteration the Spark side runs on the driver, unrolled into
    * chained CTEs (one matrix-multiply + normalize pair per step) so
    * DuckDB computes the identical function of the Gram matrix.
    */
  private val pcaProjectSql: String = {
    val iters = 10
    val sb = new StringBuilder
    // every CTE is MATERIALIZED: the chain references each level
    // several times, and plain (inlined) CTEs would re-expand the
    // whole prefix per reference — exponential in the iteration count
    sb ++= """WITH e AS MATERIALIZED (SELECT vec_id, label, embedding FROM embeddings),
             |comp AS MATERIALIZED (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             |  CAST(unnest(embedding) AS DOUBLE) AS x FROM e),
             |g AS MATERIALIZED (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS g
             |  FROM comp a JOIN comp b ON a.vec_id = b.vec_id GROUP BY 1, 2),
             |v0 AS MATERIALIZED (SELECT t.i AS i, 1.0 / sqrt(64.0) AS v FROM range(64) t(i))""".stripMargin
    for (k <- 1 to iters) {
      sb ++= s""",
                |w$k AS MATERIALIZED (SELECT g.i AS i, sum(g.g * v${k - 1}.v) AS w
                |  FROM g JOIN v${k - 1} ON g.j = v${k - 1}.i GROUP BY 1),
                |v$k AS MATERIALIZED (SELECT i, w / (SELECT sqrt(sum(w * w)) FROM w$k) AS v FROM w$k)""".stripMargin
    }
    sb ++= s""",
              |sgn AS (SELECT CASE WHEN (SELECT v FROM v$iters ORDER BY abs(v) DESC, i ASC LIMIT 1) < 0
              |  THEN -1.0 ELSE 1.0 END AS s),
              |p AS (SELECT comp.vec_id, sum(comp.x * v$iters.v) AS raw
              |  FROM comp JOIN v$iters ON comp.i = v$iters.i GROUP BY 1)
              |SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
              |  round((SELECT s FROM sgn) * p.raw, 4) + 0.0 AS pc1
              |FROM p JOIN e USING (vec_id) ORDER BY vec_id""".stripMargin
    sb.toString
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get the driver's weaker
    * rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "sync_inventory" ->
      s"""WITH $invCte
         |SELECT path, cf, node_id, shard_id, generation, is_temp, size_bytes
         |FROM inv ORDER BY generation""".stripMargin,
    "sync_live_set" ->
      s"""WITH $invCte, $durCte, $liveCte
         |SELECT cf, node_id, shard_id, generation, path, size_bytes
         |FROM live ORDER BY cf, node_id, shard_id""".stripMargin,
    "sync_temp_filter" ->
      s"""WITH $invCte
         |SELECT cf, count(*) AS n_total,
         |  CAST(sum(CASE WHEN is_temp THEN 1 ELSE 0 END) AS BIGINT) AS n_temp,
         |  CAST(sum(CASE WHEN NOT is_temp THEN 1 ELSE 0 END) AS BIGINT) AS n_durable,
         |  CAST(sum(CASE WHEN NOT is_temp THEN size_bytes ELSE 0 END) AS BIGINT) AS durable_bytes
         |FROM inv GROUP BY cf ORDER BY cf""".stripMargin,
    "sync_diff_upload" ->
      s"""WITH $invCte, $durCte
         |SELECT path, cf, node_id, generation, size_bytes
         |FROM dur s
         |WHERE NOT EXISTS (SELECT 1 FROM dur t
         |  WHERE t.generation % 3 <> 0 AND t.node_id <> 3 AND t.path = s.path)
         |ORDER BY generation""".stripMargin,
    "sync_restore_set" -> restoreSetSql,
    // the storage-backed pipeline restore must equal the analytical
    // restore — the exact same oracle checks both
    "backup_pipeline" -> restoreSetSql,
    // resume: the fixture fetched the first floor(n/2) files of the
    // restore set in path order; the remainder is everything after
    "sync_restore_resume" ->
      s"""WITH $invCte, $durCte,
         |rs AS (SELECT cf, node_id, shard_id, generation, path, size_bytes FROM (
         |  SELECT *, row_number() OVER (PARTITION BY cf, node_id, shard_id
         |                               ORDER BY generation DESC) AS rn
         |  FROM dur WHERE snap_date <= DATE '2024-01-15') WHERE rn = 1),
         |r AS (SELECT *, row_number() OVER (ORDER BY path) AS pos,
         |             count(*) OVER () AS cnt FROM rs)
         |SELECT cf, node_id, shard_id, generation, path, size_bytes FROM r
         |WHERE pos > cnt // 2
         |ORDER BY cf, node_id, shard_id""".stripMargin,
    "sync_prune" ->
      s"""WITH $invCte, $durCte, $liveCte
         |SELECT cf, count(*) AS n_prunable,
         |  CAST(sum(size_bytes) AS BIGINT) AS reclaim_bytes,
         |  max(generation) AS max_pruned_gen
         |FROM dur d
         |WHERE d.snap_date < DATE '2024-01-20'
         |  AND NOT EXISTS (SELECT 1 FROM live l WHERE l.path = d.path)
         |GROUP BY cf ORDER BY cf""".stripMargin,
    "sync_full_or_incr" ->
      s"""WITH $invCte, $durCte,
         |tgt AS (SELECT node_id, count(*) AS n_in_target FROM dur
         |        WHERE generation % 3 <> 0 AND node_id <> 3 GROUP BY node_id)
         |SELECT d.node_id, count(*) AS n_durable,
         |  COALESCE(max(t.n_in_target), 0) AS n_in_target,
         |  CASE WHEN COALESCE(max(t.n_in_target), 0) = 0 THEN 'full'
         |       ELSE 'incremental' END AS mode
         |FROM dur d LEFT JOIN tgt t ON d.node_id = t.node_id
         |GROUP BY d.node_id ORDER BY d.node_id""".stripMargin,
    "sync_bucket_stats" ->
      s"""WITH $invCte, $durCte
         |SELECT cf, count(*) AS n_files,
         |  CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
         |  CAST(sum(size_bytes) AS DOUBLE) / count(*) AS avg_bytes,
         |  max(generation) AS max_generation,
         |  count(DISTINCT node_id) AS n_nodes
         |FROM dur GROUP BY cf ORDER BY cf""".stripMargin,
    "sync_retry_ledger" ->
      s"""WITH $invCte, $durCte,
         |a AS (SELECT cf, 1 + CASE WHEN cf = 'error' THEN generation % 3 ELSE 0 END AS attempts FROM dur)
         |SELECT cf, CAST(sum(attempts) AS BIGINT) AS total_attempts,
         |  CAST(sum(CASE WHEN attempts > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retried,
         |  CAST(max(attempts) AS BIGINT) AS max_attempts,
         |  count(*) AS n_files
         |FROM a GROUP BY cf ORDER BY cf""".stripMargin,

    "sync_skip_vanished" ->
      s"""WITH $invCte, $durCte,
         |lineage_max AS (SELECT cf, node_id, shard_id, max(generation) AS max_gen
         |  FROM dur GROUP BY cf, node_id, shard_id),
         |planned AS (SELECT * FROM dur s WHERE NOT EXISTS (
         |  SELECT 1 FROM dur t WHERE t.generation % 3 <> 0 AND t.node_id <> 3 AND t.path = s.path)),
         |mx AS (SELECT p.*, m.max_gen FROM planned p
         |  JOIN lineage_max m ON p.cf = m.cf AND p.node_id = m.node_id AND p.shard_id = m.shard_id)
         |SELECT cf, count(*) AS n_planned,
         |  CAST(sum(CASE WHEN generation = max_gen THEN 1 ELSE 0 END) AS BIGINT) AS n_uploadable,
         |  CAST(sum(CASE WHEN generation <> max_gen THEN 1 ELSE 0 END) AS BIGINT) AS n_vanished
         |FROM mx GROUP BY cf ORDER BY cf""".stripMargin,
    "sync_lww_merge" ->
      """WITH cells AS (SELECT CAST(user_id % 50 AS BIGINT) AS row_key, value,
        |  CAST(ts AS TIMESTAMP) AS write_ts, event_id AS generation,
        |  (event_type = 'error') AS tombstone FROM events)
        |SELECT row_key, value AS latest_value, write_ts, generation FROM (
        |  SELECT *, row_number() OVER (PARTITION BY row_key
        |    ORDER BY write_ts DESC, generation DESC) AS rn FROM cells)
        |WHERE rn = 1 AND NOT tombstone ORDER BY row_key""".stripMargin,
    "q_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
        |  FROM events)
        |SELECT user_id, event_id,
        |  CAST(ts AS TIMESTAMP) AS purchase_ts,
        |  CAST(last_click_ts AS TIMESTAMP) AS last_click_ts,
        |  epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(last_click_ts AS TIMESTAMP)) AS gap_us
        |FROM u WHERE event_type = 'purchase' ORDER BY user_id, event_id""".stripMargin,
    "q_range_join" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |err AS (SELECT user_id AS e_user, event_id AS e_id, epoch_us(CAST(ts AS TIMESTAMP)) AS e_us
        |        FROM events WHERE event_type = 'error')
        |SELECT e_user AS user_id, e_id AS event_id, count(*) AS n_prior_5min
        |FROM err JOIN ev ON e_user = ev.user_id
        |  AND ev.us > e_us - 300000000 AND ev.us <= e_us AND ev.event_id <> e_id
        |GROUP BY e_user, e_id ORDER BY user_id, event_id""".stripMargin,
    "sync_restore_delta" ->
      s"""WITH $invCte, $durCte,
         |older AS (SELECT cf, node_id, shard_id, generation AS gen_old FROM (
         |  SELECT *, row_number() OVER (PARTITION BY cf, node_id, shard_id
         |                               ORDER BY generation DESC) AS rn
         |  FROM dur WHERE snap_date <= DATE '2024-01-10') WHERE rn = 1),
         |newer AS (SELECT cf, node_id, shard_id, generation, path, size_bytes FROM (
         |  SELECT *, row_number() OVER (PARTITION BY cf, node_id, shard_id
         |                               ORDER BY generation DESC) AS rn
         |  FROM dur WHERE snap_date <= DATE '2024-01-20') WHERE rn = 1)
         |SELECT n.cf, n.node_id, n.shard_id, n.generation, n.path, n.size_bytes
         |FROM newer n LEFT JOIN older o
         |  ON n.cf = o.cf AND n.node_id = o.node_id AND n.shard_id = o.shard_id
         |WHERE o.gen_old IS NULL OR n.generation > o.gen_old
         |ORDER BY n.cf, n.node_id, n.shard_id""".stripMargin,
    "sync_manifest_diff" ->
      s"""WITH $invCte, $durCte,
         |older AS (SELECT cf, node_id, shard_id, generation AS gen_old FROM (
         |  SELECT *, row_number() OVER (PARTITION BY cf, node_id, shard_id
         |                               ORDER BY generation DESC) AS rn
         |  FROM dur WHERE snap_date <= DATE '2024-01-10') WHERE rn = 1),
         |newer AS (SELECT cf, node_id, shard_id, generation AS gen_new FROM (
         |  SELECT *, row_number() OVER (PARTITION BY cf, node_id, shard_id
         |                               ORDER BY generation DESC) AS rn
         |  FROM dur WHERE snap_date <= DATE '2024-01-20') WHERE rn = 1)
         |SELECT n.cf, n.node_id, n.shard_id, o.gen_old, n.gen_new,
         |  CASE WHEN o.gen_old IS NULL THEN 'added'
         |       WHEN n.gen_new > o.gen_old THEN 'updated'
         |       ELSE 'unchanged' END AS status
         |FROM newer n LEFT JOIN older o
         |  ON n.cf = o.cf AND n.node_id = o.node_id AND n.shard_id = o.shard_id
         |ORDER BY n.cf, n.node_id, n.shard_id""".stripMargin,
    "ann_ivf_assign" ->
      s"""WITH $embCte, $ivfScoredCtes
         |SELECT vec_id, label, c_id AS assigned_centroid, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS rn
         |  FROM scored) WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "sync_compaction_plan" ->
      s"""WITH $invCte, $durCte
         |SELECT cf, CAST(length(CAST(size_bytes AS VARCHAR)) AS BIGINT) AS tier,
         |  count(*) AS n_files,
         |  CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
         |  count(*) >= 4 AS needs_compaction
         |FROM dur GROUP BY 1, 2 ORDER BY cf, tier""".stripMargin,
    "sync_slot_schedule" ->
      s"""WITH $invCte, $durCte,
         |planned AS (SELECT * FROM dur s WHERE NOT EXISTS (
         |  SELECT 1 FROM dur t WHERE t.generation % 3 <> 0 AND t.node_id <> 3 AND t.path = s.path))
         |SELECT CAST(ascii(substr(md5(path), 1, 1)) % 4 AS BIGINT) AS slot,
         |  count(*) AS n_files,
         |  CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
         |  max(size_bytes) AS max_bytes
         |FROM planned GROUP BY 1 ORDER BY slot""".stripMargin,
    "sync_bandwidth_windows" ->
      s"""WITH $invCte, $durCte,
         |du AS (SELECT generation, size_bytes FROM dur s WHERE NOT EXISTS (
         |  SELECT 1 FROM dur t WHERE t.generation % 3 <> 0 AND t.node_id <> 3
         |    AND t.path = s.path)),
         |c AS (SELECT generation, size_bytes,
         |    CAST(sum(size_bytes) OVER (ORDER BY generation ROWS BETWEEN
         |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM du),
         |t AS (SELECT generation, size_bytes,
         |    CAST((cum - 1) // 16777216 AS BIGINT) AS window_idx FROM c)
         |SELECT window_idx, count(*) AS n_files,
         |  CAST(sum(size_bytes) AS BIGINT) AS window_bytes,
         |  min(generation) AS first_gen, max(generation) AS last_gen
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "sync_restore_bandwidth" ->
      s"""WITH $invCte, $durCte,
         |rs AS (SELECT generation, path, size_bytes FROM (
         |  SELECT *, row_number() OVER (PARTITION BY cf, node_id, shard_id
         |                               ORDER BY generation DESC) AS rn
         |  FROM dur WHERE snap_date <= DATE '2024-01-15') WHERE rn = 1),
         |c AS (SELECT generation, size_bytes,
         |    CAST(sum(size_bytes) OVER (ORDER BY generation, path ROWS BETWEEN
         |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM rs),
         |t AS (SELECT generation, size_bytes,
         |    CAST((cum - 1) // 16777216 AS BIGINT) AS window_idx FROM c)
         |SELECT window_idx, count(*) AS n_files,
         |  CAST(sum(size_bytes) AS BIGINT) AS window_bytes,
         |  min(generation) AS first_gen, max(generation) AS last_gen
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_rerank_sweep" ->
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(toks) AS word FROM t),
         |pd AS (SELECT word, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM pd GROUP BY 1),
         |df AS (SELECT word, count(*) AS df FROM pd GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS total_toks FROM dl),
         |qt AS (SELECT q_id, word, df FROM (
         |  SELECT pd.doc_id AS q_id, pd.word AS word, df.df AS df,
         |    row_number() OVER (PARTITION BY pd.doc_id
         |      ORDER BY df.df, pd.word) AS tr
         |  FROM pd JOIN df ON pd.word = df.word
         |  WHERE pd.doc_id % 89 = 7
         |    AND pd.doc_id < ${TextAnalysis.TextProbeCap}) WHERE tr <= 3),
         |sc AS (SELECT qt.q_id AS q_id, pd.doc_id AS doc_id,
         |    CAST(sum(CAST(round(ln((n_docs - qt.df + 0.5) / (qt.df + 0.5) + 1.0) *
         |      (pd.tf * 2.2 / (pd.tf + 1.2 * (0.25 + 0.75 *
         |        (dl.dl / (CAST(total_toks AS DOUBLE) / n_docs))))) * 1000000)
         |      AS BIGINT)) AS BIGINT) AS bm25q
         |  FROM pd JOIN qt ON pd.word = qt.word AND pd.doc_id <> qt.q_id
         |  JOIN dl ON pd.doc_id = dl.doc_id CROSS JOIN n CROSS JOIN tot
         |  GROUP BY 1, 2),
         |sl AS (SELECT q_id, doc_id, rnk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
         |    ORDER BY bm25q DESC, doc_id) AS BIGINT) AS rnk
         |  FROM sc) WHERE rnk <= 20),
         |sets AS (SELECT doc_id, list_sort(list_distinct(toks)) AS ts FROM t),
         |pairs AS (SELECT sl.q_id AS q_id, sl.doc_id AS doc_id, sl.rnk AS rnk,
         |    CASE WHEN len(list_distinct(list_concat(qs.ts, ds.ts))) > 0
         |      THEN CAST(round(CAST(len(list_intersect(qs.ts, ds.ts)) AS DOUBLE)
         |        / CAST(len(list_distinct(list_concat(qs.ts, ds.ts))) AS DOUBLE)
         |        * 10000) AS BIGINT)
         |      ELSE CAST(10000 AS BIGINT) END AS jacq
         |  FROM sl JOIN sets ds ON sl.doc_id = ds.doc_id
         |  JOIN sets qs ON sl.q_id = qs.doc_id),
         |b1 AS (SELECT CAST(sum(jacq) AS BIGINT) AS bm25_top1_jacq
         |  FROM pairs WHERE rnk = 1),
         |d AS (SELECT * FROM (VALUES (5), (10), (20)) AS v(depth)),
         |rr AS (SELECT depth, q_id, jacq FROM (
         |  SELECT d.depth AS depth, p.q_id AS q_id, p.jacq AS jacq,
         |    row_number() OVER (PARTITION BY d.depth, p.q_id
         |      ORDER BY p.jacq DESC, p.doc_id) AS rr
         |  FROM pairs p JOIN d ON p.rnk <= d.depth) WHERE rr = 1)
         |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_queries,
         |  (SELECT bm25_top1_jacq FROM b1) AS bm25_top1_jacq,
         |  CAST(sum(jacq) AS BIGINT) AS rerank_top1_jacq,
         |  CAST((SELECT bm25_top1_jacq FROM b1) AS DOUBLE) / count(*) / 10000.0
         |    AS mean_bm25_top1,
         |  CAST(sum(jacq) AS DOUBLE) / count(*) / 10000.0 AS mean_rerank_top1
         |FROM rr GROUP BY depth ORDER BY depth""".stripMargin,
    "q_anova" ->
      """WITH ev AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s, sum(c * c) AS ss,
        |    CAST(round(CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS BIGINT)
        |      / count(*)) AS BIGINT) AS tq
        |  FROM ev GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(sum(n) AS BIGINT) AS n_total, CAST(sum(s) AS BIGINT) AS s_tot,
        |    sum(ss) AS ss_tot, CAST(sum(tq) AS BIGINT) AS t_exact FROM g),
        |fin AS (SELECT n_groups, n_total,
        |    CAST(t_exact AS DOUBLE)
        |      - CAST(s_tot AS DOUBLE) * s_tot / n_total AS ss_between,
        |    CAST(ss_tot AS DOUBLE) - CAST(t_exact AS DOUBLE) AS ss_within
        |  FROM tot WHERE n_groups > 1 AND n_total > n_groups)
        |SELECT n_groups, n_total AS n, ss_between, ss_within,
        |  (ss_between / (n_groups - 1))
        |    / (ss_within / (n_total - n_groups)) AS f
        |FROM fin""".stripMargin,
    "q_cramers_v" ->
      """WITH obs AS (SELECT event_type,
        |    CAST((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) % 7
        |      AS BIGINT) AS dow, count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS row_n FROM obs GROUP BY 1),
        |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS col_n FROM obs GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
        |agg AS (SELECT max(n) AS n_events,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS n_rows,
        |    CAST(count(DISTINCT dow) AS BIGINT) AS n_cols,
        |    sum((o - CAST(row_n AS DOUBLE) * col_n / n)
        |      * (o - CAST(row_n AS DOUBLE) * col_n / n)
        |      / (CAST(row_n AS DOUBLE) * col_n / n)) AS chi2_obs,
        |    sum(CAST(row_n AS DOUBLE) * col_n / n) AS exp_obs
        |  FROM obs JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN tot),
        |dense AS (SELECT n_events, n_rows, n_cols,
        |    chi2_obs + (n_events - exp_obs) AS chi2_raw
        |  FROM agg)
        |SELECT n_events, n_rows, n_cols, round(chi2_raw, 4) AS chi2,
        |  round(sqrt(chi2_raw / (n_events * (least(n_rows, n_cols) - 1))), 4)
        |    AS cramers_v
        |FROM dense WHERE least(n_rows, n_cols) > 1""".stripMargin,
    "q_hhi" ->
      s"""WITH $lpCte,
         |bs AS (SELECT l_suppkey,
         |    CAST(sum(price_c * (100 - disc_c)) AS BIGINT) AS r
         |  FROM lp GROUP BY 1),
         |bn AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
         |    sum(r) AS rev_sum, sum(CAST(r AS HUGEINT) * r) AS rev_sq
         |  FROM bs JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  GROUP BY 1)
         |SELECT n_name, n_suppliers,
         |  CAST(rev_sum AS DOUBLE) / 10000.0 AS revenue,
         |  CAST(rev_sq AS DOUBLE)
         |    / (CAST(rev_sum AS DOUBLE) * CAST(rev_sum AS DOUBLE)) AS hhi
         |FROM bn ORDER BY 1""".stripMargin,
    "io_age_tiering" ->
      s"""WITH $invCte, $durCte, $liveCte,
         |mx AS (SELECT max(snap_date) AS d_max FROM live),
         |t AS (SELECT cf,
         |    CASE WHEN date_diff('day', snap_date, d_max) <= 7 THEN 'a_hot'
         |      WHEN date_diff('day', snap_date, d_max) <= 30 THEN 'b_warm'
         |      ELSE 'c_cold' END AS tier, size_bytes
         |  FROM live CROSS JOIN mx),
         |a AS (SELECT cf, tier, CAST(count(*) AS BIGINT) AS n_files,
         |    CAST(sum(size_bytes) AS BIGINT) AS tier_bytes
         |  FROM t GROUP BY 1, 2),
         |c AS (SELECT cf, CAST(sum(tier_bytes) AS BIGINT) AS cf_bytes
         |  FROM a GROUP BY 1)
         |SELECT a.cf AS cf, tier, n_files, tier_bytes,
         |  CAST(tier_bytes AS DOUBLE) / cf_bytes AS byte_share
         |FROM a JOIN c ON a.cf = c.cf ORDER BY 1, 2""".stripMargin,
    "text_ngram_novelty" ->
      s"""WITH $toksCte,
         |p0 AS (SELECT lang, doc_id,
         |    unnest(list_transform(range(1, len(toks) - 3),
         |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         |        || ' ' || toks[i+3] || ' ' || toks[i+4])) AS g
         |  FROM t),
         |p AS (SELECT DISTINCT lang, doc_id, g FROM p0),
         |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_shingles
         |  FROM p GROUP BY 1),
         |f AS (SELECT g, arg_min(lang, doc_id) AS lang FROM p GROUP BY 1),
         |nv AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_novel
         |  FROM f GROUP BY 1)
         |SELECT tot.lang AS lang, n_shingles,
         |  CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
         |  CAST(coalesce(n_novel, 0) AS DOUBLE) / n_shingles AS novelty_rate
         |FROM tot LEFT JOIN nv ON tot.lang = nv.lang ORDER BY 1""".stripMargin,
    "q_rate_ztest" ->
      """WITH bd AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT min(day) AS d_min, max(day) AS d_max FROM bd),
        |k AS (SELECT event_type,
        |    CAST(sum(CASE WHEN day * 2 <= d_min + d_max THEN n ELSE 0 END)
        |      AS BIGINT) AS k_first,
        |    CAST(sum(CASE WHEN day * 2 > d_min + d_max THEN n ELSE 0 END)
        |      AS BIGINT) AS k_second
        |  FROM bd CROSS JOIN sp GROUP BY 1)
        |SELECT event_type, k_first, k_second,
        |  CAST(k_first - k_second AS DOUBLE)
        |    / sqrt(CAST(k_first + k_second AS DOUBLE)) AS z
        |FROM k ORDER BY 1""".stripMargin,
    "q_abc_class" ->
      """WITH pp AS (SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev_c
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(rev_c) AS BIGINT) AS tot_c,
        |    CAST(count(*) AS BIGINT) AS n_total FROM pp),
        |r AS (SELECT l_partkey, rev_c,
        |    CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_c
        |  FROM pp),
        |c AS (SELECT CASE WHEN cum_c * 5 <= tot_c * 4 THEN 'A'
        |      WHEN cum_c * 20 <= tot_c * 19 THEN 'B' ELSE 'C' END AS cls,
        |    rev_c, n_total, tot_c
        |  FROM r CROSS JOIN t)
        |SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(count(*) AS DOUBLE) / n_total AS part_share,
        |  CAST(sum(rev_c) AS BIGINT) AS class_rev_c,
        |  CAST(sum(rev_c) AS DOUBLE) / tot_c AS rev_share
        |FROM c GROUP BY cls, n_total, tot_c ORDER BY cls""".stripMargin,
    "q7_volume_shipping" ->
      s"""WITH $lpCte
        |SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  EXTRACT(year FROM l_shipdate) AS l_year,
        |  CAST(sum(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lp JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      s"""WITH $lpCte,
        |base AS (SELECT EXTRACT(year FROM o_orderdate) AS o_year,
        |    CASE WHEN sn.n_name = 'NATION_5'
        |      THEN price_c * (100 - disc_c) ELSE 0 END AS nat_e4,
        |    price_c * (100 - disc_c) AS e4
        |  FROM lp JOIN orders ON l_orderkey = o_orderkey
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE o_custkey IN (SELECT c_custkey FROM customer
        |      JOIN nation ON c_nationkey = n_nationkey
        |      JOIN region ON n_regionkey = r_regionkey
        |      WHERE r_name = 'AMERICA')
        |    AND l_partkey IN (SELECT p_partkey FROM part
        |      WHERE p_type = 'PROMO'))
        |SELECT o_year,
        |  CAST(sum(nat_e4) AS DOUBLE) / CAST(sum(e4) AS DOUBLE) AS mkt_share,
        |  CAST(sum(e4) AS DOUBLE) / 10000.0 AS total_revenue
        |FROM base GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_readability" ->
      s"""WITH $toksCte,
         |pd AS (SELECT lang,
         |    CAST(len(toks) AS BIGINT) AS w,
         |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS s,
         |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
         |      AS BIGINT) AS y
         |  FROM t),
         |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(w) AS BIGINT) AS words,
         |    CAST(sum(s) AS BIGINT) AS sentences,
         |    CAST(sum(y) AS BIGINT) AS syllables
         |  FROM pd GROUP BY 1)
         |SELECT lang, n_docs, words, sentences, syllables,
         |  206.835
         |    - 1.015 * (CAST(words AS DOUBLE)
         |      / CAST(greatest(sentences, 1) AS DOUBLE))
         |    - 84.6 * (CAST(syllables AS DOUBLE)
         |      / CAST(greatest(words, 1) AS DOUBLE)) AS reading_ease
         |FROM a ORDER BY 1""".stripMargin,
    "ann_recall_at_k" ->
      s"""WITH $embCte,
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
         |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 5),
         |bf AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY round(list_cosine_similarity(qv, v), 4) DESC, vec_id) AS rn
         |  FROM c CROSS JOIN q) WHERE rn <= 5),
         |eb AS (SELECT vec_id, v,
         |  (CASE WHEN v[1] > 0 THEN '1' ELSE '0' END)
         |  || (CASE WHEN v[2] > 0 THEN '1' ELSE '0' END)
         |  || (CASE WHEN v[3] > 0 THEN '1' ELSE '0' END) AS bucket FROM e),
         |lq AS (SELECT vec_id AS q_id, v AS qv, bucket FROM eb WHERE vec_id < 5),
         |lc AS (SELECT vec_id, v, bucket FROM eb WHERE vec_id >= 5),
         |lsh AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, lc.vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY round(list_cosine_similarity(qv, v), 4) DESC, lc.vec_id) AS rn
         |  FROM lc JOIN lq ON lc.bucket = lq.bucket) WHERE rn <= 5),
         |hits AS (SELECT l.q_id, count(*) AS n_hits FROM lsh l
         |  JOIN bf ON l.q_id = bf.q_id AND l.vec_id = bf.vec_id GROUP BY l.q_id)
         |SELECT q.q_id AS q_id, COALESCE(n_hits, 0) AS n_hits,
         |  COALESCE(n_hits, 0) / 5 AS recall_at_5
         |FROM (SELECT DISTINCT q_id FROM bf) q LEFT JOIN hits ON q.q_id = hits.q_id
         |ORDER BY q.q_id""".stripMargin,
    "text_bigram_model" ->
      s"""WITH $toksCte,
         |bg AS (SELECT lang,
         |  unnest(list_transform(range(1, len(toks)), i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
         |  FROM t),
         |pairs AS (SELECT lang, b.w1 AS w1, b.w2 AS w2 FROM bg),
         |bgc AS (SELECT lang, w1, w2, count(*) AS c_bg FROM pairs GROUP BY 1, 2, 3),
         |pc AS (SELECT lang, w1, count(*) AS c_w1 FROM pairs GROUP BY 1, 2)
         |SELECT lang, w1, w2, c_bg, c_w1, p_cond, rnk FROM (
         |  SELECT bgc.lang AS lang, bgc.w1 AS w1, w2, c_bg, c_w1,
         |    round(CAST(c_bg AS DOUBLE) / c_w1, 4) AS p_cond,
         |    CAST(row_number() OVER (PARTITION BY bgc.lang
         |      ORDER BY round(CAST(c_bg AS DOUBLE) / c_w1, 4) DESC, bgc.w1, w2) AS BIGINT) AS rnk
         |  FROM bgc JOIN pc ON bgc.lang = pc.lang AND bgc.w1 = pc.w1
         |  WHERE c_bg >= 20) WHERE rnk <= 3 ORDER BY lang, rnk""".stripMargin,
    "io_compact_small_files" ->
      """WITH s AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS total_qty_c,
        |    count(DISTINCT l_orderkey) AS n_orders
        |  FROM lineitem)
        |SELECT 'compacted' AS phase, CAST(4 AS BIGINT) AS n_files,
        |  n_rows, total_qty_c, n_orders FROM s
        |UNION ALL
        |SELECT 'fragmented', CAST(64 AS BIGINT), n_rows, total_qty_c, n_orders FROM s
        |ORDER BY phase""".stripMargin,
    "text_perplexity" ->
      s"""WITH $toksCte,
         |bg AS (SELECT doc_id, lang,
         |  unnest(list_transform(range(1, len(toks)),
         |    i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
         |  FROM t),
         |pairs AS (SELECT doc_id, lang, b.w1 AS w1, b.w2 AS w2 FROM bg),
         |bgc AS (SELECT lang, w1, w2, count(*) AS c_bg FROM pairs GROUP BY 1, 2, 3),
         |pc AS (SELECT lang, w1, count(*) AS c_w1 FROM pairs GROUP BY 1, 2)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(avg(-ln(CAST(c_bg AS DOUBLE) / c_w1)), 4) + 0.0 AS avg_nll
         |FROM pairs
         |JOIN bgc ON pairs.lang = bgc.lang AND pairs.w1 = bgc.w1 AND pairs.w2 = bgc.w2
         |JOIN pc ON pairs.lang = pc.lang AND pairs.w1 = pc.w1
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_perplexity_kn" ->
      s"""WITH $toksCte,
         |bg AS (SELECT doc_id, lang,
         |  unnest(list_transform(range(1, len(toks)),
         |    i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
         |  FROM t),
         |pairs AS (SELECT doc_id, lang, b.w1 AS w1, b.w2 AS w2 FROM bg),
         |bgc AS (SELECT lang, w1, w2, count(*) AS c_bg FROM pairs GROUP BY 1, 2, 3),
         |pref AS (SELECT lang, w1, sum(c_bg) AS c_w1, count(*) AS t_w1 FROM bgc GROUP BY 1, 2),
         |cont AS (SELECT lang, w2, count(*) AS n1_w2 FROM bgc GROUP BY 1, 2),
         |bt AS (SELECT lang, count(*) AS b_types FROM bgc GROUP BY 1)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(avg(-ln((c_bg - 0.75) / c_w1 +
         |    0.75 * t_w1 / c_w1 * (CAST(n1_w2 AS DOUBLE) / b_types))), 4) + 0.0
         |    AS avg_nll_kn
         |FROM pairs
         |JOIN bgc ON pairs.lang = bgc.lang AND pairs.w1 = bgc.w1 AND pairs.w2 = bgc.w2
         |JOIN pref ON pairs.lang = pref.lang AND pairs.w1 = pref.w1
         |JOIN cont ON pairs.lang = cont.lang AND pairs.w2 = cont.w2
         |JOIN bt ON pairs.lang = bt.lang
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_acf" ->
      """WITH daily AS (SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    CAST(count(*) AS DOUBLE) AS n FROM events GROUP BY 1),
        |lagged AS (SELECT n,
        |  lag(n, 1) OVER w AS lag1, lag(n, 2) OVER w AS lag2,
        |  lag(n, 3) OVER w AS lag3, lag(n, 4) OVER w AS lag4,
        |  lag(n, 5) OVER w AS lag5, lag(n, 6) OVER w AS lag6,
        |  lag(n, 7) OVER w AS lag7
        |  FROM daily WINDOW w AS (ORDER BY day))
        |SELECT CAST(1 AS BIGINT) AS lag_days, round(corr(n, lag1), 4) + 0.0 AS acf,
        |  count(lag1) AS n_days FROM lagged
        |UNION ALL SELECT 2, round(corr(n, lag2), 4) + 0.0, count(lag2) FROM lagged
        |UNION ALL SELECT 3, round(corr(n, lag3), 4) + 0.0, count(lag3) FROM lagged
        |UNION ALL SELECT 4, round(corr(n, lag4), 4) + 0.0, count(lag4) FROM lagged
        |UNION ALL SELECT 5, round(corr(n, lag5), 4) + 0.0, count(lag5) FROM lagged
        |UNION ALL SELECT 6, round(corr(n, lag6), 4) + 0.0, count(lag6) FROM lagged
        |UNION ALL SELECT 7, round(corr(n, lag7), 4) + 0.0, count(lag7) FROM lagged
        |ORDER BY lag_days""".stripMargin,
    "q_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |c AS (SELECT digit, count(*) AS n,
        |  CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS p_observed,
        |  round(log10(1.0 + 1.0 / digit), 4) AS p_benford
        |  FROM d GROUP BY digit)
        |SELECT digit, n, p_observed, p_benford,
        |  round(abs(p_observed - p_benford), 4) AS abs_delta
        |FROM c ORDER BY digit""".stripMargin,
    "q_basket_size_hist" ->
      s"""WITH $lpCte,
         |po AS (SELECT l_orderkey, count(*) AS n_lines,
         |    CAST(sum(price_c) AS BIGINT) AS price_c
         |  FROM lp GROUP BY 1)
         |SELECT n_lines, count(*) AS n_orders,
         |  CAST(sum(price_c) AS DOUBLE) / 100.0 AS revenue,
         |  round((CAST(sum(price_c) AS DOUBLE) / 100.0) / count(*), 4)
         |    AS avg_order_value
         |FROM po GROUP BY 1 ORDER BY n_lines""".stripMargin,
    "corpus_dedup_by_source" ->
      """WITH d AS (SELECT doc_id, source, lang, md5(lower(text)) AS digest
        |  FROM documents),
        |c AS (SELECT digest, count(*) AS copies, min(doc_id) AS keeper
        |  FROM d GROUP BY 1)
        |SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_in_dup_clusters,
        |  CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_redundant
        |FROM d JOIN c USING (digest)
        |GROUP BY 1, 2 ORDER BY source, lang""".stripMargin,
    "text_length_profile" ->
      """WITH s AS (SELECT lang || '/' || source AS seg, n_chars FROM documents)
        |SELECT seg, count(*) AS n_docs,
        |  round(quantile_cont(n_chars, 0.1), 4) AS p10,
        |  round(quantile_cont(n_chars, 0.5), 4) AS p50,
        |  round(quantile_cont(n_chars, 0.9), 4) AS p90
        |FROM s GROUP BY 1 ORDER BY seg""".stripMargin,
    "q_order_aging" ->
      """WITH a AS (SELECT max(CAST(o_orderdate AS DATE)) AS as_of FROM orders),
        |o AS (SELECT o_orderpriority AS priority,
        |    date_diff('day', CAST(o_orderdate AS DATE), as_of) AS age,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        |  FROM orders, a WHERE o_orderstatus = 'O')
        |SELECT priority,
        |  CASE WHEN age <= 90 THEN '000-090' WHEN age <= 180 THEN '091-180'
        |       WHEN age <= 365 THEN '181-365' ELSE '365+' END AS age_band,
        |  count(*) AS n_orders,
        |  CAST(sum(price_c) AS DOUBLE) / 100.0 AS open_value
        |FROM o GROUP BY 1, 2 ORDER BY priority, age_band""".stripMargin,
    "q_winsorized_mean" ->
      """WITH b AS (SELECT event_type, quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY 1),
        |w AS (SELECT e.event_type, value, greatest(lo, least(hi, value)) AS wv,
        |    CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END AS cl
        |  FROM events e JOIN b USING (event_type))
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
        |    / count(*) / 100.0 AS raw_mean,
        |  round(avg(wv), 4) AS winsorized_mean,
        |  CAST(sum(cl) AS DOUBLE) / count(*) * 100 AS pct_clamped
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_median_abs_dev" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |d AS (SELECT e.event_type, abs(value - med) AS absdev
        |  FROM events e JOIN med m ON e.event_type = m.event_type)
        |SELECT event_type, round(quantile_cont(absdev, 0.5), 4) AS mad,
        |  round(avg(absdev), 4) AS mean_abs_dev, count(*) AS n_events
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    "sync_generation_gaps" ->
      s"""WITH $invCte, $durCte,
         |lin AS (SELECT cf, node_id, shard_id, count(*) AS n_files,
         |  max(generation) - min(generation) + 1 - count(*) AS span_holes
         |  FROM dur GROUP BY 1, 2, 3)
         |SELECT cf, count(*) AS n_lineages,
         |  CAST(sum(span_holes) AS BIGINT) AS total_holes,
         |  max(span_holes) AS max_holes
         |FROM lin GROUP BY cf ORDER BY cf""".stripMargin,
    "q_window_first_last" ->
      """WITH base AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate
        |  FROM lineitem WHERE l_suppkey <= 20),
        |fl AS (SELECT l_suppkey,
        |  first_value(l_orderkey) OVER w AS first_order,
        |  last_value(l_orderkey) OVER w AS last_order,
        |  nth_value(l_orderkey, 2) OVER w AS second_order
        |FROM base WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT l_suppkey, first_order, last_order, second_order, count(*) AS n_lines
        |FROM fl GROUP BY 1, 2, 3, 4 ORDER BY l_suppkey""".stripMargin,
    "q_growth_rate" ->
      """WITH monthly AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mon, count(*) AS n_orders
        |  FROM orders GROUP BY 1, 2)
        |SELECT yr, mon, n_orders,
        |  lag(n_orders, 1) OVER w AS prev_n,
        |  n_orders - lag(n_orders, 1) OVER w AS delta,
        |  round(CAST(n_orders - lag(n_orders, 1) OVER w AS DOUBLE)
        |    / lag(n_orders, 1) OVER w * 100, 4) + 0.0 AS pct_growth
        |FROM monthly WINDOW w AS (ORDER BY yr, mon) ORDER BY yr, mon""".stripMargin,
    "sync_replication_audit" ->
      s"""WITH $invCte, $durCte,
         |sh AS (SELECT cf, shard_id, count(DISTINCT node_id) AS n_nodes, count(*) AS n_files
         |  FROM dur GROUP BY 1, 2)
         |SELECT cf, count(*) AS n_shards,
         |  CAST(min(n_nodes) AS BIGINT) AS min_replication,
         |  CAST(max(n_nodes) AS BIGINT) AS max_replication
         |FROM sh GROUP BY cf ORDER BY cf""".stripMargin,
    "q_dow_profile" ->
      """SELECT CAST((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) % 7 AS BIGINT) AS dow,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY dow""".stripMargin,
    "q_correlation" ->
      """SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS qty_price_corr,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_transition_matrix" ->
      """WITH t AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS next_type, count(*) AS n_trans,
        |  CAST(count(*) AS DOUBLE)
        |    / sum(count(*)) OVER (PARTITION BY prev_type) AS p_trans
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_ewma" ->
      """WITH t AS (SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |tt AS (SELECT user_id, rn,
        |    (CASE WHEN rn = 1 THEN pow(0.8, n - 1)
        |      ELSE 0.2 * pow(0.8, n - rn) END) * value AS term
        |  FROM t),
        |b1 AS (SELECT user_id, (rn - 1) // 1024 AS blk,
        |    list_reduce(list(term ORDER BY rn), (a, b) -> a + b) AS bs
        |  FROM tt GROUP BY 1, 2),
        |ew AS (SELECT user_id,
        |    list_reduce(list(bs ORDER BY blk), (a, b) -> a + b) AS ew
        |  FROM b1 GROUP BY 1),
        |m AS (SELECT user_id, count(*) AS n_events,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1)
        |SELECT m.user_id AS user_id, n_events,
        |  ew + 0.0 AS ewma_value,
        |  CAST(cents AS DOUBLE) / n_events / 100.0 AS mean_value
        |FROM m JOIN ew USING (user_id) ORDER BY user_id""".stripMargin,
    "q_time_weighted_avg" ->
      """WITH t AS (SELECT event_type, event_id,
        |    CAST(round(value * 1000) AS BIGINT) AS v_milli,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |      PARTITION BY event_type ORDER BY ts, event_id) -
        |      epoch_us(CAST(ts AS TIMESTAMP)) AS dt_us
        |  FROM events),
        |g AS (SELECT event_type, count(*) AS n_intervals,
        |    CAST(sum(dt_us) AS BIGINT) AS total_us,
        |    sum(CAST(v_milli AS HUGEINT) * dt_us) AS swv
        |  FROM t WHERE dt_us IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_intervals, total_us,
        |  round(CAST(swv AS DOUBLE) / total_us / 1000.0, 6) AS twa_value
        |FROM g ORDER BY event_type""".stripMargin,
    "q_unpivot" ->
      """WITH u AS (
        |  SELECT l_returnflag, 'qty_c' AS measure,
        |         CAST(round(l_quantity * 100) AS BIGINT) AS cents FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'price_c',
        |         CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'disc_c',
        |         CAST(round(l_discount * 100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'tax_c',
        |         CAST(round(l_tax * 100) AS BIGINT) FROM lineitem)
        |SELECT l_returnflag, measure, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS total_c
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_weighted_median" ->
      """WITH r AS (SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS w,
        |    l_orderkey, l_linenumber FROM lineitem),
        |c AS (SELECT l_returnflag, qty_c,
        |    sum(w) OVER (PARTITION BY l_returnflag
        |      ORDER BY qty_c, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS tot_w
        |  FROM r)
        |SELECT l_returnflag, CAST(min(qty_c) AS BIGINT) AS wmedian_qty_c,
        |  CAST(max(tot_w) AS BIGINT) AS tot_weight_c
        |FROM c WHERE cum_w * 2 >= tot_w
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_gaps_islands" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day FROM events),
        |g AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp FROM d),
        |i AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(max(len) AS BIGINT) AS max_streak,
        |  CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM i GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_running_distinct" ->
      """WITH f AS (SELECT user_id,
        |    min(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS day
        |  FROM events GROUP BY 1),
        |nf AS (SELECT day, count(*) AS n_new FROM f GROUP BY 1),
        |d AS (SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    count(DISTINCT user_id) AS n_active FROM events GROUP BY 1)
        |SELECT d.day AS day, n_active,
        |  CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
        |  CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY d.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_distinct_users
        |FROM d LEFT JOIN nf ON d.day = nf.day ORDER BY day""".stripMargin,
    "q_calendar_densify" ->
      """WITH ev AS (SELECT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        |  FROM events WHERE user_id <= 20),
        |spine AS (SELECT user_id, unnest(generate_series(first_day, last_day)) AS day
        |  FROM (SELECT user_id, min(day) AS first_day, max(day) AS last_day
        |        FROM ev GROUP BY 1)),
        |active AS (SELECT DISTINCT user_id, day FROM ev)
        |SELECT s.user_id AS user_id, s.day AS day
        |FROM spine s LEFT JOIN active a
        |  ON s.user_id = a.user_id AND s.day = a.day
        |WHERE a.user_id IS NULL
        |ORDER BY user_id, day""".stripMargin,
    "q_type_user_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |tot AS (SELECT event_type, count(*) AS n_users FROM tu GROUP BY 1),
        |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_both
        |  FROM tu a JOIN tu b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_both,
        |  ta.n_users AS n_a, tb.n_users AS n_b,
        |  round(CAST(n_both AS DOUBLE) / (ta.n_users + tb.n_users - n_both), 4)
        |    AS jaccard
        |FROM pairs
        |JOIN tot ta ON ta.event_type = type_a
        |JOIN tot tb ON tb.event_type = type_b
        |ORDER BY type_a, type_b""".stripMargin,
    "q_moments" ->
      """WITH a AS (SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(q) AS BIGINT) AS s1, CAST(sum(q*q) AS BIGINT) AS s2,
        |    CAST(sum(q*q*q) AS BIGINT) AS s3, CAST(sum(q*q*q*q) AS BIGINT) AS s4
        |  FROM (SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS q
        |        FROM lineitem) GROUP BY 1),
        |m AS (SELECT l_returnflag, n, s1/CAST(n AS DOUBLE) AS mean,
        |    s2/CAST(n AS DOUBLE) - pow(s1/CAST(n AS DOUBLE), 2) AS m2,
        |    s3/CAST(n AS DOUBLE) - 3*(s1/CAST(n AS DOUBLE))*(s2/CAST(n AS DOUBLE))
        |      + 2*pow(s1/CAST(n AS DOUBLE), 3) AS m3,
        |    s4/CAST(n AS DOUBLE) - 4*(s1/CAST(n AS DOUBLE))*(s3/CAST(n AS DOUBLE))
        |      + 6*pow(s1/CAST(n AS DOUBLE), 2)*(s2/CAST(n AS DOUBLE))
        |      - 3*pow(s1/CAST(n AS DOUBLE), 4) AS m4
        |  FROM a)
        |SELECT l_returnflag, n, round(mean, 4) + 0.0 AS mean_qty,
        |  round(m3 / pow(m2, 1.5), 4) + 0.0 AS skewness,
        |  round(m4 / (m2 * m2) - 3, 4) + 0.0 AS excess_kurtosis
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_percent_of_total" ->
      """WITH r AS (SELECT n_name,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1)
        |SELECT n_name, CAST(rev_e4 AS DOUBLE) / 10000.0 AS revenue,
        |  round(CAST(rev_e4 AS DOUBLE) * 100 /
        |    CAST(sum(rev_e4) OVER () AS DOUBLE), 4) AS pct_share
        |FROM r ORDER BY n_name""".stripMargin,
    "stream_incremental_batch" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_e4
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_fb_upsert" ->
      """WITH c AS (SELECT user_id % 50 AS row_key,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS write_us,
        |    event_id AS generation, value FROM events)
        |SELECT row_key, write_us, generation, round(value, 4) AS value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY row_key
        |    ORDER BY write_us DESC, generation DESC) AS rn FROM c)
        |WHERE rn = 1 ORDER BY row_key""".stripMargin,
    "stream_append_windows" ->
      """WITH mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS m FROM events),
        |w AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
        |    event_type, count(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT hour_start, event_type, n_events FROM w, mx
        |WHERE hour_start + INTERVAL 2 HOUR <= m
        |ORDER BY 1, 2""".stripMargin,
    "stream_late_drop" ->
      """WITH r AS (SELECT ts, event_type, event_id,
        |    row_number() OVER (ORDER BY ts, event_id) AS rn,
        |    count(*) OVER () AS n FROM events),
        |acc AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM r WHERE rn * 3 > n),
        |mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS m FROM events)
        |SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n_events
        |FROM acc, mx
        |WHERE date_trunc('hour', ts) + INTERVAL 2 HOUR <= m
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_profile_table" ->
      """WITH b AS (SELECT *,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS o_prio_null
        |  FROM orders)
        |SELECT 'o_orderkey' AS col_name,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS DOUBLE) AS min_num, CAST(max(o_orderkey) AS DOUBLE) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM b
        |UNION ALL SELECT 'o_custkey',
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_custkey),
        |  CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE), NULL, NULL FROM b
        |UNION ALL SELECT 'o_totalprice',
        |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_totalprice),
        |  min(o_totalprice), max(o_totalprice), NULL, NULL FROM b
        |UNION ALL SELECT 'o_orderstatus',
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderstatus),
        |  NULL, NULL, min(o_orderstatus), max(o_orderstatus) FROM b
        |UNION ALL SELECT 'o_orderpriority',
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderpriority),
        |  NULL, NULL, min(o_orderpriority), max(o_orderpriority) FROM b
        |UNION ALL SELECT 'o_prio_null',
        |  CAST(sum(CASE WHEN o_prio_null IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_prio_null),
        |  NULL, NULL, min(o_prio_null), max(o_prio_null) FROM b
        |UNION ALL SELECT 'o_orderdate',
        |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT CAST(CAST(o_orderdate AS DATE) AS VARCHAR)),
        |  NULL, NULL,
        |  min(CAST(CAST(o_orderdate AS DATE) AS VARCHAR)),
        |  max(CAST(CAST(o_orderdate AS DATE) AS VARCHAR)) FROM b
        |ORDER BY col_name""".stripMargin,
    "q_event_pattern" ->
      """WITH t AS (SELECT user_id, ts, event_type,
        |    lead(event_type, 1) OVER w AS nxt1,
        |    lead(event_type, 2) OVER w AS nxt2
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, count(*) AS n_matches,
        |  CAST(min(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS first_match_us
        |FROM t
        |WHERE event_type = 'view' AND nxt1 = 'click' AND nxt2 = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sync_table_checksum" ->
      s"""WITH $invCte, $durCte
         |SELECT cf, count(*) AS n_files,
         |  bit_xor(CAST('0x' || substr(md5(path || '|' ||
         |    CAST(generation AS VARCHAR) || '|' ||
         |    CAST(size_bytes AS VARCHAR)), 1, 15) AS BIGINT)) AS content_sig,
         |  CAST(sum(size_bytes) AS BIGINT) AS bytes
         |FROM dur GROUP BY cf ORDER BY cf""".stripMargin,
    "sync_merkle_diff" ->
      s"""WITH $invCte, $durCte,
         |repb AS (SELECT cf, path, generation,
         |    CASE WHEN generation % 97 = 0 THEN size_bytes + 1
         |         ELSE size_bytes END AS size_bytes
         |  FROM dur WHERE generation % 101 <> 0),
         |la AS (SELECT cf,
         |    CAST('0x' || substr(md5(path), 1, 15) AS BIGINT) % 64 AS bucket,
         |    count(*) AS a_files,
         |    bit_xor(CAST('0x' || substr(md5(path || '|' ||
         |      CAST(generation AS VARCHAR) || '|' ||
         |      CAST(size_bytes AS VARCHAR)), 1, 15) AS BIGINT)) AS a_sig,
         |    CAST(sum(size_bytes) AS BIGINT) AS a_bytes
         |  FROM dur GROUP BY 1, 2),
         |lb AS (SELECT cf,
         |    CAST('0x' || substr(md5(path), 1, 15) AS BIGINT) % 64 AS bucket,
         |    count(*) AS b_files,
         |    bit_xor(CAST('0x' || substr(md5(path || '|' ||
         |      CAST(generation AS VARCHAR) || '|' ||
         |      CAST(size_bytes AS VARCHAR)), 1, 15) AS BIGINT)) AS b_sig
         |  FROM repb GROUP BY 1, 2)
         |SELECT COALESCE(la.cf, lb.cf) AS cf,
         |  COALESCE(la.bucket, lb.bucket) AS bucket,
         |  a_files, b_files, a_sig, b_sig, a_bytes,
         |  CASE WHEN b_sig IS NULL THEN 'missing_in_b'
         |       WHEN a_sig IS NULL THEN 'missing_in_a'
         |       ELSE 'hash_diverged' END AS status
         |FROM la FULL OUTER JOIN lb
         |  ON la.cf = lb.cf AND la.bucket = lb.bucket
         |WHERE a_sig IS NULL OR b_sig IS NULL OR a_sig <> b_sig
         |ORDER BY cf, bucket""".stripMargin,
    "sync_tombstone_gc" ->
      """WITH cells AS (SELECT CAST(user_id % 50 AS BIGINT) AS row_key,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id AS generation,
        |    (event_type = 'error') AS tombstone FROM events),
        |cut AS (SELECT max(ts_us) - 604800000000 AS cutoff_us FROM cells),
        |m AS (SELECT *, max(CASE WHEN tombstone THEN generation END)
        |    OVER (PARTITION BY row_key) AS mtg FROM cells),
        |g AS (SELECT row_key, count(*) AS n_cells,
        |    CAST(sum(CASE WHEN tombstone THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstones,
        |    CAST(sum(CASE WHEN mtg IS NOT NULL AND generation < mtg
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_shadowed,
        |    max(CASE WHEN generation = mtg THEN ts_us END) AS tomb_ts_us
        |  FROM m GROUP BY 1)
        |SELECT row_key, n_cells, n_tombstones, n_shadowed,
        |  (tomb_ts_us IS NOT NULL AND tomb_ts_us < cutoff_us) AS tomb_purged,
        |  n_cells - n_shadowed - (CASE WHEN tomb_ts_us IS NOT NULL
        |    AND tomb_ts_us < cutoff_us THEN 1 ELSE 0 END) AS n_after_gc
        |FROM g CROSS JOIN cut ORDER BY row_key""".stripMargin,
    "q_dp_counts" ->
      """WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS n_true FROM events GROUP BY 1, 2),
        |u AS (SELECT *, ((CAST('0x' || substr(md5(event_type || '|' ||
        |    CAST(day AS VARCHAR)), 1, 15) AS BIGINT) % 1000000) + 0.5)
        |    / 1000000.0 AS uu FROM c),
        |x AS (SELECT *, uu - 0.5 AS xx FROM u)
        |SELECT event_type, day, n_true,
        |  round(n_true + 2.0 * ((CASE WHEN xx < 0 THEN 1.0 ELSE -1.0 END) *
        |    ln(1.0 - 2.0 * abs(xx))), 4) AS n_released
        |FROM x ORDER BY event_type, day""".stripMargin,
    "q_hll_setops" ->
      """WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
        |h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM du),
        |d AS (SELECT event_type, hx,
        |  (CASE WHEN substr(hx, 1, 1) BETWEEN '0' AND '9'
        |     THEN ascii(substr(hx, 1, 1)) - 48 ELSE ascii(substr(hx, 1, 1)) - 87 END) * 16 +
        |  (CASE WHEN substr(hx, 2, 1) BETWEEN '0' AND '9'
        |     THEN ascii(substr(hx, 2, 1)) - 48 ELSE ascii(substr(hx, 2, 1)) - 87 END) AS byte0,
        |  length(regexp_extract(substr(hx, 3), '^0*')) AS zh
        |  FROM h),
        |z AS (SELECT event_type, byte0 % 64 AS bucket, zh, substr(hx, 3 + zh, 1) AS fd FROM d),
        |rh AS (SELECT event_type, bucket,
        |  LEAST(4 * zh + (CASE WHEN dv >= 8 THEN 0 WHEN dv >= 4 THEN 1
        |                       WHEN dv >= 2 THEN 2 ELSE 3 END) + 1, 30) AS rho
        |  FROM (SELECT *, CASE WHEN fd = '' THEN 0
        |                       WHEN fd BETWEEN '0' AND '9' THEN ascii(fd) - 48
        |                       ELSE ascii(fd) - 87 END AS dv FROM z)),
        |reg AS (SELECT event_type, bucket, max(rho) AS r FROM rh GROUP BY 1, 2),
        |grid AS (SELECT event_type, b AS bucket FROM (SELECT DISTINCT event_type FROM events)
        |  CROSS JOIN (SELECT unnest(range(0, 64)) AS b)),
        |fullr AS (SELECT grid.event_type AS event_type, grid.bucket AS bucket,
        |    COALESCE(reg.r, 0) AS r
        |  FROM grid LEFT JOIN reg ON grid.event_type = reg.event_type
        |    AND grid.bucket = reg.bucket),
        |agg AS (SELECT event_type,
        |  CAST(sum(CAST(pow(2, 30 - r) AS BIGINT)) AS BIGINT) AS s_int,
        |  CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero
        |  FROM fullr GROUP BY 1),
        |est AS (SELECT event_type,
        |  CASE WHEN 0.709 * 4096.0 * 1073741824.0 / s_int <= 160.0 AND v_zero > 0
        |       THEN 64.0 * ln(64.0 / v_zero)
        |       ELSE 0.709 * 4096.0 * 1073741824.0 / s_int END AS e
        |  FROM agg),
        |up AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    GREATEST(a.r, b.r) AS r
        |  FROM fullr a JOIN fullr b ON a.bucket = b.bucket
        |    AND a.event_type < b.event_type),
        |uagg AS (SELECT type_a, type_b,
        |  CAST(sum(CAST(pow(2, 30 - r) AS BIGINT)) AS BIGINT) AS s_int,
        |  CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero
        |  FROM up GROUP BY 1, 2),
        |uest AS (SELECT type_a, type_b,
        |  CASE WHEN 0.709 * 4096.0 * 1073741824.0 / s_int <= 160.0 AND v_zero > 0
        |       THEN 64.0 * ln(64.0 / v_zero)
        |       ELSE 0.709 * 4096.0 * 1073741824.0 / s_int END AS eu
        |  FROM uagg),
        |ix AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
        |    count(*) AS n_exact_intersect
        |  FROM du x JOIN du y ON x.user_id = y.user_id
        |    AND x.event_type < y.event_type GROUP BY 1, 2)
        |SELECT u.type_a AS type_a, u.type_b AS type_b,
        |  CAST(COALESCE(n_exact_intersect, 0) AS BIGINT) AS n_exact_intersect,
        |  round(eu, 2) AS hll_union_est,
        |  round(ea.e + eb.e - eu, 2) AS hll_intersect_est
        |FROM uest u
        |JOIN est ea ON ea.event_type = u.type_a
        |JOIN est eb ON eb.event_type = u.type_b
        |LEFT JOIN ix ON ix.type_a = u.type_a AND ix.type_b = u.type_b
        |ORDER BY 1, 2""".stripMargin,
    "q_fuzzy_join" ->
      """WITH names AS (SELECT p_name AS name, count(*) AS n_parts,
        |    split_part(p_name, ' ', 1) AS blk
        |  FROM part GROUP BY 1)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  a.n_parts AS n_a, b.n_parts AS n_b,
        |  round(jaro_winkler_similarity(a.name, b.name), 4) AS jw
        |FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
        |WHERE round(jaro_winkler_similarity(a.name, b.name), 4) >= 0.88
        |ORDER BY name_a, name_b""".stripMargin,
    "q_chi_square" ->
      """WITH obs AS (SELECT event_type,
        |    CAST((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) % 7
        |      AS BIGINT) AS dow, count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS row_n FROM obs GROUP BY 1),
        |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS col_n FROM obs GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs)
        |SELECT obs.event_type AS event_type, CAST(sum(o) AS BIGINT) AS n_events,
        |  round(sum((o - CAST(row_n AS DOUBLE) * col_n / n)
        |    * (o - CAST(row_n AS DOUBLE) * col_n / n)
        |    / (CAST(row_n AS DOUBLE) * col_n / n)), 4) AS chi2_contrib
        |FROM obs JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN tot
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_user_entropy" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1)
        |SELECT c.user_id AS user_id, max(n) AS n_events,
        |  count(*) AS n_types,
        |  round(-sum((CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n)), 4)
        |    + 0.0 AS entropy_bits
        |FROM c JOIN t ON c.user_id = t.user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_linreg" ->
      """WITH s AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) - 20000
        |      AS DOUBLE) AS x, value AS y
        |  FROM events),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM s GROUP BY 1)
        |SELECT event_type, n AS n_events,
        |  round(CASE WHEN n * sxx - sx * sx > 0
        |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 4) AS slope,
        |  round(CASE WHEN n * sxx - sx * sx > 0
        |    THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
        |    END, 4) AS intercept,
        |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
        |      / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 4) AS r2
        |FROM a ORDER BY event_type""".stripMargin,
    "q_ks_test" ->
      """WITH cells AS (SELECT event_type, value, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |vals AS (SELECT value, CAST(sum(c) AS BIGINT) AS c_all
        |  FROM cells GROUP BY 1),
        |grid AS (SELECT t.event_type, v.value, v.c_all, coalesce(c.c, 0) AS c
        |  FROM vals v CROSS JOIN (SELECT DISTINCT event_type FROM cells) t
        |  LEFT JOIN cells c ON c.event_type = t.event_type AND c.value = v.value),
        |cum AS (SELECT event_type, value, c_all,
        |    CAST(sum(c) OVER w AS BIGINT) AS cum_t,
        |    CAST(sum(c_all) OVER w AS BIGINT) AS cum_all
        |  FROM grid WINDOW w AS (PARTITION BY event_type ORDER BY value
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT event_type, max(cum_t) AS n_t, max(cum_all) AS n
        |  FROM cum GROUP BY 1)
        |SELECT cum.event_type AS event_type, CAST(max(n_t) AS BIGINT) AS n_events,
        |  round(max(abs(CAST(cum_t AS DOUBLE) / n_t
        |    - CAST(cum_all - cum_t AS DOUBLE) / (n - n_t))), 4) AS ks_d
        |FROM cum JOIN tot USING (event_type)
        |WHERE n_t < n
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mutual_info" ->
      """WITH obs AS (SELECT event_type,
        |    CAST((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) % 7
        |      AS BIGINT) AS dow, count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS row_n FROM obs GROUP BY 1),
        |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS col_n FROM obs GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs)
        |SELECT obs.event_type AS event_type, CAST(sum(o) AS BIGINT) AS n_events,
        |  round(sum((CAST(o AS DOUBLE) / n)
        |    * log2(CAST(o AS DOUBLE) * n
        |      / (CAST(row_n AS DOUBLE) * col_n))), 4) AS mi_bits
        |FROM obs JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN tot
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cms_estimate" ->
      """WITH d AS (SELECT * FROM (VALUES
        |    (0, 1103, 12345), (1, 12289, 67), (2, 331, 999331), (3, 8191, 271))
        |    AS t(depth, a, b)),
        |counters AS (SELECT depth,
        |    ((user_id * a + b) % 2147483647) % 256 AS bucket, count(*) AS c
        |  FROM events CROSS JOIN d GROUP BY 1, 2),
        |top AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n
        |  FROM events GROUP BY 1 ORDER BY exact_n DESC, user_id LIMIT 20)
        |SELECT t.user_id AS user_id, t.exact_n AS exact_n,
        |  CAST(min(c.c) AS BIGINT) AS cms_n
        |FROM top t CROSS JOIN d
        |JOIN counters c ON c.depth = d.depth
        |  AND c.bucket = ((t.user_id * d.a + d.b) % 2147483647) % 256
        |GROUP BY 1, 2 ORDER BY exact_n DESC, user_id""".stripMargin,
    "q_window_time_range" ->
      """WITH t AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    CAST(round(value * 10000) AS BIGINT) AS value_e4
        |  FROM events WHERE user_id <= 20)
        |SELECT user_id, event_id, ts_us, value_e4,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(value_e4) OVER w AS BIGINT) AS sum_1h_e4
        |FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |  RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "vec_gram_matrix" ->
      """WITH comp AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |  CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)
        |SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
        |  round(sum(a.x * b.x), 4) + 0.0 AS g
        |FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND b.i >= a.i
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "vec_pca_project" -> pcaProjectSql,
    "io_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderstatus END AS o_orderstatus,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "text_token_len_hist" ->
      s"""WITH $toksCte
         |SELECT CAST(length(tok) AS BIGINT) AS tok_len, count(*) AS n_tokens
         |FROM (SELECT unnest(toks) AS tok FROM t)
         |GROUP BY 1 ORDER BY tok_len""".stripMargin,
    "text_pack_chunks" ->
      """WITH t AS (SELECT doc_id, lang, doc_id % 8 AS shard,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens FROM documents),
        |p AS (SELECT lang, shard, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
        |  FROM t)
        |SELECT lang, shard, doc_id, n_tokens, start_off,
        |  start_off // 512 AS seq_first,
        |  (start_off + n_tokens - 1) // 512 AS seq_last,
        |  (start_off + n_tokens - 1) // 512 - start_off // 512 + 1 AS n_seqs_spanned
        |FROM p ORDER BY lang, shard, doc_id""".stripMargin,
    "corpus_chunk_overlap" ->
      s"""WITH $toksCte,
         |d AS (SELECT doc_id, toks, len(toks) AS n FROM t),
         |k AS (SELECT doc_id, toks, n,
         |  unnest(range(0, 1 + CASE WHEN n > 128 THEN (n - 128 + 95) // 96 ELSE 0 END)) AS ci
         |  FROM d)
         |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
         |  CAST(ci * 96 AS BIGINT) AS start_tok,
         |  CAST(least(ci * 96 + 128, n) - ci * 96 AS BIGINT) AS n_tok_chunk,
         |  md5(array_to_string(toks[CAST(ci * 96 + 1 AS INT) :
         |    CAST(least(ci * 96 + 128, n) AS INT)], ' ')) AS chunk_md5
         |FROM k ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_contamination" ->
      s"""WITH $toksCte,
         |s AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks) - 6, 1)),
         |  i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
         |       toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7]))) AS spans
         |  FROM t),
         |b AS (SELECT DISTINCT unnest(spans) AS span FROM s WHERE doc_id % 97 = 0),
         |c AS (SELECT doc_id, spans FROM s WHERE doc_id % 97 <> 0),
         |h AS (SELECT cs.doc_id, count(*) AS n_contam_spans
         |      FROM (SELECT doc_id, unnest(spans) AS span FROM c) cs
         |      JOIN b USING (span) GROUP BY cs.doc_id)
         |SELECT c.doc_id, CAST(len(c.spans) AS BIGINT) AS n_spans,
         |  CAST(coalesce(h.n_contam_spans, 0) AS BIGINT) AS n_contam_spans,
         |  coalesce(h.n_contam_spans, 0) > 0 AS contaminated
         |FROM c LEFT JOIN h USING (doc_id) ORDER BY doc_id""".stripMargin,
    "corpus_source_overlap" ->
      """WITH ss AS (SELECT DISTINCT source, sh FROM (
        |  SELECT source, unnest(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh
        |  FROM (SELECT source,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents))),
        |vocab AS (SELECT source, count(*) AS n_sh FROM ss GROUP BY 1),
        |shared AS (SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS n_shared
        |  FROM ss a JOIN ss b USING (sh) WHERE a.source < b.source GROUP BY 1, 2),
        |grid AS (SELECT va.source AS source_a, vb.source AS source_b,
        |    va.n_sh AS sh_a, vb.n_sh AS sh_b
        |  FROM vocab va, vocab vb WHERE va.source < vb.source)
        |SELECT source_a, source_b, sh_a, sh_b,
        |  CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
        |  coalesce(n_shared, 0) /
        |    CAST(sh_a + sh_b - coalesce(n_shared, 0) AS DOUBLE) AS jaccard
        |FROM grid LEFT JOIN shared USING (source_a, source_b)
        |ORDER BY source_a, source_b""".stripMargin,
    "corpus_mixture" ->
      """WITH t AS (SELECT lang, source,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS n_toks FROM documents),
        |cells AS (SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens FROM t GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total, count(*) AS n_cells FROM cells)
        |SELECT lang, source, n_docs, n_tokens,
        |  (1000000 * n_docs) // n_total AS share_ppm,
        |  (1000000 * n_total) // (n_cells * n_docs) AS weight_ppm
        |FROM cells, tot ORDER BY lang, source""".stripMargin,
    "corpus_dsir_select" ->
      s"""WITH $toksCte,
         |tok0 AS (SELECT doc_id, lang, unnest(toks) AS word FROM t),
         |tok AS (SELECT doc_id, lang,
         |    CAST('0x' || substr(md5(word), 1, 15) AS BIGINT) % 256 AS bucket
         |  FROM tok0),
         |pdb AS (SELECT doc_id, lang, bucket, count(*) AS c
         |  FROM tok GROUP BY 1, 2, 3),
         |rawb AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS cr FROM pdb GROUP BY 1),
         |tgtb AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS ct FROM pdb
         |  WHERE lang = 'en' GROUP BY 1),
         |tots AS (SELECT CAST(sum(c) AS BIGINT) AS tr,
         |    CAST(sum(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS BIGINT) AS tt
         |  FROM pdb),
         |lr AS (SELECT rawb.bucket AS bucket,
         |    CAST(round(ln(((COALESCE(ct, 0) + 1.0) / (tt + 256.0)) /
         |      ((cr + 1.0) / (tr + 256.0))) * 1000000.0) AS BIGINT) AS lr_micro
         |  FROM rawb LEFT JOIN tgtb ON rawb.bucket = tgtb.bucket CROSS JOIN tots)
         |SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n_toks,
         |  CAST(sum(c * lr_micro) AS BIGINT) AS score_micro
         |FROM pdb JOIN lr ON pdb.bucket = lr.bucket
         |GROUP BY 1, 2 ORDER BY score_micro DESC, doc_id LIMIT 50""".stripMargin,
    "dedup_url_norm" ->
      """WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 4 = 0 THEN 'http://' ELSE 'HTTPS://' END) ||
        |  (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END) ||
        |  source || '.example.com/docs/' || CAST(doc_id % 40 AS VARCHAR) ||
        |  (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed'
        |        WHEN doc_id % 3 = 1 THEN '/' ELSE '' END) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END) AS url
        |  FROM documents),
        |n AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |  lower(url), '^https?://', ''), '^www\.', ''), '[?#].*$', ''), '/$', '') AS norm_url
        |  FROM u)
        |SELECT norm_url, count(*) AS n_docs, min(doc_id) AS canonical_doc_id
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_having" ->
      """SELECT l_partkey, count(*) AS n_lines, sum(l_quantity) AS total_qty
        |FROM lineitem GROUP BY l_partkey HAVING count(*) >= 40
        |ORDER BY l_partkey""".stripMargin,
    "q_null_semantics" ->
      """SELECT o_orderpriority, count(*) AS n_rows,
        |  count(nullif(o_orderstatus, 'P')) AS n_nonnull_np,
        |  count(nullif(o_orderstatus, 'O')) AS n_nonnull_no,
        |  CAST(sum(CASE WHEN nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM nullif(o_orderstatus, 'O')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
        |  CAST(sum(CASE WHEN COALESCE(nullif(o_orderstatus, 'O'), 'X') = 'X'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_defaulted
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_d7_retention" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        |SELECT d0 AS cohort_day, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(CASE WHEN a.d IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_retained,
        |  CAST(sum(CASE WHEN a.d IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) * 100 AS pct_retained
        |FROM f LEFT JOIN a ON f.user_id = a.user_id AND a.d = d0 + 7
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "vec_centroid_drift" ->
      s"""WITH $embCte,
         |h AS (SELECT label, vec_id % 2 = 0 AS even, v FROM e),
         |comp AS (SELECT label, even, pos - 1 AS pos, x FROM (
         |  SELECT label, even, unnest(v) AS x,
         |    generate_subscripts(v, 1) AS pos FROM h)),
         |cent AS (SELECT label, even, list(cx ORDER BY pos) AS cv FROM (
         |  SELECT label, even, pos, avg(x) AS cx FROM comp GROUP BY 1, 2, 3)
         |  GROUP BY 1, 2),
         |n AS (SELECT label,
         |  CAST(count(*) FILTER (even) AS BIGINT) AS n_even,
         |  CAST(count(*) FILTER (NOT even) AS BIGINT) AS n_odd
         |  FROM h GROUP BY 1)
         |SELECT n.label AS label, n.n_even, n.n_odd,
         |  round(list_cosine_similarity(a.cv, b.cv), 4) + 0.0 AS half_cosine
         |FROM n JOIN cent a ON a.label = n.label AND a.even
         |JOIN cent b ON b.label = n.label AND NOT b.even
         |ORDER BY label""".stripMargin,
    "q_seasonal_decompose" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
        |      AS day, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |ma AS (SELECT *, count(*) OVER w AS n_win, avg(v) OVER w AS trend
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dt AS (SELECT event_type, (day + 3) % 7 AS dow, v - trend AS dt
        |  FROM ma WHERE n_win = 7),
        |s AS (SELECT *, avg(dt) OVER (PARTITION BY event_type, dow)
        |    AS seasonal_raw FROM dt)
        |SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_days,
        |  round(max(seasonal_raw), 4) AS seasonal,
        |  round(avg(abs(dt - seasonal_raw)), 4) AS mad_resid
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ann_ivf_recall_sweep" ->
      s"""WITH $embCte,
         |comp AS (SELECT label AS c_id, pos - 1 AS pos, x
         |         FROM (SELECT label, unnest(v) AS x,
         |               generate_subscripts(v, 1) AS pos FROM e)),
         |cent AS (SELECT c_id, list(cx ORDER BY pos) AS cv FROM (
         |  SELECT c_id, pos, avg(x) AS cx FROM comp GROUP BY c_id, pos) GROUP BY c_id),
         |scored AS (SELECT vec_id, label, c_id,
         |  round(list_cosine_similarity(v, cv), 4) + 0.0 AS ccos FROM e CROSS JOIN cent),
         |assign AS (SELECT vec_id, c_id AS assigned_centroid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, c_id) AS rn
         |  FROM scored) WHERE rn = 1),
         |ea AS (SELECT e.vec_id, v, assigned_centroid FROM e JOIN assign ON e.vec_id = assign.vec_id),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM ea WHERE vec_id < 5),
         |c AS (SELECT vec_id, v, assigned_centroid FROM ea WHERE vec_id >= 5),
         |nps AS (SELECT * FROM (VALUES (1), (2), (4)) t(np)),
         |cranks AS (SELECT q.q_id, cent.c_id,
         |  row_number() OVER (PARTITION BY q.q_id
         |    ORDER BY round(list_cosine_similarity(q.qv, cent.cv), 4) DESC, cent.c_id)
         |    AS rn FROM q CROSS JOIN cent),
         |probes AS (SELECT np, q_id, c_id FROM cranks CROSS JOIN nps WHERE rn <= np),
         |s AS (SELECT p.np, p.q_id, c.vec_id,
         |  round(list_cosine_similarity(q.qv, c.v), 4) AS cos
         |  FROM c JOIN probes p ON c.assigned_centroid = p.c_id
         |  JOIN q ON q.q_id = p.q_id),
         |approx AS (SELECT np, q_id, vec_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY np, q_id
         |    ORDER BY cos DESC, vec_id) AS rnk FROM s) WHERE rnk <= 5),
         |exact AS (SELECT q_id, vec_id FROM (
         |  SELECT q.q_id, c.vec_id,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY round(list_cosine_similarity(q.qv, c.v), 4) DESC, c.vec_id)
         |      AS rnk FROM q CROSS JOIN c) WHERE rnk <= 5),
         |hits AS (SELECT np, a.q_id, count(*) AS n_hits FROM approx a
         |  JOIN exact x ON a.q_id = x.q_id AND a.vec_id = x.vec_id GROUP BY 1, 2),
         |grid AS (SELECT np, q_id FROM nps
         |  CROSS JOIN (SELECT DISTINCT q_id FROM exact))
         |SELECT CAST(np AS BIGINT) AS nprobe, CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(coalesce(n_hits, 0)) AS DOUBLE) / (count(*) * 5) AS mean_recall
         |FROM grid LEFT JOIN hits USING (np, q_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ann_ivf_topk" ->
      s"""WITH $embCte,
         |comp AS (SELECT label AS c_id, pos - 1 AS pos, x
         |         FROM (SELECT label, unnest(v) AS x,
         |               generate_subscripts(v, 1) AS pos FROM e)),
         |cent AS (SELECT c_id, list(cx ORDER BY pos) AS cv FROM (
         |  SELECT c_id, pos, avg(x) AS cx FROM comp GROUP BY c_id, pos) GROUP BY c_id),
         |scored AS (SELECT vec_id, label, c_id,
         |  round(list_cosine_similarity(v, cv), 4) + 0.0 AS ccos FROM e CROSS JOIN cent),
         |assign AS (SELECT vec_id, c_id AS assigned_centroid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, c_id) AS rn
         |  FROM scored) WHERE rn = 1),
         |ea AS (SELECT e.vec_id, v, assigned_centroid FROM e JOIN assign ON e.vec_id = assign.vec_id),
         |q AS (SELECT vec_id AS q_id, v AS qv, assigned_centroid AS probe FROM ea WHERE vec_id < 5),
         |c AS (SELECT vec_id, v, assigned_centroid FROM ea WHERE vec_id >= 5),
         |s AS (SELECT q_id, c.vec_id, probe,
         |  round(list_cosine_similarity(qv, v), 4) AS cos
         |  FROM c JOIN q ON c.assigned_centroid = q.probe)
         |SELECT q_id, vec_id, probe, cos, rnk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         |  FROM s) WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "ann_semantic_contamination" ->
      s"""WITH $embCte,
         |comp AS (SELECT label AS c_id, pos - 1 AS pos, x
         |         FROM (SELECT label, unnest(v) AS x,
         |               generate_subscripts(v, 1) AS pos FROM e)),
         |cent AS (SELECT c_id, list(cx ORDER BY pos) AS cv FROM (
         |  SELECT c_id, pos, avg(x) AS cx FROM comp GROUP BY c_id, pos) GROUP BY c_id),
         |scored AS (SELECT vec_id, label, c_id,
         |  round(list_cosine_similarity(v, cv), 4) + 0.0 AS ccos FROM e CROSS JOIN cent),
         |assign AS (SELECT vec_id, c_id AS assigned_centroid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, c_id) AS rn
         |  FROM scored) WHERE rn = 1),
         |ea AS (SELECT e.vec_id, v, assigned_centroid FROM e JOIN assign ON e.vec_id = assign.vec_id),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM ea WHERE vec_id % 97 = 0),
         |c AS (SELECT vec_id, v, assigned_centroid FROM ea WHERE vec_id % 97 <> 0),
         |cranks AS (SELECT q.q_id, cent.c_id,
         |  row_number() OVER (PARTITION BY q.q_id
         |    ORDER BY round(list_cosine_similarity(q.qv, cent.cv), 4) DESC, cent.c_id)
         |    AS rn FROM q CROSS JOIN cent),
         |probes AS (SELECT q_id, c_id FROM cranks WHERE rn <= 2),
         |s AS (SELECT p.q_id, c.vec_id,
         |  round(list_cosine_similarity(q.qv, c.v), 4) AS cos
         |  FROM c JOIN probes p ON c.assigned_centroid = p.c_id
         |  JOIN q ON q.q_id = p.q_id)
         |SELECT q_id, rnk, vec_id, cos, cos >= 0.45 AS contaminated FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         |  FROM s) WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "vec_argmax" ->
      s"""WITH $embCte
         |SELECT vec_id,
         |  CAST(list_position(v, list_aggregate(v, 'max')) AS BIGINT) AS argmax_pos,
         |  CAST(list_position(v, list_aggregate(v, 'min')) AS BIGINT) AS argmin_pos,
         |  CAST(len(v) AS BIGINT) AS dim
         |FROM e ORDER BY vec_id""".stripMargin,
    "ann_label_separation" ->
      s"""WITH $embCte,
         |es AS (SELECT * FROM e WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '8')
         |SELECT a.label AS label, count(*) AS n_pairs,
         |  round(avg(list_cosine_similarity(a.v, b.v)), 4) + 0.0 AS mean_within_cos
         |FROM es a JOIN es b ON a.label = b.label AND a.vec_id < b.vec_id
         |GROUP BY a.label ORDER BY label""".stripMargin,
    "sync_daily_ingest" ->
      s"""WITH $invCte, $durCte
         |SELECT snap_date, cf, count(*) AS n_files,
         |  CAST(sum(size_bytes) AS BIGINT) AS bytes
         |FROM dur GROUP BY 1, 2 ORDER BY snap_date, cf""".stripMargin,
    "q1_agg" ->
      s"""WITH $lpCte
         |SELECT l_returnflag, l_linestatus,
         |  sum(l_quantity) AS sum_qty,
         |  CAST(sum(price_c) AS DOUBLE) / 100.0 AS sum_base_price,
         |  CAST(sum(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0 AS sum_disc_price,
         |  CAST(sum(price_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE) / 1000000.0 AS sum_charge,
         |  sum(l_quantity) / count(*) AS avg_qty,
         |  CAST(sum(price_c) AS DOUBLE) / 100.0 / count(*) AS avg_price,
         |  CAST(sum(disc_c) AS DOUBLE) / 100.0 / count(*) AS avg_disc,
         |  count(*) AS count_order
         |FROM lp WHERE l_shipdate <= TIMESTAMP '2001-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topn_join" ->
      s"""WITH $lpCte
        |SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lp JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_snowflake_join" ->
      s"""WITH $lpCte
        |SELECT n_name, CAST(sum(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lp JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_filter_sum" ->
      s"""WITH $lpCte
        |SELECT CAST(sum(price_c * disc_c) AS DOUBLE) / 10000.0 AS revenue,
        |  count(*) AS n_lines
        |FROM lp
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_exists_semi" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_not_exists_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_acctbal
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_conditional_agg" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(sum(CASE WHEN o_totalprice > 200000 THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS DOUBLE) / 100.0 AS big_total,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS DOUBLE) / 100.0
        |    / sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS avg_finished_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_rollup" ->
      """SELECT CASE WHEN GROUPING(r_name) = 1 THEN 'ALL' ELSE r_name END AS region_name,
        |  CASE WHEN GROUPING(n_name) = 1 THEN 'ALL' ELSE n_name END AS nation_name,
        |  count(*) AS n_customers,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,
    "q_pivot" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99,
        |  round(stddev(value), 4) AS sd,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
        |    / count(*) / 100.0 AS mean
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_percentiles_approx" ->
      """SELECT event_type, count(*) AS n_events,
        |  true AS p50_ok, true AS p90_ok, true AS p99_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_distinct_hll" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_stream_batch_twin" -> streamTwinSql,
    "stream_windowed_agg" -> streamTwinSql,
    "stream_state_metrics" ->
      """WITH wa AS (SELECT count(*) AS n FROM (
        |  SELECT DISTINCT date_trunc('hour', ts), event_type FROM events)),
        |cdc AS (SELECT count(DISTINCT user_id % 50) AS n FROM events)
        |SELECT 'cdc_cells_mgws' AS operator, CAST(cdc.n AS BIGINT) AS state_rows FROM cdc
        |UNION ALL
        |SELECT 'windowed_agg_complete' AS operator, CAST(wa.n AS BIGINT) FROM wa
        |ORDER BY operator""".stripMargin,
    "q_join_skew_salt" ->
      s"""WITH $lpCte
        |SELECT o_orderstatus,
        |  CAST(sum(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0 AS revenue,
        |  count(*) AS n_lines
        |FROM lp JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q10_returns" ->
      s"""WITH $lpCte
        |SELECT c_custkey, c_name, n_name,
        |  CAST(sum(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0 AS revenue,
        |  count(*) AS n_lines
        |FROM lp JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS c_nk, count(*) AS n_customers,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS cust_bal
        |  FROM customer GROUP BY c_nationkey),
        |s AS (SELECT s_nationkey AS s_nk, count(*) AS n_suppliers,
        |  CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS supp_bal
        |  FROM supplier GROUP BY s_nationkey)
        |SELECT COALESCE(c_nk, s_nk) AS nationkey,
        |  COALESCE(n_customers, 0) AS n_customers,
        |  COALESCE(n_suppliers, 0) AS n_suppliers,
        |  cust_bal, supp_bal
        |FROM c FULL OUTER JOIN s ON c_nk = s_nk ORDER BY nationkey""".stripMargin,
    "q_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mon,
        |  count(*) AS n_orders,
        |  CAST(min(dayofmonth(o_orderdate)) AS BIGINT) AS first_dom,
        |  CAST(max(dayofmonth(o_orderdate)) AS BIGINT) AS last_dom
        |FROM orders GROUP BY 1, 2, 3 ORDER BY yr, qtr, mon""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_upper,
        |  lower(p_type) AS type_lower,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substr(p_name, 1, 5) AS name_prefix,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  reverse(p_brand) AS brand_rev,
        |  replace(p_type, ' ', '_') AS type_snake,
        |  CAST(strpos(p_type, 'BRASS') AS BIGINT) AS brass_pos,
        |  p_brand || '|' || p_type AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,
    "vec_quantize" ->
      s"""WITH $embCte,
         |b AS (SELECT vec_id, v, list_aggregate(v, 'min') AS lo, list_aggregate(v, 'max') AS hi FROM e),
         |c AS (SELECT vec_id, list_transform(v,
         |        x -> CAST(floor((x - lo) / (hi - lo) * 255) AS BIGINT)) AS codes FROM b)
         |SELECT vec_id, codes[1] AS code0, codes[2] AS code1,
         |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
         |  CAST(list_aggregate(codes, 'min') AS BIGINT) AS code_min,
         |  CAST(list_aggregate(codes, 'max') AS BIGINT) AS code_max
         |FROM c ORDER BY vec_id""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k,
        |  count(DISTINCT k) AS n_distinct_k
        |FROM (SELECT event_type, json_extract(props, '$.k')::BIGINT AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_minmax_by" ->
      """WITH t AS (SELECT event_type, user_id,
        |  CAST(round(value * 100) AS BIGINT) * 10000000 + event_id AS m FROM events)
        |SELECT event_type, max_by(user_id, m) AS top_value_user,
        |  min_by(user_id, m) AS bottom_value_user, count(*) AS n_events
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ann_pq_codes" -> graft.similarity.Pq.pqCodesOracleSql,
    "ann_pq_adc" -> graft.similarity.Pq.pqAdcOracleSql,
    "ann_pq_rerank" -> graft.similarity.Pq.pqRerankOracleSql,
    "ann_rerank_sweep" -> graft.similarity.Pq.rerankSweepOracleSql,
    "vec_pq_distortion" -> graft.similarity.Pq.pqDistortionOracleSql,
    "io_stats_prune_bloom" -> graft.sources.TxnLog.statsPruneBloomOracleSql,
    "ann_ivf_pq_search" -> graft.similarity.Pq.ivfPqOracleSql,
    "graph_degree_hist" -> graft.graph.GraphOps.degreeHistOracleSql,
    "graph_triangles" -> graft.graph.GraphOps.trianglesOracleSql,
    "graph_pagerank" -> graft.graph.GraphOps.pagerankOracleSql(),
    "graph_assortativity" -> graft.graph.GraphOps.assortativityOracleSql,
    "graph_kcore" -> graft.graph.GraphOps.kcoreOracleSql(),
    "graph_bfs_layers" -> graft.graph.GraphOps.bfsOracleSql(),
    "q_copurchase_jaccard" -> graft.graph.GraphOps.copurchaseJaccardOracleSql,
    "q_decay_score" ->
      """WITH ref AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) AS ref_us
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value * pow(2.0,
        |    -CAST(ref_us - epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE)
        |      / (7.0 * 86400e6))), 4) AS decay_score
        |FROM events CROSS JOIN ref
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_daily_anomaly" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
        |  FROM events GROUP BY 1),
        |d AS (SELECT day,
        |    CAST((date_diff('day', DATE '1970-01-01', day) + 3) % 7 AS BIGINT)
        |      AS dow, n_events FROM daily),
        |s AS (SELECT day, dow, CAST(n_events AS BIGINT) AS n_events,
        |    avg(n_events) OVER w AS mu, stddev_samp(n_events) OVER w AS sd
        |  FROM d WINDOW w AS (PARTITION BY dow))
        |SELECT day, dow, n_events, round((n_events - mu) / sd, 4) AS z,
        |  abs(round((n_events - mu) / sd, 4)) >= 2.0 AS is_anomaly
        |FROM s WHERE sd IS NOT NULL AND sd > 0
        |ORDER BY day""".stripMargin,
    "q_basket_lift" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |sup AS (SELECT pk, count(*) AS sup FROM b GROUP BY 1),
        |f AS (SELECT pk, sup FROM sup WHERE sup >= 20),
        |fb AS (SELECT ok, b.pk AS pk, sup FROM b JOIN f ON b.pk = f.pk),
        |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM b),
        |pr AS (SELECT a.pk AS pa, b2.pk AS pb, a.sup AS sup_a, b2.sup AS sup_b,
        |    count(*) AS sup_ab
        |  FROM fb a JOIN fb b2 ON a.ok = b2.ok AND a.pk < b2.pk
        |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 3)
        |SELECT pa, pb, sup_ab, sup_a, sup_b,
        |  round(CAST(sup_ab AS DOUBLE) / sup_a, 4) AS confidence,
        |  round(CAST(sup_ab AS DOUBLE) * n_orders / (sup_a * sup_b), 4) AS lift
        |FROM pr CROSS JOIN n
        |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin,
    "q_bootstrap_ci" ->
      """WITH bb AS (SELECT unnest(range(1, 41)) AS b),
        |r0 AS (SELECT event_type, value,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':a'), 1, 15)
        |      AS BIGINT) % 1000000 AS h0,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':b'), 1, 15)
        |      AS BIGINT) % 999983 + 1 AS st
        |  FROM events),
        |r AS (SELECT event_type, bb.b AS b, value,
        |    (((h0 + bb.b * st) % 1000000) + 0.5) / 1000000.0 AS u
        |  FROM r0 CROSS JOIN bb),
        |w AS (SELECT event_type, b, value,
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |         WHEN u < 0.73575888234288467 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.98101184312384624 THEN 3
        |         WHEN u < 0.99634015317265634 THEN 4
        |         ELSE 5 END AS w
        |  FROM r),
        |m AS (SELECT event_type, b, sum(w * value) / sum(w) AS mean_b
        |  FROM w GROUP BY 1, 2),
        |ci AS (SELECT event_type,
        |    round(quantile_cont(mean_b, 0.025), 4) AS ci_lo,
        |    round(quantile_cont(mean_b, 0.975), 4) AS ci_hi FROM m GROUP BY 1),
        |pt AS (SELECT event_type,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
        |      / count(*) / 100.0 AS mean_value
        |  FROM events GROUP BY 1)
        |SELECT pt.event_type AS event_type, mean_value, ci_lo, ci_hi
        |FROM pt JOIN ci ON pt.event_type = ci.event_type
        |ORDER BY event_type""".stripMargin,
    "q_changepoint" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
        |  FROM events GROUP BY 1),
        |st AS (SELECT CAST(sum(n_events) AS BIGINT) AS tot,
        |    count(*) AS nd FROM daily),
        |c AS (SELECT day, CAST(n_events AS BIGINT) AS n_events,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
        |    CAST(sum(n_events) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM daily),
        |s AS (SELECT day, n_events,
        |    cum - rn * (CAST(tot AS DOUBLE) / nd) AS cusum
        |  FROM c CROSS JOIN st)
        |SELECT day, n_events, cusum,
        |  row_number() OVER (ORDER BY abs(cusum) DESC, day) = 1 AS is_peak
        |FROM s ORDER BY day""".stripMargin,
    "q_new_vs_returning" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM d GROUP BY 1)
        |SELECT day, count(*) AS n_active,
        |  CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  count(*) - CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_returning
        |FROM d JOIN f ON d.user_id = f.user_id
        |GROUP BY day ORDER BY day""".stripMargin,
    "q_session_path_topk" ->
      """WITH e AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS rn FROM events),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM e WHERE rn <= 3 GROUP BY 1)
        |SELECT path, count(*) AS n_users FROM p GROUP BY 1
        |ORDER BY n_users DESC, path LIMIT 10""".stripMargin,
    "q_churn_by_engagement" ->
      """WITH ref AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) AS max_us
        |  FROM events),
        |u AS (SELECT user_id, count(*) AS n_events,
        |    max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us
        |  FROM events GROUP BY 1),
        |t AS (SELECT
        |    CAST(ntile(4) OVER (ORDER BY n_events, user_id) AS BIGINT)
        |      AS quartile,
        |    n_events,
        |    CASE WHEN last_us < max_us - CAST(604800000000 AS BIGINT) THEN 1
        |      ELSE 0 END AS churned
        |  FROM u CROSS JOIN ref)
        |SELECT quartile, count(*) AS n_users,
        |  CAST(sum(churned) AS BIGINT) AS n_churned,
        |  CAST(sum(n_events) AS BIGINT) AS tot_events,
        |  CAST(sum(churned) AS DOUBLE) / count(*) AS churn_rate
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rfm_segments" ->
      """WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS max_day FROM orders),
        |c AS (SELECT o_custkey, max_day,
        |    CAST(date_diff('day', max(CAST(o_orderdate AS DATE)), max_day)
        |      AS BIGINT) AS recency,
        |    count(*) AS freq,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS mon_cents
        |  FROM orders CROSS JOIN mx GROUP BY o_custkey, max_day),
        |s AS (SELECT *,
        |    CAST(ntile(5) OVER (ORDER BY recency, o_custkey) AS BIGINT) AS rq,
        |    CAST(ntile(5) OVER (ORDER BY freq, o_custkey) AS BIGINT) AS fq,
        |    CAST(ntile(5) OVER (ORDER BY mon_cents, o_custkey) AS BIGINT) AS mq
        |  FROM c)
        |SELECT rq, fq, mq, count(*) AS n_cust,
        |  CAST(sum(mon_cents) AS DOUBLE) / 100.0 / count(*) AS avg_monetary
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS mon,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |fm AS (SELECT o_custkey, min(mon) AS cohort_mon FROM o GROUP BY 1),
        |sz AS (SELECT cohort_mon, count(*) AS n_cust FROM fm GROUP BY 1),
        |aged AS (SELECT cohort_mon, o.mon - cohort_mon AS age,
        |    CAST(sum(cents) AS BIGINT) AS rev_cents
        |  FROM o JOIN fm ON o.o_custkey = fm.o_custkey GROUP BY 1, 2),
        |cum AS (SELECT cohort_mon, age,
        |    CAST(sum(rev_cents) OVER (PARTITION BY cohort_mon ORDER BY age
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_cents
        |  FROM aged)
        |SELECT cum.cohort_mon AS cohort_mon, age, n_cust,
        |  CAST(cum_cents // n_cust AS DOUBLE) / 100.0 AS ltv_per_cust
        |FROM cum JOIN sz ON cum.cohort_mon = sz.cohort_mon
        |ORDER BY cohort_mon, age""".stripMargin,
    "q_funnel_latency" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |v AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN us END)
        |    AS v_us FROM ev GROUP BY 1),
        |c AS (SELECT ev.user_id AS user_id, v_us,
        |    min(CASE WHEN event_type = 'click' AND us >= v_us THEN us END) AS c_us
        |  FROM ev JOIN v ON ev.user_id = v.user_id GROUP BY 1, 2),
        |p AS (SELECT ev.user_id AS user_id, v_us, c_us,
        |    min(CASE WHEN event_type = 'purchase' AND us >= c_us THEN us END)
        |      AS p_us
        |  FROM ev JOIN c ON ev.user_id = c.user_id GROUP BY 1, 2, 3),
        |d1 AS (SELECT c_us - v_us AS d FROM p WHERE c_us - v_us IS NOT NULL),
        |d2 AS (SELECT p_us - c_us AS d FROM p WHERE p_us - c_us IS NOT NULL),
        |s1 AS (SELECT 'view_to_click' AS step, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(d) AS DOUBLE) / count(*) AS mean_us,
        |    round(quantile_cont(d, 0.5), 2) AS p50_us,
        |    round(quantile_cont(d, 0.9), 2) AS p90_us FROM d1),
        |s2 AS (SELECT 'click_to_purchase' AS step,
        |    CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(d) AS DOUBLE) / count(*) AS mean_us,
        |    round(quantile_cont(d, 0.5), 2) AS p50_us,
        |    round(quantile_cont(d, 0.9), 2) AS p90_us FROM d2)
        |SELECT * FROM s1 UNION ALL SELECT * FROM s2 ORDER BY step""".stripMargin,
    "q_attribution" ->
      """WITH t AS (SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |      IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS channel
        |  FROM events)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
        |  round(sum(value), 2) AS attributed_value
        |FROM t WHERE event_type = 'purchase' AND channel IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_weighted_sample" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |    (CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |       AS BIGINT) % 1000000 AS DOUBLE) + 0.5) / 1000000.0 AS u
        |  FROM documents)
        |SELECT doc_id, n_chars, round(-ln(u) / n_chars, 10) AS priority
        |FROM d ORDER BY priority, doc_id LIMIT 30""".stripMargin,
    "q_equidepth_hist" ->
      """WITH cells AS (SELECT value, count(*) AS c FROM events GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
        |cum AS (SELECT value, c,
        |    CAST(sum(c) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum FROM cells)
        |SELECT (cum * 10 + n - 1) // n AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  min(value) AS lo, max(value) AS hi
        |FROM cum CROSS JOIN n
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cass_secondary_index" ->
      """WITH cells AS (SELECT CAST(user_id % 50 AS BIGINT) AS row_key, value,
        |  CAST(ts AS TIMESTAMP) AS write_ts, event_id AS generation,
        |  (event_type = 'error') AS tombstone FROM events),
        |lww AS (SELECT row_key, value AS latest_value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY row_key
        |    ORDER BY write_ts DESC, generation DESC) AS rn FROM cells)
        |  WHERE rn = 1 AND NOT tombstone)
        |SELECT CAST(floor(latest_value / 50) AS BIGINT) AS vbucket, row_key,
        |  round(latest_value, 4) AS latest_value
        |FROM lww WHERE CAST(floor(latest_value / 50) AS BIGINT) IN (0, 1)
        |ORDER BY vbucket, row_key""".stripMargin,
    "io_dynamic_overwrite" ->
      """WITH base AS (SELECT o_orderpriority AS pri,
        |    strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS mon,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    round(sum(o_totalprice), 2) AS sum_price
        |  FROM orders GROUP BY 1, 2),
        |fix AS (SELECT o_orderpriority AS pri,
        |    strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS mon,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    round(sum(o_totalprice), 2) AS sum_price
        |  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 1000
        |  GROUP BY 1, 2)
        |SELECT pri, mon, n_orders, sum_price FROM base WHERE pri <> '1-URGENT'
        |UNION ALL SELECT pri, mon, n_orders, sum_price FROM fix
        |ORDER BY pri, mon""".stripMargin,
    "stream_txn_feed" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders),
        |c AS (SELECT count(*) FILTER (d < DATE '1998-01-01') AS n_old,
        |             count(*) FILTER (d >= DATE '1998-01-01') AS n_new FROM o)
        |SELECT CAST(0 AS BIGINT) AS version, 'add' AS action,
        |  CAST(2 AS BIGINT) AS n_files, CAST(n_old AS BIGINT) AS n_rows FROM c
        |UNION ALL SELECT 1, 'add', 2, CAST(n_new AS BIGINT) FROM c
        |UNION ALL SELECT 2, 'add', 1, CAST(n_old AS BIGINT) FROM c
        |UNION ALL SELECT 2, 'remove', 2, 0 FROM c
        |ORDER BY version, action""".stripMargin,
    "io_txn_log" ->
      """WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
        |    CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT CAST(0 AS BIGINT) AS version, count(*) AS n_orders,
        |  CAST(sum(price_c) AS DOUBLE) / 100.0 AS total_price, max(d) AS last_date
        |FROM o WHERE d < DATE '1998-01-01'
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), count(*), CAST(sum(price_c) AS DOUBLE) / 100.0, max(d) FROM o
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(price_c) AS DOUBLE) / 100.0, max(d) FROM o
        |ORDER BY version""".stripMargin,
    "io_txn_vacuum" ->
      """WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
        |    CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT CAST(0 AS BIGINT) AS version, TRUE AS vacuumed,
        |  CAST(NULL AS BIGINT) AS n_orders, CAST(NULL AS DOUBLE) AS total_price,
        |  CAST(NULL AS DATE) AS last_date
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), TRUE, NULL, NULL, NULL
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), FALSE, count(*),
        |  CAST(sum(price_c) AS DOUBLE) / 100.0, max(d) FROM o
        |ORDER BY version""".stripMargin,
    "io_delete_vectors" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
        |FROM orders WHERE o_orderkey % 10 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "io_stats_prune_scan" ->
      s"""WITH $lpCte
         |SELECT l_returnflag, count(*) AS n_lines,
         |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
         |  CAST(sum(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0 AS revenue
         |FROM lp WHERE CAST(l_shipdate AS DATE)
         |  BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "graph_label_prop" -> graft.graph.GraphOps.labelPropOracleSql(),
    "graph_modularity" -> graft.graph.GraphOps.modularityOracleSql(),
    "graph_community_members" -> graft.graph.GraphOps.communityMembersOracleSql(),
    "graph_communities" -> graft.graph.GraphOps.communitiesOracleSql(),
    "q_interpolate_gaps" ->
      """WITH obs AS (SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    count(*) AS n
        |  FROM events WHERE event_id % 11 = 0 AND value > 130 GROUP BY 1, 2),
        |sp AS (SELECT event_type, unnest(range(min(day), max(day) + 1)) AS day
        |  FROM obs GROUP BY event_type),
        |g AS (SELECT s.event_type, s.day, o.n
        |  FROM sp s LEFT JOIN obs o USING (event_type, day)),
        |f AS (SELECT *,
        |    last_value(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS) OVER wp AS prev_day,
        |    last_value(n IGNORE NULLS) OVER wp AS prev_n,
        |    first_value(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS) OVER wn AS next_day,
        |    first_value(n IGNORE NULLS) OVER wn AS next_n
        |  FROM g WINDOW
        |    wp AS (PARTITION BY event_type ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wn AS (PARTITION BY event_type ORDER BY day
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, day, n,
        |  CAST(CASE WHEN n IS NOT NULL THEN n * 1000
        |    ELSE floor(1000.0 * ((next_day - day) * prev_n + (day - prev_day) * next_n)
        |         / (next_day - prev_day)) END AS BIGINT) AS filled_e3,
        |  n IS NULL AS is_interp
        |FROM f ORDER BY event_type, day""".stripMargin,
    "q_holt_forecast" ->
      """WITH RECURSIVE daily AS (SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    CAST(count(*) AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |ser AS (SELECT event_type, y,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM daily),
        |init AS (SELECT s1.event_type, s1.n, 1 AS i, s1.y AS l,
        |    CASE WHEN s1.n > 1 THEN s2.y - s1.y ELSE 0.0 END AS b
        |  FROM ser s1 LEFT JOIN ser s2
        |    ON s1.event_type = s2.event_type AND s2.i = 2
        |  WHERE s1.i = 1),
        |rec AS (SELECT event_type, n, i, l, b FROM init
        |  UNION ALL
        |  SELECT r.event_type, r.n, r.i + 1,
        |    0.5 * s.y + 0.5 * (r.l + r.b),
        |    0.5 * ((0.5 * s.y + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
        |  FROM rec r JOIN ser s ON s.event_type = r.event_type AND s.i = r.i + 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days, l AS level, b AS trend,
        |  l + 7.0 * b AS forecast_7d
        |FROM rec WHERE i = n ORDER BY event_type""".stripMargin,
    "q_did" ->
      """WITH c AS (SELECT
        |    CAST(user_id % 2 = 0 AS INT) AS tr,
        |    CAST(day(CAST(ts AS TIMESTAMP)) > 15 AS INT) AS po,
        |    CAST(round(value * 100) AS BIGINT) AS v_c
        |  FROM events),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN tr = 1 AND po = 0 THEN v_c ELSE 0 END) AS DOUBLE) /
        |      sum(CASE WHEN tr = 1 AND po = 0 THEN 1 ELSE 0 END) / 100.0 AS m_tp,
        |    CAST(sum(CASE WHEN tr = 1 AND po = 1 THEN v_c ELSE 0 END) AS DOUBLE) /
        |      sum(CASE WHEN tr = 1 AND po = 1 THEN 1 ELSE 0 END) / 100.0 AS m_tq,
        |    CAST(sum(CASE WHEN tr = 0 AND po = 0 THEN v_c ELSE 0 END) AS DOUBLE) /
        |      sum(CASE WHEN tr = 0 AND po = 0 THEN 1 ELSE 0 END) / 100.0 AS m_cp,
        |    CAST(sum(CASE WHEN tr = 0 AND po = 1 THEN v_c ELSE 0 END) AS DOUBLE) /
        |      sum(CASE WHEN tr = 0 AND po = 1 THEN 1 ELSE 0 END) / 100.0 AS m_cq
        |  FROM c)
        |SELECT round(m_tp, 4) AS treat_pre, round(m_tq, 4) AS treat_post,
        |  round(m_cp, 4) AS ctrl_pre, round(m_cq, 4) AS ctrl_post,
        |  round((m_tq - m_tp) - (m_cq - m_cp), 4) AS did
        |FROM m""".stripMargin,
    "sync_ring_rebalance" ->
      """WITH keys AS (SELECT user_id,
        |    (user_id * 1103515245) % 2147483647 AS kt
        |  FROM (SELECT DISTINCT user_id FROM events)),
        |r8 AS (SELECT CAST(n AS BIGINT) AS node,
        |    ((n * 16 + v) * 2654435761) % 2147483647 AS token
        |  FROM range(8) t(n), range(16) u(v)),
        |r9 AS (SELECT CAST(n AS BIGINT) AS node,
        |    ((n * 16 + v) * 2654435761) % 2147483647 AS token
        |  FROM range(9) t(n), range(16) u(v)),
        |pn8 AS (SELECT k.user_id, r.node,
        |    min((r.token - k.kt + 2147483647) % 2147483647) AS mind
        |  FROM keys k CROSS JOIN r8 r GROUP BY 1, 2),
        |p8 AS (SELECT user_id, node FROM (
        |  SELECT user_id, node,
        |    row_number() OVER (PARTITION BY user_id ORDER BY mind, node) AS rk
        |  FROM pn8) WHERE rk <= 3),
        |pn9 AS (SELECT k.user_id, r.node,
        |    min((r.token - k.kt + 2147483647) % 2147483647) AS mind
        |  FROM keys k CROSS JOIN r9 r GROUP BY 1, 2),
        |p9 AS (SELECT user_id, node FROM (
        |  SELECT user_id, node,
        |    row_number() OVER (PARTITION BY user_id ORDER BY mind, node) AS rk
        |  FROM pn9) WHERE rk <= 3),
        |g AS (SELECT a.node, count(*) AS keys_gained FROM p9 a
        |  WHERE NOT EXISTS (SELECT 1 FROM p8 b
        |    WHERE b.user_id = a.user_id AND b.node = a.node) GROUP BY 1),
        |l AS (SELECT b.node, count(*) AS keys_lost FROM p8 b
        |  WHERE NOT EXISTS (SELECT 1 FROM p9 a
        |    WHERE a.user_id = b.user_id AND a.node = b.node) GROUP BY 1),
        |nodes AS (SELECT CAST(n AS BIGINT) AS node FROM range(9) t(n))
        |SELECT nodes.node, CAST(COALESCE(keys_gained, 0) AS BIGINT) AS keys_gained,
        |  CAST(COALESCE(keys_lost, 0) AS BIGINT) AS keys_lost
        |FROM nodes LEFT JOIN g ON nodes.node = g.node
        |LEFT JOIN l ON nodes.node = l.node
        |ORDER BY nodes.node""".stripMargin,
    "cass_read_repair" ->
      """WITH ring AS (SELECT CAST(n AS BIGINT) AS node,
        |    ((n * 16 + v) * 2654435761) % 2147483647 AS token
        |  FROM range(8) t(n), range(16) u(v)),
        |cells AS (SELECT CAST(user_id % 50 AS BIGINT) AS row_key,
        |    CAST(ts AS TIMESTAMP) AS write_ts, event_id AS generation FROM events),
        |keys AS (SELECT DISTINCT row_key, (row_key * 1103515245) % 2147483647 AS kt
        |  FROM cells),
        |pn AS (SELECT k.row_key, r.node,
        |    min((r.token - k.kt + 2147483647) % 2147483647) AS mind
        |  FROM keys k CROSS JOIN ring r GROUP BY 1, 2),
        |rk AS (SELECT row_key, node,
        |    row_number() OVER (PARTITION BY row_key ORDER BY mind, node) AS rk
        |  FROM pn),
        |rep AS (SELECT * FROM rk WHERE rk <= 3),
        |heads AS (SELECT row_key, rk, write_ts AS head_ts, generation AS head_gen FROM (
        |    SELECT c.row_key, r.rk, c.write_ts, c.generation,
        |      row_number() OVER (PARTITION BY c.row_key, r.rk
        |        ORDER BY c.write_ts DESC, c.generation DESC) AS rn
        |    FROM cells c JOIN rep r USING (row_key)
        |    WHERE (c.generation + r.rk) % 5 <> 0)
        |  WHERE rn = 1),
        |win AS (SELECT row_key, head_gen AS win_gen FROM (
        |    SELECT row_key, head_gen, row_number() OVER (PARTITION BY row_key
        |      ORDER BY head_ts DESC, head_gen DESC) AS wn FROM heads) WHERE wn = 1)
        |SELECT rep.node, count(*) AS n_replica_keys,
        |  CAST(sum(CASE WHEN h.head_gen IS NULL OR h.head_gen <> w.win_gen
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
        |  CAST(sum(CASE WHEN h.head_gen = w.win_gen THEN 1 ELSE 0 END) AS BIGINT) AS n_current
        |FROM rep
        |LEFT JOIN heads h ON rep.row_key = h.row_key AND rep.rk = h.rk
        |JOIN win w ON rep.row_key = w.row_key
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sync_leveled_compaction" ->
      s"""WITH $invCte, $durCte,
         |r AS (SELECT cf, size_bytes,
         |    row_number() OVER (PARTITION BY cf ORDER BY generation DESC, path) AS rn
         |  FROM dur),
         |lv AS (SELECT cf, size_bytes,
         |    CAST(least(length(CAST(rn AS VARCHAR)) - 1, 3) AS BIGINT) AS level,
         |    CAST(CASE least(length(CAST(rn AS VARCHAR)) - 1, 3)
         |      WHEN 0 THEN 4 WHEN 1 THEN 40 WHEN 2 THEN 400 ELSE 4000 END AS BIGINT) AS capacity
         |  FROM r)
         |SELECT cf, level, count(*) AS n_files,
         |  CAST(sum(size_bytes) AS BIGINT) AS total_bytes, capacity,
         |  greatest(count(*) - capacity, 0) AS overflow,
         |  count(*) > capacity AS over_target
         |FROM lv GROUP BY cf, level, capacity
         |ORDER BY cf, level""".stripMargin,
    "sync_hinted_handoff" ->
      """WITH ring AS (SELECT CAST(n AS BIGINT) AS node,
        |    ((n * 16 + v) * 2654435761) % 2147483647 AS token
        |  FROM range(8) t(n), range(16) u(v)),
        |keys AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    (user_id * 1103515245) % 2147483647 AS kt
        |  FROM events GROUP BY 1),
        |pn AS (SELECT k.user_id, k.n_events, r.node,
        |    min((r.token - k.kt + 2147483647) % 2147483647) AS mind
        |  FROM keys k CROSS JOIN ring r GROUP BY 1, 2, 3),
        |rk AS (SELECT user_id, n_events, node,
        |    row_number() OVER (PARTITION BY user_id ORDER BY mind, node) AS rk
        |  FROM pn),
        |rep AS (SELECT * FROM rk WHERE rk <= 3),
        |aff AS (SELECT user_id, n_events,
        |    max(CASE WHEN node = 3 THEN 1 ELSE 0 END) AS affected,
        |    arg_min(node, CASE WHEN node <> 3 THEN rk END) AS live_node
        |  FROM rep GROUP BY 1, 2)
        |SELECT live_node AS node, CAST(count(*) AS BIGINT) AS n_hints,
        |  CAST(sum(n_events) AS BIGINT) AS hinted_events
        |FROM aff WHERE affected = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dataset_drift" ->
      """WITH b AS (SELECT (min(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
        |    + max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) + 1) // 2
        |    AS mid FROM events),
        |cells AS (SELECT event_type,
        |    CASE WHEN date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      < (SELECT mid FROM b) THEN 'a' ELSE 'b' END AS half,
        |    CAST(floor(value / 50) AS BIGINT) AS bin, count(*) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |tot AS (SELECT event_type, half, CAST(sum(c) AS BIGINT) AS n
        |  FROM cells GROUP BY 1, 2),
        |p AS (SELECT cells.event_type, cells.half, cells.bin,
        |    CAST(c AS DOUBLE) / n AS p, n
        |  FROM cells JOIN tot USING (event_type, half)),
        |wide AS (SELECT event_type, bin,
        |    max(CASE WHEN half = 'a' THEN p END) AS pa,
        |    max(CASE WHEN half = 'a' THEN n END) AS na,
        |    max(CASE WHEN half = 'b' THEN p END) AS pb,
        |    max(CASE WHEN half = 'b' THEN n END) AS nb
        |  FROM p GROUP BY 1, 2)
        |SELECT event_type, max(na) AS n_a, max(nb) AS n_b,
        |  round(sum(CASE WHEN pa IS NOT NULL AND pb IS NOT NULL
        |    THEN (pa - pb) * ln(pa / pb) ELSE 0.0 END), 4) AS psi,
        |  CAST(sum(CASE WHEN pa IS NULL OR pb IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dropped_bins
        |FROM wide GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_forecast_backtest" ->
      """WITH RECURSIVE daily AS (SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    CAST(count(*) AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |ser AS (SELECT event_type, y,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM daily),
        |init AS (SELECT s1.event_type, s1.n, 1 AS i, s1.y AS l,
        |    CASE WHEN s1.n > 1 THEN s2.y - s1.y ELSE 0.0 END AS b
        |  FROM ser s1 LEFT JOIN ser s2
        |    ON s1.event_type = s2.event_type AND s2.i = 2
        |  WHERE s1.i = 1),
        |rec AS (SELECT event_type, n, i, l, b FROM init
        |  UNION ALL
        |  SELECT r.event_type, r.n, r.i + 1,
        |    0.5 * s.y + 0.5 * (r.l + r.b),
        |    0.5 * ((0.5 * s.y + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
        |  FROM rec r JOIN ser s ON s.event_type = r.event_type AND s.i = r.i + 1)
        |SELECT r.event_type, CAST(r.i AS BIGINT) AS step,
        |  CAST(s.y AS BIGINT) AS actual,
        |  round(r.l + r.b, 6) AS forecast,
        |  round(abs(s.y - (r.l + r.b)), 6) AS abs_err
        |FROM rec r JOIN ser s ON s.event_type = r.event_type AND s.i = r.i + 1
        |WHERE r.i >= r.n - 7 AND r.i <= r.n - 1
        |ORDER BY r.event_type, step""".stripMargin,
    "q_ab_cuped" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(CASE WHEN day(CAST(ts AS TIMESTAMP)) <= 15
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x_c,
        |    CAST(sum(CASE WHEN day(CAST(ts AS TIMESTAMP)) > 15
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y_c
        |  FROM events GROUP BY 1),
        |tot AS (SELECT count(*) AS n, sum(x_c) AS sx, sum(y_c) AS sy,
        |    sum(x_c * y_c) AS sxy, sum(x_c * x_c) AS sxx FROM u),
        |th AS (SELECT
        |    CASE WHEN CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n = 0.0 THEN 0.0
        |    ELSE (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) /
        |      (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
        |    END AS theta,
        |    CAST(sx AS DOUBLE) / n AS mx FROM tot),
        |g AS (SELECT CAST(user_id % 2 AS BIGINT) AS variant, count(*) AS n_users,
        |    sum(x_c) AS gx, sum(y_c) AS gy, sum(x_c * x_c) AS gxx,
        |    sum(x_c * y_c) AS gxy, sum(y_c * y_c) AS gyy
        |  FROM u GROUP BY 1)
        |SELECT variant, n_users,
        |  CAST(gy AS DOUBLE) / n_users / 100.0 AS mean_post,
        |  (CAST(gy AS DOUBLE) - theta *
        |    (CAST(gx AS DOUBLE) - n_users * mx)) / n_users / 100.0 AS mean_cuped,
        |  CASE WHEN CAST(gyy AS DOUBLE) - CAST(gy AS DOUBLE) * gy / n_users = 0.0 THEN 0.0
        |  ELSE round(100.0 * (1.0 -
        |    (CAST(gyy AS DOUBLE) - 2.0 * theta * gxy + theta * theta * gxx -
        |      (CAST(gy AS DOUBLE) - theta * gx) *
        |      (CAST(gy AS DOUBLE) - theta * gx) / n_users) /
        |    (CAST(gyy AS DOUBLE) - CAST(gy AS DOUBLE) * gy / n_users)), 4)
        |  END AS var_reduction_pct
        |FROM g, th ORDER BY variant""".stripMargin,
    "q_power_analysis" ->
      """WITH s AS (SELECT event_type, count(*) AS n_obs,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS sv,
        |    sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) AS svv
        |  FROM events GROUP BY 1),
        |m AS (SELECT event_type, n_obs,
        |    CAST(sv AS DOUBLE) / n_obs AS mean_c,
        |    (CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * sv / n_obs) / (n_obs - 1) AS var_c
        |  FROM s)
        |SELECT event_type, n_obs,
        |  round(mean_c / 100.0, 4) AS mean_value,
        |  round(sqrt(var_c) / 100.0, 4) AS sd_value,
        |  CAST(ceil(2.0 * var_c * 7.848879734349088 /
        |    ((0.05 * mean_c) * (0.05 * mean_c))) AS BIGINT) AS n_per_arm
        |FROM m ORDER BY event_type""".stripMargin,
    "q_ttest_ab" ->
      """WITH s AS (SELECT event_type,
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS grp,
        |    CAST(count(*) AS BIGINT) AS n, sum(value) AS sy,
        |    sum(value * value) AS syy
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT *, sy / n AS mm,
        |    (syy - sy * sy / n) / (n - 1) AS v FROM s)
        |SELECT event_type,
        |  max(CASE WHEN grp = 'a' THEN n END) AS n_a,
        |  max(CASE WHEN grp = 'b' THEN n END) AS n_b,
        |  round(max(CASE WHEN grp = 'a' THEN mm END), 4) AS mean_a,
        |  round(max(CASE WHEN grp = 'b' THEN mm END), 4) AS mean_b,
        |  round((max(CASE WHEN grp = 'a' THEN mm END)
        |      - max(CASE WHEN grp = 'b' THEN mm END))
        |    / sqrt(max(CASE WHEN grp = 'a' THEN v END)
        |        / max(CASE WHEN grp = 'a' THEN n END)
        |      + max(CASE WHEN grp = 'b' THEN v END)
        |        / max(CASE WHEN grp = 'b' THEN n END)), 4) AS t
        |FROM m GROUP BY 1
        |HAVING max(CASE WHEN grp = 'a' THEN n END) > 1
        |  AND max(CASE WHEN grp = 'b' THEN n END) > 1
        |ORDER BY 1""".stripMargin,
    "q_gini" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |r AS (SELECT x, row_number() OVER (ORDER BY x, user_id) AS rn FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(x) AS BIGINT) AS total_events,
        |  round(2.0 * sum(rn * x) / (count(*) * sum(x))
        |    - CAST(count(*) + 1 AS DOUBLE) / count(*), 4) AS gini
        |FROM r""".stripMargin,
    "q_survival_curve" ->
      """WITH u AS (SELECT user_id,
        |    min(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS d0,
        |    max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS d1,
        |    min(CASE WHEN event_type = 'error'
        |      THEN date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) END)
        |      AS e0
        |  FROM events GROUP BY 1),
        |obs AS (SELECT CAST(coalesce(e0 - d0, d1 - d0) AS BIGINT) AS t,
        |    CASE WHEN e0 IS NOT NULL THEN 1 ELSE 0 END AS churned
        |  FROM u),
        |byt AS (SELECT t, CAST(count(*) AS BIGINT) AS n_at,
        |    CAST(sum(churned) AS BIGINT) AS d FROM obs GROUP BY 1),
        |risk AS (SELECT *, CAST(sum(n_at) OVER (ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_risk FROM byt),
        |haz AS (SELECT *, sum(CAST(d AS DOUBLE) / n_risk) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h
        |  FROM risk WHERE d > 0)
        |SELECT t AS t_days, n_risk, d AS n_churn,
        |  round(h, 4) AS cum_hazard, round(exp(-h), 4) AS survival
        |FROM haz ORDER BY t_days""".stripMargin,
    "q_ucb_arms" ->
      """WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS big_n FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value) / count(*), 4) AS mean_reward,
        |  round(sum(value) / count(*)
        |    + sqrt(2.0 * ln(CAST(big_n AS DOUBLE)) / count(*)), 4) AS ucb1
        |FROM events CROSS JOIN tot
        |GROUP BY event_type, big_n ORDER BY event_type""".stripMargin,
    "io_shard_balance" ->
      """WITH r AS (SELECT doc_id, n_chars,
        |    (row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1) % 16
        |      AS shard FROM documents)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "sync_replica_sets" ->
      """WITH ring AS (SELECT CAST(n AS BIGINT) AS node,
        |    ((n * 16 + v) * 2654435761) % 2147483647 AS token
        |  FROM range(8) t(n), range(16) u(v)),
        |keys AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    (user_id * 1103515245) % 2147483647 AS kt
        |  FROM events GROUP BY 1),
        |pn AS (SELECT k.user_id, k.n_events, r.node,
        |    min((r.token - k.kt + 2147483647) % 2147483647) AS mind
        |  FROM keys k CROSS JOIN ring r GROUP BY 1, 2, 3),
        |rk AS (SELECT user_id, n_events, node,
        |    row_number() OVER (PARTITION BY user_id ORDER BY mind, node) AS rk
        |  FROM pn)
        |SELECT node, CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_primary,
        |  CAST(count(*) AS BIGINT) AS n_replica,
        |  CAST(sum(CASE WHEN rk = 1 THEN n_events ELSE 0 END) AS BIGINT)
        |    AS primary_events
        |FROM rk WHERE rk <= 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sync_token_ring" ->
      """WITH ring AS (SELECT CAST(n AS BIGINT) AS node,
        |    ((n * 16 + v) * 2654435761) % 2147483647 AS token
        |  FROM range(8) t(n), range(16) u(v)),
        |keys AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    (user_id * 1103515245) % 2147483647 AS kt
        |  FROM events GROUP BY 1),
        |owner AS (SELECT k.user_id, k.n_events,
        |    arg_min(r.node, (r.token - k.kt + 2147483647) % 2147483647) AS node
        |  FROM keys k CROSS JOIN ring r GROUP BY 1, 2)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(n_events) AS BIGINT) AS n_events
        |FROM owner GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_zipf_fit" ->
      """WITH tok AS (SELECT lang,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token FROM documents),
        |tf AS (SELECT lang, token, count(*) AS freq FROM tok GROUP BY 1, 2),
        |rk AS (SELECT lang, token, freq,
        |  row_number() OVER (PARTITION BY lang ORDER BY freq DESC, token) AS rnk FROM tf),
        |f AS (SELECT lang, ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
        |  FROM rk WHERE rnk <= 200)
        |SELECT lang, count(*) AS n_fit,
        |  round((CAST(count(*) AS DOUBLE) * sum(x * y) - sum(x) * sum(y))
        |    / (CAST(count(*) AS DOUBLE) * sum(x * x) - sum(x) * sum(x)), 4) + 0.0 AS zipf_slope
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bloom_prefilter" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "stream_session_window" -> sessionWindowSql,
    "q_session_window" -> sessionWindowSql,
    "q_correlated_agg" ->
      """WITH w AS (SELECT o_orderpriority, o_totalprice,
        |  avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg FROM orders)
        |SELECT o_orderpriority, count(*) AS n_above_avg,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS above_total
        |FROM w WHERE o_totalprice > cust_avg
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "sync_path_parse" ->
      s"""WITH $invCte,
         |parsed AS (SELECT cf, node_id, generation, is_temp, path,
         |  regexp_extract(path, '^ks1/([a-z]+)/', 1) AS cf_parsed,
         |  CAST(regexp_extract(path, '/node([0-9]+)/', 1) AS BIGINT) AS node_parsed,
         |  CAST(regexp_extract(path, '/na-([0-9]+)', 1) AS BIGINT) AS gen_parsed,
         |  contains(path, '-tmp-') AS temp_parsed FROM inv)
         |SELECT cf, count(*) AS n_paths,
         |  CAST(sum(CASE WHEN cf_parsed = cf AND node_parsed = node_id
         |    AND gen_parsed = generation AND temp_parsed = is_temp
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok
         |FROM parsed GROUP BY cf ORDER BY cf""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT) AS bucket,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS bucket_total
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_cube" ->
      """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
        |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_sample_hash" ->
      """SELECT l_returnflag, count(*) AS n_sampled, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '1a'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_sample_stratified" ->
      """SELECT l_returnflag, count(*) AS n_sampled, sum(l_quantity) AS sum_qty
        |FROM (SELECT *, substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 2) AS h
        |      FROM lineitem)
        |WHERE CASE l_returnflag WHEN 'A' THEN h < '1a' WHEN 'N' THEN h < '05' ELSE h < '0d' END
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_set_ops" ->
      """SELECT custkey FROM (
        |  (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |   INTERSECT
        |   SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000)
        |  EXCEPT
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY custkey""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderpriority, count(*) AS n_big,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS big_total
        |FROM orders
        |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_window_running" ->
      s"""WITH $lpCte, base AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    CAST(l_shipdate AS DATE) AS ship_date,
        |    price_c * (100 - disc_c) AS net_e4
        |  FROM lp WHERE l_suppkey <= 5)
        |SELECT l_suppkey,
        |  CAST(row_number() OVER (PARTITION BY l_suppkey ORDER BY ship_date, l_orderkey, l_linenumber) AS BIGINT) AS rn,
        |  ship_date, net_e4,
        |  CAST(sum(net_e4) OVER (PARTITION BY l_suppkey ORDER BY ship_date, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_net_e4
        |FROM base ORDER BY l_suppkey, rn""".stripMargin,
    "q_window_topn" ->
      s"""WITH $lpCte, rev AS (
        |  SELECT p_brand, p_partkey,
        |    CAST(sum(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0 AS revenue
        |  FROM lp JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_partkey)
        |SELECT p_brand, p_partkey, revenue, rnk FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS BIGINT) AS rnk
        |  FROM rev) WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,
    "q_window_lag" ->
      """WITH base AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date
        |  FROM orders WHERE o_custkey <= 100)
        |SELECT o_custkey, o_orderkey, order_date,
        |  lag(order_date, 1) OVER w AS prev_date,
        |  CAST(date_diff('day', lag(order_date, 1) OVER w, order_date) AS BIGINT) AS gap_days
        |FROM base WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey)
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    "q_zscore_outliers" ->
      """WITH stats AS (SELECT event_type, avg(value) AS mean_v, stddev(value) AS sd_v
        |  FROM events GROUP BY event_type),
        |z AS (SELECT e.event_type, abs((value - mean_v) / sd_v) AS absz
        |  FROM events e JOIN stats s ON e.event_type = s.event_type)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN absz > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(max(absz), 4) AS max_abs_z
        |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_rolling_retention_matrix" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    date_trunc('week', CAST(ts AS TIMESTAMP)) AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id),
        |m AS (SELECT cohort_week,
        |    CAST(floor(date_diff('day', cohort_week, week) / 7.0) AS BIGINT) AS week_offset,
        |    count(*) AS n_users
        |  FROM uw JOIN f USING (user_id) GROUP BY 1, 2)
        |SELECT m.cohort_week, m.week_offset, m.n_users,
        |  CAST(m.n_users AS DOUBLE) / c.cohort_size AS retained_share
        |FROM m JOIN (SELECT cohort_week, n_users AS cohort_size FROM m
        |  WHERE week_offset = 0) c USING (cohort_week)
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_retention_cohort" ->
      """WITH first_day AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |  FROM events GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, active_day) AS BIGINT) AS day_offset,
        |  count(DISTINCT a.user_id) AS n_active
        |FROM active a JOIN first_day f ON a.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "q_funnel" ->
      """WITH v AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS v_ts
        |  FROM events GROUP BY user_id),
        |c AS (SELECT e.user_id, v_ts,
        |    min(CASE WHEN event_type = 'click' AND CAST(ts AS TIMESTAMP) >= v_ts
        |        THEN CAST(ts AS TIMESTAMP) END) AS c_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id GROUP BY e.user_id, v_ts),
        |p AS (SELECT e.user_id, v_ts, c_ts,
        |    min(CASE WHEN event_type = 'purchase' AND CAST(ts AS TIMESTAMP) >= c_ts
        |        THEN CAST(ts AS TIMESTAMP) END) AS p_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id GROUP BY e.user_id, v_ts, c_ts)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN v_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
        |  CAST(sum(CASE WHEN c_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
        |  CAST(sum(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased_after_click
        |FROM p""".stripMargin,
    "q_moving_window" ->
      s"""WITH $lpCte, daily AS (
         |  SELECT l_suppkey,
         |    CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS epoch_day,
         |    CAST(sum(price_c * (100 - disc_c)) AS BIGINT) AS day_e4
         |  FROM lp WHERE l_suppkey <= 5 GROUP BY 1, 2)
         |SELECT l_suppkey, epoch_day, day_e4,
         |  CAST(sum(day_e4) OVER (PARTITION BY l_suppkey ORDER BY epoch_day
         |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS move7_e4
         |FROM daily ORDER BY l_suppkey, epoch_day""".stripMargin,
    "q_upsert_merge" ->
      """WITH cur AS (SELECT c_custkey AS key, c_mktsegment AS segment,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer),
        |upd AS (
        |  SELECT c_custkey AS key, 'UPDATED' AS segment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) + 100000 AS bal_c
        |  FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000 AS key, 'INSERTED' AS segment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer WHERE c_custkey % 13 = 0),
        |merged AS (SELECT COALESCE(u.key, c.key) AS key,
        |  COALESCE(u.segment, c.segment) AS segment,
        |  COALESCE(u.bal_c, c.bal_c) AS bal_c
        |  FROM cur c FULL OUTER JOIN upd u ON c.key = u.key)
        |SELECT segment, count(*) AS n_rows,
        |  CAST(sum(bal_c) AS DOUBLE) / 100.0 AS total_bal
        |FROM merged GROUP BY segment ORDER BY segment""".stripMargin,
    "q_rank_family" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders WHERE o_custkey <= 50
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged),
        |per_sess AS (
        |  SELECT user_id, session_id, count(*) AS n_events,
        |    epoch_us(CAST(max(ts) AS TIMESTAMP)) - epoch_us(CAST(min(ts) AS TIMESTAMP)) AS duration_us,
        |    round(sum(value), 2) AS session_value
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(n_events) AS BIGINT) AS n_events,
        |  CAST(max(duration_us) AS BIGINT) AS max_duration_us,
        |  round(sum(session_value), 2) AS total_value
        |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(lower(text)) AS digest, count(*) AS n_docs, min(doc_id) AS keeper_doc_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_exact_survivors" ->
      """SELECT doc_id, digest FROM (
        |  SELECT doc_id, md5(lower(text)) AS digest,
        |    min(doc_id) OVER (PARTITION BY md5(lower(text))) AS keeper
        |  FROM documents) WHERE doc_id = keeper ORDER BY doc_id""".stripMargin,
    "dedup_minhash_lsh" -> Dedup.minhashLshOracleSql,
    "dedup_minhash_by_lang" -> Dedup.minhashByLangOracleSql,
    "dedup_pipeline_verified" -> Dedup.pipelineVerifiedOracleSql,
    "dedup_incremental" -> Dedup.incrementalOracleSql(),
    "stream_dedup_incremental" -> Dedup.incrementalStreamOracleSql(),
    "dedup_substring" -> Dedup.dedupSubstringOracleSql(),
    "dedup_semantic" -> Ann.dedupSemanticOracleSql(),
    "dedup_ngram_jaccard" ->
      """WITH reps AS (SELECT min(doc_id) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS n_copies, lang,
        |  n_chars, text FROM documents GROUP BY text, lang, n_chars),
        |t AS (SELECT doc_id, lang, n_chars, n_copies,
        |  string_split_regex(trim(lower(text)), '\s+') AS toks FROM reps),
        |d AS (SELECT doc_id, lang, n_copies,
        |  CAST(floor(n_chars / 100) AS BIGINT) AS len_band,
        |  list_distinct(toks) AS tokset FROM t)
        |SELECT doc_a, doc_b, jaccard, n_doc_pairs FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    round(CAST(len(list_filter(a.tokset, x -> list_contains(b.tokset, x))) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(a.tokset, b.tokset))) AS DOUBLE), 4) AS jaccard,
        |    a.n_copies * b.n_copies AS n_doc_pairs
        |  FROM d a JOIN d b ON a.lang = b.lang AND a.len_band = b.len_band
        |    AND a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_threshold_sweep" ->
      """WITH reps AS (SELECT min(doc_id) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS n_copies, lang,
        |  n_chars, text FROM documents GROUP BY text, lang, n_chars),
        |t AS (SELECT doc_id, lang, n_chars, n_copies,
        |  string_split_regex(trim(lower(text)), '\s+') AS toks FROM reps),
        |d AS (SELECT doc_id, lang, n_copies,
        |  CAST(floor(n_chars / 100) AS BIGINT) AS len_band,
        |  list_distinct(toks) AS tokset FROM t),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.n_copies AS na, b.n_copies AS nb,
        |    round(CAST(len(list_filter(a.tokset, x -> list_contains(b.tokset, x))) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(a.tokset, b.tokset))) AS DOUBLE), 4) AS jaccard
        |  FROM d a JOIN d b ON a.lang = b.lang AND a.len_band = b.len_band
        |    AND a.doc_id < b.doc_id),
        |th AS (SELECT * FROM (VALUES (0.5), (0.7), (0.8), (0.9)) t(threshold)),
        |f AS (SELECT threshold, doc_a, doc_b, na, nb FROM p CROSS JOIN th
        |  WHERE jaccard >= threshold),
        |np AS (SELECT threshold, CAST(sum(na * nb) AS BIGINT) AS cross_pairs
        |  FROM f GROUP BY 1),
        |ip AS (SELECT CAST(coalesce(sum(n_copies * (n_copies - 1) // 2), 0) AS BIGINT)
        |  AS int_pairs FROM d WHERE n_copies > 1),
        |inv AS (SELECT threshold, doc_id, max(n) AS n FROM (
        |    SELECT threshold, doc_a AS doc_id, na AS n FROM f
        |    UNION ALL SELECT threshold, doc_b, nb FROM f
        |    UNION ALL SELECT th.threshold, d.doc_id, d.n_copies
        |      FROM d CROSS JOIN th WHERE d.n_copies > 1)
        |  GROUP BY 1, 2),
        |nd AS (SELECT threshold, CAST(sum(n) AS BIGINT) AS n_dup_docs
        |  FROM inv GROUP BY 1)
        |SELECT th.threshold AS threshold,
        |  coalesce(np.cross_pairs, 0) + ip.int_pairs AS n_pairs,
        |  coalesce(nd.n_dup_docs, 0) AS n_dup_docs
        |FROM th CROSS JOIN ip LEFT JOIN np USING (threshold)
        |LEFT JOIN nd USING (threshold)
        |ORDER BY threshold""".stripMargin,
    "text_quality_sweep" ->
      s"""WITH $toksCte,
         |m AS (SELECT round((1.0 - CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS DOUBLE)
         |    / CAST(len(toks) AS DOUBLE))
         |    * least(1.0, CAST(len(toks) AS DOUBLE) / 50.0), 4) AS q FROM t),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM m),
         |th AS (SELECT * FROM (VALUES (0.3), (0.5), (0.7), (0.9)) t(threshold)),
         |np AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_pass
         |  FROM m CROSS JOIN th WHERE q >= threshold GROUP BY 1)
         |SELECT th.threshold AS threshold, coalesce(np.n_pass, 0) AS n_pass,
         |  round(coalesce(np.n_pass, 0) / (SELECT total FROM tot) * 100, 2) AS pct_pass
         |FROM th LEFT JOIN np USING (threshold) ORDER BY threshold""".stripMargin,
    "corpus_lang_weights" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
        |  CAST(count(*) AS BIGINT) AS n_langs FROM c)
        |SELECT lang, n_docs,
        |  CAST(n_docs AS DOUBLE) / total AS share,
        |  least(3.0, (1.0 / n_langs) / (CAST(n_docs AS DOUBLE) / total))
        |    AS weight,
        |  CAST(round(n_docs * least(3.0,
        |    (1.0 / n_langs) / (CAST(n_docs AS DOUBLE) / total))) AS BIGINT)
        |    AS expected_docs
        |FROM c CROSS JOIN tot ORDER BY lang""".stripMargin,
    "dedup_simhash" -> Dedup.simhashOracleSql,
    "dedup_embedding_cos" ->
      s"""WITH $embCte,
         |${Ann.derivedPlanesCteSql},
         |eb AS (SELECT vec_id, v,
         |  ${Ann.signBucketSql("v")} AS bucket FROM e, pp)
         |SELECT vec_a, vec_b, bucket, cos FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
         |    round(list_cosine_similarity(a.v, b.v), 4) + 0.0 AS cos
         |  FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |WHERE cos >= 0.35 ORDER BY vec_a, vec_b""".stripMargin,

    "ann_bruteforce_topk" ->
      s"""WITH $embCte,
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
         |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 5),
         |s AS (SELECT q_id, vec_id,
         |  round(list_cosine_similarity(qv, v), 4) + 0.0 AS cos FROM c CROSS JOIN q)
         |SELECT q_id, vec_id, cos, rnk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         |  FROM s) WHERE rnk <= 10 ORDER BY q_id, rnk""".stripMargin,
    "ann_lsh_topk" ->
      s"""WITH $embCte,
         |${Ann.derivedPlanesCteSql},
         |eb AS (SELECT vec_id, label, v,
         |  ${Ann.signBucketSql("v")} AS bucket FROM e, pp),
         |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM eb WHERE vec_id < 5),
         |c AS (SELECT vec_id, v, bucket FROM eb WHERE vec_id >= 5),
         |s AS (SELECT q_id, c.vec_id, c.bucket,
         |  round(list_cosine_similarity(qv, v), 4) + 0.0 AS cos
         |  FROM c JOIN q ON c.bucket = q.bucket)
         |SELECT q_id, vec_id, bucket, cos, rnk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         |  FROM s) WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "ann_lsh_multiprobe" ->
      s"""WITH $embCte,
         |${Ann.derivedPlanesCteSql},
         |eb AS (SELECT vec_id, v, ${Ann.signBucketSql("v")} AS bucket FROM e, pp),
         |q AS (SELECT vec_id AS q_id, v AS qv,
         |  unnest(list_transform(range(0, p + 1), j -> CASE WHEN j = 0 THEN bucket
         |    ELSE substr(bucket, 1, CAST(j - 1 AS INT)) ||
         |      (CASE WHEN substr(bucket, CAST(j AS INT), 1) = '1' THEN '0' ELSE '1' END) ||
         |      substr(bucket, CAST(j + 1 AS INT), p) END)) AS bucket
         |  FROM eb, pp WHERE vec_id < 5),
         |c AS (SELECT vec_id, v, bucket FROM eb WHERE vec_id >= 5),
         |s AS (SELECT q_id, c.vec_id,
         |  round(list_cosine_similarity(qv, v), 4) + 0.0 AS cos
         |  FROM c JOIN q ON c.bucket = q.bucket)
         |SELECT q_id, vec_id, cos, rnk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         |  FROM s) WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "vec_norms" ->
      s"""WITH $embCte
         |SELECT vec_id, label, CAST(len(v) AS BIGINT) AS dim,
         |  round(sqrt(list_sum(list_transform(v, x -> x * x))), 4) + 0.0 AS l2_norm,
         |  round(list_sum(v) / len(v), 4) + 0.0 AS mean,
         |  round(list_aggregate(v, 'min'), 4) + 0.0 AS vmin,
         |  round(list_aggregate(v, 'max'), 4) + 0.0 AS vmax
         |FROM e ORDER BY vec_id""".stripMargin,

    "text_tokens" ->
      s"""WITH $toksCte
         |SELECT doc_id, lang,
         |  CAST(len(toks) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(string_split_regex(trim(text), '[a-zA-Z]+')) - 1 AS BIGINT) AS n_word_splits,
         |  CAST(length(text) AS BIGINT) AS len_chars, n_chars
         |FROM t ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH $toksCte,
         |m AS (SELECT doc_id, lang,
         |  CAST(length(text) AS DOUBLE) AS lenc,
         |  CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) AS nspace,
         |  CAST(len(toks) AS DOUBLE) AS ntoks,
         |  CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS DOUBLE) AS stophits
         |  FROM t)
         |SELECT doc_id, lang, CAST(lenc AS BIGINT) AS len_chars,
         |  CAST(ntoks AS BIGINT) AS n_tokens,
         |  round((lenc - nspace) / ntoks, 4) AS mean_token_len,
         |  round(nspace / lenc, 4) AS space_ratio,
         |  round(stophits / ntoks, 4) AS stopword_ratio,
         |  round((1.0 - stophits / ntoks) * least(1.0, ntoks / 50.0), 4) AS quality_score
         |FROM m ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""WITH $toksCte,
         |h AS (SELECT doc_id, lang,
         |  CAST(len(list_filter(toks, x -> x='the' OR x='a' OR x='of' OR x='and' OR x='is')) AS BIGINT) AS en_hits,
         |  CAST(len(list_filter(toks, x -> x='der' OR x='die' OR x='das' OR x='und' OR x='ist')) AS BIGINT) AS de_hits,
         |  CAST(len(list_filter(toks, x -> x='el' OR x='la' OR x='los' OR x='y' OR x='es')) AS BIGINT) AS es_hits,
         |  CAST(len(list_filter(toks, x -> x='le' OR x='la' OR x='les' OR x='et' OR x='est')) AS BIGINT) AS fr_hits
         |  FROM t)
         |SELECT doc_id, lang, en_hits, de_hits, es_hits, fr_hits,
         |  CASE WHEN greatest(en_hits, de_hits, es_hits, fr_hits) = 0 THEN 'und'
         |       WHEN en_hits >= greatest(de_hits, es_hits, fr_hits) THEN 'en'
         |       WHEN de_hits >= greatest(es_hits, fr_hits) THEN 'de'
         |       WHEN es_hits >= fr_hits THEN 'es' ELSE 'fr' END AS predicted_lang
         |FROM h ORDER BY doc_id""".stripMargin,
    "text_line_dedup" ->
      """WITH segs AS (SELECT doc_id, md5(seg) AS seg_hash FROM (
        |    SELECT doc_id, trim(lower(unnest(string_split(text, '.')))) AS seg
        |    FROM documents) WHERE length(seg) > 0),
        |freq AS (SELECT seg_hash, count(*) AS n_docs_with FROM (
        |    SELECT DISTINCT doc_id, seg_hash FROM segs) GROUP BY 1)
        |SELECT doc_id, count(*) AS n_segments,
        |  CAST(sum(CASE WHEN n_docs_with >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boilerplate,
        |  CAST(count(*) - sum(CASE WHEN n_docs_with >= 3 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) AS keep_ratio
        |FROM segs JOIN freq USING (seg_hash)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_incremental_reagg" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_e4
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_decile_report" ->
      """WITH pc AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1),
        |d AS (SELECT rev_c,
        |    CAST(ntile(10) OVER (ORDER BY rev_c DESC, o_custkey) AS BIGINT) AS decile
        |  FROM pc),
        |g AS (SELECT decile, count(*) AS n_customers,
        |    CAST(sum(rev_c) AS BIGINT) AS decile_rev_c FROM d GROUP BY 1)
        |SELECT decile, n_customers, decile_rev_c,
        |  round(CAST(decile_rev_c AS DOUBLE) / sum(decile_rev_c) OVER (), 4)
        |    AS rev_share
        |FROM g ORDER BY decile""".stripMargin,
    "sync_quota_forecast" ->
      s"""WITH $invCte, $durCte,
         |daily AS (SELECT cf,
         |    date_diff('day', DATE '1970-01-01', snap_date) AS day,
         |    CAST(sum(size_bytes) AS BIGINT) AS bytes
         |  FROM dur GROUP BY 1, 2),
         |cum AS (SELECT cf, day, CAST(sum(bytes) OVER (PARTITION BY cf ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_bytes
         |  FROM daily),
         |fit AS (SELECT cf, count(*) AS n,
         |    CAST(sum(day) AS BIGINT) AS sx, CAST(sum(cum_bytes) AS BIGINT) AS sy,
         |    CAST(sum(day * day) AS BIGINT) AS sxx,
         |    CAST(sum(day * cum_bytes) AS BIGINT) AS sxy,
         |    CAST(max(cum_bytes) AS BIGINT) AS cum_last
         |  FROM cum GROUP BY 1)
         |SELECT cf, n AS n_days, cum_last,
         |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 4) AS daily_rate_bytes,
         |  round(CAST(cum_last AS DOUBLE)
         |    / ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |       / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)), 4) AS days_to_double
         |FROM fit ORDER BY cf""".stripMargin,
    "text_langid_confusion" ->
      s"""WITH $toksCte,
         |h AS (SELECT doc_id, lang,
         |  CAST(len(list_filter(toks, x -> x='the' OR x='a' OR x='of' OR x='and' OR x='is')) AS BIGINT) AS en_hits,
         |  CAST(len(list_filter(toks, x -> x='der' OR x='die' OR x='das' OR x='und' OR x='ist')) AS BIGINT) AS de_hits,
         |  CAST(len(list_filter(toks, x -> x='el' OR x='la' OR x='los' OR x='y' OR x='es')) AS BIGINT) AS es_hits,
         |  CAST(len(list_filter(toks, x -> x='le' OR x='la' OR x='les' OR x='et' OR x='est')) AS BIGINT) AS fr_hits
         |  FROM t),
         |p AS (SELECT lang,
         |  CASE WHEN greatest(en_hits, de_hits, es_hits, fr_hits) = 0 THEN 'und'
         |       WHEN en_hits >= greatest(de_hits, es_hits, fr_hits) THEN 'en'
         |       WHEN de_hits >= greatest(es_hits, fr_hits) THEN 'de'
         |       WHEN es_hits >= fr_hits THEN 'es' ELSE 'fr' END AS predicted_lang
         |  FROM h)
         |SELECT lang, predicted_lang, count(*) AS n_docs,
         |  CAST(count(*) AS DOUBLE)
         |    / sum(count(*)) OVER (PARTITION BY lang) AS share_of_true
         |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "vec_label_outliers" ->
      s"""WITH $embCte,
         |comp AS (SELECT label AS c_id, pos - 1 AS pos, x
         |         FROM (SELECT label, unnest(v) AS x,
         |               generate_subscripts(v, 1) AS pos FROM e)),
         |cent AS (SELECT c_id, list(cx ORDER BY pos) AS cv FROM (
         |  SELECT c_id, pos, avg(x) AS cx FROM comp GROUP BY c_id, pos) GROUP BY c_id),
         |s AS (SELECT label, vec_id,
         |  round(list_cosine_similarity(v, cv), 4) AS cos
         |  FROM e JOIN cent ON e.label = cent.c_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY label
         |  ORDER BY cos, vec_id) AS rnk FROM s)
         |SELECT label, count(*) AS n_vecs,
         |  round(avg(cos), 4) + 0.0 AS mean_cos,
         |  CAST(min(CASE WHEN rnk = 1 THEN vec_id END) AS BIGINT) AS outlier_vec,
         |  min(cos) AS outlier_cos
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, fingerprint,
        |  CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS cluster_size
        |FROM (SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
        |      FROM documents) ORDER BY doc_id""".stripMargin,
    "text_ngram_stats" ->
      s"""WITH $toksCte,
         |b AS (SELECT lang, unnest(list_transform(range(1, len(toks)),
         |        i -> toks[i] || ' ' || toks[i + 1])) AS bigram FROM t),
         |c AS (SELECT lang, bigram, count(*) AS n FROM b GROUP BY lang, bigram)
         |SELECT lang, bigram, n, rnk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS BIGINT) AS rnk
         |  FROM c) WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,

    "text_tfidf" ->
      s"""WITH $toksCte,
         |tok AS (SELECT lang, doc_id, unnest(toks) AS word FROM t),
         |tf AS (SELECT lang, word, count(*) AS tf FROM tok GROUP BY lang, word),
         |df AS (SELECT word, count(*) AS df FROM (SELECT DISTINCT word, doc_id FROM tok) GROUP BY word),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (SELECT lang, tf.word AS word, tf, df,
         |  round(tf * ln(n_docs / df), 6) AS tfidf FROM tf JOIN df ON tf.word = df.word CROSS JOIN n)
         |SELECT lang, word, tf, df, tfidf, rnk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY tfidf DESC, word) AS BIGINT) AS rnk
         |  FROM scored) WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,
    "text_lexical_complexity" ->
      s"""WITH $toksCte,
         |d AS (SELECT lang, toks, len(toks) AS w,
         |    length(regexp_replace(trim(lower(text)), '\\s+', '', 'g'))
         |      AS nonspace,
         |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl,
         |    len(list_filter(toks, t -> length(t) >= 7)) AS lw,
         |    len(list_distinct(toks)) AS dw
         |  FROM t)
         |SELECT lang, count(*) AS n_docs,
         |  round(avg(CAST(nonspace AS DOUBLE) / w), 4) AS avg_word_len,
         |  round(avg(CAST(syl AS DOUBLE) / w), 4) AS avg_syl_per_word,
         |  round(avg(CAST(lw AS DOUBLE) / w), 4) AS long_word_ratio,
         |  round(avg(CAST(dw AS DOUBLE) / w), 4) AS type_token_ratio
         |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "text_tfidf_knn" ->
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(toks) AS word FROM t),
         |pd AS (SELECT word, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
         |df AS (SELECT word, count(*) AS df FROM pd GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |post AS (SELECT pd.word AS word, pd.doc_id AS doc_id,
         |    pd.c * ln(CAST(n_docs AS DOUBLE) / df.df) AS w
         |  FROM pd JOIN df ON pd.word = df.word CROSS JOIN n
         |  WHERE df.df >= 2 AND df.df * 10 <= n_docs AND df.df <= 256),
         |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM post GROUP BY 1),
         |dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    sum(a.w * b.w) AS dot
         |  FROM post a JOIN post b ON a.word = b.word AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |cs AS (SELECT doc_a, doc_b, round(dot / (na.nrm * nb.nrm), 4) AS cos
         |  FROM dots JOIN nrm na ON dots.doc_a = na.doc_id
         |  JOIN nrm nb ON dots.doc_b = nb.doc_id),
         |sym AS (SELECT doc_a AS doc_id, doc_b AS nbr_id, cos FROM cs
         |  UNION ALL SELECT doc_b AS doc_id, doc_a AS nbr_id, cos FROM cs)
         |SELECT doc_id, nbr_id, cos, rnk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |    ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk FROM sym)
         |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "text_pmi" ->
      s"""WITH $toksCte,
         |uni AS (SELECT unnest(toks) AS word FROM t),
         |uc AS (SELECT word, count(*) AS n FROM uni GROUP BY 1),
         |b AS (SELECT unnest(list_transform(range(1, len(toks)),
         |    i -> toks[i] || ' ' || toks[i + 1])) AS bigram FROM t),
         |bc AS (SELECT bigram, count(*) AS n_ab FROM b GROUP BY 1
         |  HAVING count(*) >= 5),
         |sp AS (SELECT bigram, n_ab,
         |    string_split(bigram, ' ')[1] AS wa,
         |    string_split(bigram, ' ')[2] AS wb FROM bc),
         |nu AS (SELECT CAST(sum(n) AS BIGINT) AS n_uni FROM uc),
         |nb AS (SELECT CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) AS n_bi
         |  FROM t)
         |SELECT sp.bigram AS bigram, n_ab, a.n AS n_a, b2.n AS n_b,
         |  round(ln((CAST(n_ab AS DOUBLE) / n_bi) /
         |    ((CAST(a.n AS DOUBLE) / n_uni) *
         |     (CAST(b2.n AS DOUBLE) / n_uni))), 6) AS pmi
         |FROM sp JOIN uc a ON sp.wa = a.word JOIN uc b2 ON sp.wb = b2.word
         |CROSS JOIN nu CROSS JOIN nb
         |ORDER BY pmi DESC, bigram LIMIT 20""".stripMargin,
    "text_bm25" ->
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(toks) AS word FROM t),
         |pd AS (SELECT word, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM pd GROUP BY 1),
         |df AS (SELECT word, count(*) AS df FROM pd GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS total_toks FROM dl),
         |q AS (SELECT word, df FROM df ORDER BY df DESC, word LIMIT 3),
         |scored AS (SELECT q.word AS word, pd.doc_id AS doc_id, pd.tf AS tf,
         |    dl.dl AS dl,
         |    round(ln((n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0) *
         |      (pd.tf * 2.2 / (pd.tf + 1.2 * (0.25 + 0.75 *
         |        (dl.dl / (CAST(total_toks AS DOUBLE) / n_docs))))), 6) AS bm25
         |  FROM pd JOIN q ON pd.word = q.word JOIN dl ON pd.doc_id = dl.doc_id
         |  CROSS JOIN n CROSS JOIN tot)
         |SELECT word, doc_id, tf, dl, bm25, rnk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY word
         |    ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rnk
         |  FROM scored) WHERE rnk <= 10 ORDER BY word, rnk""".stripMargin,
    "mm_phash" ->
      """WITH b AS (SELECT doc_id, list_transform(string_split(text,''), x -> ascii(x)) AS by,
        |             length(text) AS n FROM documents),
        |m AS (SELECT doc_id, list_transform(range(0,33),
        |        i -> list_avg(by[(i*n)//33 + 1 : ((i+1)*n)//33])) AS av FROM b)
        |SELECT doc_id, CAST(list_sum(list_transform(range(0,32),
        |    i -> CASE WHEN av[i+1] > av[i+2] THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS phash
        |FROM m ORDER BY doc_id""".stripMargin,
    "mm_audio_fingerprint" ->
      """WITH ch AS (SELECT doc_id,
        |    list_transform(string_split(text, ''), x -> ascii(x)) AS by,
        |    length(text) AS n FROM documents WHERE doc_id % 3 = 1),
        |e AS (SELECT doc_id, CAST((n + 15) // 16 AS BIGINT) AS n_frames,
        |  list_transform(range(0, (n + 15) // 16),
        |    idx -> list_sum(by[idx * 16 + 1 : (idx + 1) * 16]) * 1.0 /
        |      len(by[idx * 16 + 1 : (idx + 1) * 16])) AS es FROM ch),
        |f AS (SELECT doc_id, n_frames,
        |  CASE WHEN n_frames > 1 THEN
        |    CAST(list_sum(list_transform(range(0, least(n_frames - 1, 32)),
        |      i -> CASE WHEN es[i + 2] > es[i + 1]
        |        THEN CAST(2 ** i AS BIGINT) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)
        |  ELSE 0 END AS fingerprint FROM e),
        |g AS (SELECT fingerprint, min(doc_id) AS keeper,
        |  count(*) AS n_cluster FROM f GROUP BY 1)
        |SELECT f.doc_id AS doc_id, n_frames, fingerprint, keeper, n_cluster,
        |  f.doc_id = keeper AS is_keeper
        |FROM f JOIN g USING (fingerprint) ORDER BY doc_id""".stripMargin,
    "mm_vad_segments" ->
      """WITH ch AS (SELECT doc_id,
        |    list_transform(string_split(text, ''), x -> ascii(x)) AS by,
        |    length(text) AS n FROM documents),
        |fr AS (SELECT doc_id, unnest(range(0, (n + 15) // 16)) AS idx, by
        |  FROM ch),
        |e AS (SELECT doc_id, idx,
        |    list_sum(by[idx * 16 + 1 : (idx + 1) * 16]) * 1.0 /
        |      len(by[idx * 16 + 1 : (idx + 1) * 16]) AS e
        |  FROM fr),
        |a AS (SELECT doc_id, idx,
        |    idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS grp
        |  FROM e WHERE e > 95.0),
        |s AS (SELECT doc_id, grp, count(*) AS len FROM a GROUP BY 1, 2),
        |agg AS (SELECT doc_id, count(*) AS n_segments, max(len) AS max_run,
        |    sum(len) AS n_active FROM s GROUP BY 1),
        |nf AS (SELECT doc_id, CAST((n + 15) // 16 AS BIGINT) AS n_frames
        |  FROM ch)
        |SELECT nf.doc_id AS doc_id, n_frames,
        |  CAST(COALESCE(n_active, 0) AS BIGINT) AS n_active,
        |  CAST(COALESCE(n_segments, 0) AS BIGINT) AS n_segments,
        |  CAST(COALESCE(max_run, 0) AS BIGINT) AS max_run
        |FROM nf LEFT JOIN agg ON nf.doc_id = agg.doc_id
        |ORDER BY doc_id""".stripMargin,
    "mm_scene_detect" ->
      """WITH ch AS (SELECT doc_id,
        |    list_transform(string_split(text, ''), x -> ascii(x)) AS by,
        |    length(text) AS n FROM documents WHERE doc_id % 3 = 2),
        |fr AS (SELECT doc_id, unnest(range(0, (n + 63) // 64)) AS idx, by FROM ch),
        |e AS (SELECT doc_id, idx,
        |    list_sum(by[idx * 64 + 1 : (idx + 1) * 64]) * 1.0 /
        |      len(by[idx * 64 + 1 : (idx + 1) * 64]) AS e
        |  FROM fr),
        |c AS (SELECT doc_id, idx, e,
        |    lag(e) OVER (PARTITION BY doc_id ORDER BY idx) AS prev_e
        |  FROM e),
        |sc AS (SELECT doc_id, idx,
        |    CASE WHEN prev_e IS NOT NULL AND abs(e - prev_e) > 5.0
        |      THEN 1 ELSE 0 END AS cut
        |  FROM c),
        |s2 AS (SELECT doc_id, idx, sum(cut) OVER (PARTITION BY doc_id ORDER BY idx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene FROM sc),
        |ps AS (SELECT doc_id, scene, count(*) AS len FROM s2 GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(len) AS BIGINT) AS n_frames,
        |  CAST(count(*) - 1 AS BIGINT) AS n_cuts,
        |  count(*) AS n_scenes,
        |  CAST(max(len) AS BIGINT) AS max_scene_frames
        |FROM ps GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "mm_phash_dedup" ->
      """WITH b AS (SELECT doc_id, list_transform(string_split(text,''), x -> ascii(x)) AS by,
        |             length(text) AS n FROM documents),
        |m AS (SELECT doc_id, list_transform(range(0,33),
        |        i -> list_avg(by[(i*n)//33 + 1 : ((i+1)*n)//33])) AS av FROM b),
        |h AS (SELECT doc_id, CAST(list_sum(list_transform(range(0,32),
        |        i -> CASE WHEN av[i+1] > av[i+2] THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS phash FROM m),
        |hr AS (SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies,
        |       phash FROM h GROUP BY phash),
        |bk AS (SELECT doc_id, phash, n_copies, j, (phash >> CAST(8*j AS INT)) & 255 AS band
        |       FROM (SELECT doc_id, phash, n_copies, unnest(range(0,4)) AS j FROM hr))
        |SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id,
        |  CAST(bit_count(xor(a.phash, b2.phash)) AS BIGINT) AS hamming,
        |  a.n_copies * b2.n_copies AS n_pairs
        |FROM bk a JOIN bk b2 ON a.j = b2.j AND a.band = b2.band AND a.doc_id < b2.doc_id
        |WHERE bit_count(xor(a.phash, b2.phash)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,
    "mm_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(list_sum(list_transform(string_split(text, ''), x -> ascii(x))) AS BIGINT) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_winnowing" ->
      """WITH kg AS (SELECT doc_id,
        |  list_transform(range(1, length(text) - 6), i -> md5(substr(text, i, 8))) AS kg
        |  FROM documents),
        |fps AS (SELECT doc_id,
        |  list_distinct(list_transform(range(1, len(kg) - 2), j -> list_aggregate(kg[j:j+3], 'min'))) AS fps
        |  FROM kg)
        |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fingerprints,
        |  md5(list_aggregate(list_sort(fps), 'string_agg', '')) AS fp_digest
        |FROM fps ORDER BY doc_id""".stripMargin,
    "mm_payload_dedup" ->
      """SELECT md5(text) AS digest, count(*) AS n_copies,
        |  CAST(min(doc_id) AS BIGINT) AS survivor_doc,
        |  CAST(max(octet_length(encode(text))) AS BIGINT) AS n_bytes,
        |  count(DISTINCT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |        WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |        ELSE 'video/mp4' END) AS n_mimes,
        |  CAST((count(*) - 1) * max(octet_length(encode(text))) AS BIGINT)
        |    AS wasted_bytes
        |FROM documents GROUP BY 1 ORDER BY survivor_doc""".stripMargin,
    "mm_ingest" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |       ELSE 'video/mp4' END AS mime,
        |  CAST(n_chars % 640 AS BIGINT) AS width,
        |  CAST(n_chars % 480 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_resize_frames" ->
      """WITH m AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |r AS (SELECT doc_id, n,
        |  CAST(LEAST(n, 64) AS BIGINT) AS resized_bytes,
        |  CAST(CASE WHEN n <= 64
        |    THEN list_sum(list_transform(string_split(text, ''), x -> ascii(x)))
        |    ELSE list_sum(list_transform(range(0, 64),
        |      i -> ascii(substr(text, CAST(floor(i * (n / 64.0)) AS INTEGER) + 1, 1))))
        |  END AS BIGINT) AS resized_checksum
        |  FROM m),
        |f AS (SELECT doc_id, GREATEST(1, n // 4) AS span, n FROM m),
        |fr AS (SELECT doc_id,
        |  CAST(list_sum(list_transform(range(0, 4),
        |    g -> CASE WHEN g * span < n THEN 1 ELSE 0 END)) AS BIGINT) AS n_frames,
        |  CAST(list_sum(list_transform(range(0, 4),
        |    g -> CASE WHEN g * span < n THEN LEAST(span, n - g * span) ELSE 0 END)) AS BIGINT) AS frames_bytes
        |  FROM f)
        |SELECT m.doc_id AS doc_id, CAST(m.n AS BIGINT) AS orig_bytes,
        |  r.resized_bytes, r.resized_checksum, fr.n_frames, fr.frames_bytes
        |FROM m JOIN r ON m.doc_id = r.doc_id JOIN fr ON m.doc_id = fr.doc_id
        |WHERE m.n > 0 ORDER BY m.doc_id""".stripMargin,
    "sync_watch_stream" ->
      s"""WITH $invCte, $durCte
         |SELECT snap_date AS arrival_date, cf, count(*) AS n_new_files,
         |  max(generation) AS max_generation
         |FROM dur GROUP BY 1, 2 ORDER BY arrival_date, cf""".stripMargin,
    "stream_file_watch" ->
      s"""WITH $invCte
         |SELECT cf, node_id, generation, path, CAST(mtime AS TIMESTAMP) AS mtime
         |FROM inv WHERE NOT is_temp ORDER BY generation""".stripMargin,
    "stream_retry_queue" ->
      s"""WITH $invCte, $durCte
         |SELECT path, CAST(1 AS BIGINT) AS attempts,
         |  CASE WHEN cf <> 'error' OR generation % 3 = 0
         |       THEN 'uploaded' ELSE 'retrying' END AS status
         |FROM dur ORDER BY path""".stripMargin,
    "stream_change_feed" ->
      """WITH cells AS (SELECT CAST(user_id % 50 AS BIGINT) AS row_key, value,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS write_us, event_id AS generation,
        |  (event_type = 'error') AS tombstone FROM events),
        |seq AS (SELECT row_key, generation, tombstone,
        |  CASE WHEN tombstone THEN NULL ELSE value END AS new_value,
        |  lag(CASE WHEN tombstone THEN NULL ELSE value END)
        |    OVER (PARTITION BY row_key ORDER BY write_us, generation) AS old_value
        |  FROM cells)
        |SELECT row_key, generation, old_value, new_value,
        |  CASE WHEN tombstone AND old_value IS NOT NULL THEN 'delete'
        |       WHEN tombstone THEN 'noop_delete'
        |       WHEN old_value IS NOT NULL THEN 'update'
        |       ELSE 'insert' END AS kind
        |FROM seq ORDER BY row_key, generation""".stripMargin,
    "fs_inventory" ->
      s"""WITH $invCte
         |SELECT path, cf, node_id, shard_id, generation, is_temp, size_bytes
         |FROM inv WHERE generation <= 1500 ORDER BY generation""".stripMargin,
    "sync_watch_service" ->
      s"""WITH $invCte
         |SELECT path, cf, node_id, shard_id, generation, size_bytes
         |FROM inv WHERE generation <= 1500 AND NOT is_temp
         |ORDER BY generation""".stripMargin,
    // zero-filled fixture files: content digest ≡ f(size_bytes), so the
    // dedup gate's keeper/duplicate verdicts are exact SQL over sizes
    "sync_watch_dedup" ->
      s"""WITH $invCte,
         |f AS (SELECT path, cf, generation, size_bytes FROM inv
         |      WHERE generation <= 1500 AND NOT is_temp),
         |k AS (SELECT size_bytes, min(path) AS keeper FROM f GROUP BY 1)
         |SELECT f.path, f.cf, f.generation, f.size_bytes,
         |  CASE WHEN f.path = k.keeper THEN 'accepted' ELSE 'duplicate' END AS verdict,
         |  CASE WHEN f.path = k.keeper THEN NULL ELSE k.keeper END AS keeper_path
         |FROM f JOIN k USING (size_bytes)
         |ORDER BY f.path""".stripMargin,
    // the fixture tree's files are size_bytes zero bytes, so the
    // expected md5 is computable in SQL: md5(repeat(chr(0), n))
    "sync_fsck_verify" ->
      s"""WITH $invCte
         |SELECT path, size_bytes,
         |  md5(repeat(chr(0), CAST(size_bytes AS INT))) AS stored_md5,
         |  md5(repeat(chr(0), CAST(size_bytes AS INT))) AS actual_md5,
         |  'ok' AS fsck_status
         |FROM inv WHERE generation <= 1500 AND NOT is_temp
         |ORDER BY path""".stripMargin,
    "cass_lww_read" ->
      """WITH cells AS (SELECT CAST(user_id % 50 AS BIGINT) AS row_key, value,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS write_us, event_id AS generation,
        |  (event_type = 'error') AS tombstone FROM events)
        |SELECT row_key, value AS latest_value, write_us, generation FROM (
        |  SELECT *, row_number() OVER (PARTITION BY row_key
        |    ORDER BY write_us DESC, generation DESC) AS rn FROM cells)
        |WHERE rn = 1 AND NOT tombstone ORDER BY row_key""".stripMargin,
    // compaction is a physical rewrite, not a semantic change: the
    // compacted table's merged read equals the original merge
    "cass_compact" ->
      """WITH cells AS (SELECT CAST(user_id % 50 AS BIGINT) AS row_key, value,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS write_us, event_id AS generation,
        |  (event_type = 'error') AS tombstone FROM events)
        |SELECT row_key, value AS latest_value, write_us, generation FROM (
        |  SELECT *, row_number() OVER (PARTITION BY row_key
        |    ORDER BY write_us DESC, generation DESC) AS rn FROM cells)
        |WHERE rn = 1 AND NOT tombstone ORDER BY row_key""".stripMargin,
    "cass_token_scan" ->
      """WITH cells AS (SELECT CAST(user_id % 50 AS BIGINT) AS row_key,
        |  event_id AS generation, (event_type = 'error') AS tombstone FROM events)
        |SELECT row_key, count(*) AS n_cells, max(generation) AS max_generation,
        |  CAST(sum(CASE WHEN tombstone THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstones
        |FROM cells WHERE row_key BETWEEN 10 AND 19
        |GROUP BY row_key ORDER BY row_key""".stripMargin,
    "io_partitioned_inventory" ->
      s"""WITH $invCte, $durCte
         |SELECT snap_date, cf, count(*) AS n_files,
         |  CAST(sum(size_bytes) AS BIGINT) AS bytes
         |FROM dur WHERE snap_date BETWEEN DATE '2024-01-05' AND DATE '2024-01-20'
         |GROUP BY 1, 2 ORDER BY snap_date, cf""".stripMargin,
    "io_csv_json" ->
      s"""WITH $invCte, $durCte,
         |d AS (SELECT snap_date, cf, count(*) AS n,
         |  CAST(sum(size_bytes) AS BIGINT) AS b FROM dur GROUP BY 1, 2)
         |SELECT snap_date, cf, n AS n_csv, b AS bytes_csv, n AS n_json, b AS bytes_json
         |FROM d ORDER BY snap_date, cf""".stripMargin,
    "io_bucketed_join" ->
      s"""WITH $invCte, $durCte,
         |tgt AS (SELECT path FROM dur WHERE generation % 3 <> 0 AND node_id <> 3)
         |SELECT cf, count(*) AS n_synced,
         |  CAST(sum(size_bytes) AS BIGINT) AS synced_bytes
         |FROM dur JOIN tgt ON dur.path = tgt.path
         |GROUP BY cf ORDER BY cf""".stripMargin,
    "io_zorder_layout" ->
      s"""WITH b AS (SELECT max(l_partkey) AS max_p, max(l_suppkey) AS max_s
         |  FROM lineitem),
         |c AS (SELECT (l_partkey * 256) // (max_p + 1) AS x8,
         |             (l_suppkey * 256) // (max_s + 1) AS y8
         |  FROM lineitem, b),
         |z AS (SELECT x8, y8, ${graft.sources.ZOrder.morton8Sql("x8", "y8")} AS z
         |  FROM c)
         |SELECT z // 1024 AS zbucket, count(*) AS n,
         |  min(x8) AS min_x, max(x8) AS max_x,
         |  min(y8) AS min_y, max(y8) AS max_y
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_skyline" ->
      """WITH p AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_c,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |d AS (SELECT spend_c, n_orders, count(*) AS n_customers,
        |    min(o_custkey) AS min_custkey FROM p GROUP BY 1, 2),
        |s AS (SELECT *, max(n_orders) OVER (ORDER BY spend_c DESC, n_orders DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax FROM d)
        |SELECT spend_c, n_orders, n_customers, min_custkey
        |FROM s WHERE runmax IS NULL OR n_orders > runmax
        |ORDER BY spend_c DESC""".stripMargin,
    "q_max_concurrency" ->
      """WITH e AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |d AS (SELECT event_type, us AS t, 1 AS delta FROM e
        |  UNION ALL SELECT event_type, us + 300000000, -1 FROM e),
        |r AS (SELECT event_type, t, sum(delta) OVER (PARTITION BY event_type
        |    ORDER BY t, delta
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc FROM d),
        |p AS (SELECT event_type, CAST(max(conc) AS BIGINT) AS peak_concurrency
        |  FROM r GROUP BY 1)
        |SELECT r.event_type AS event_type, peak_concurrency,
        |  CAST(min(t) AS BIGINT) AS first_peak_us
        |FROM r JOIN p ON r.event_type = p.event_type
        |  AND r.conc = p.peak_concurrency
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "io_orc_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_price,
        |  max(o_orderdate) AS last_date
        |FROM orders WHERE o_orderstatus <> 'P'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "topk_per_group" ->
      s"""WITH $lpCte
         |SELECT l_returnflag, l_orderkey, l_linenumber, price_c FROM (
         |  SELECT l_returnflag, l_orderkey, l_linenumber, price_c,
         |    row_number() OVER (PARTITION BY l_returnflag
         |      ORDER BY price_c DESC, l_orderkey, l_linenumber) AS rn FROM lp)
         |WHERE rn <= 5
         |ORDER BY l_returnflag, price_c DESC, l_orderkey, l_linenumber""".stripMargin,
    "rewrite_window_topk" ->
      """WITH op AS (SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c FROM orders)
        |SELECT o_custkey, o_orderkey, price_c FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY price_c DESC, o_orderkey) AS rn FROM op)
        |WHERE rn <= 2 ORDER BY o_custkey, price_c DESC, o_orderkey""".stripMargin,
    "typed_aggregator" ->
      """SELECT user_id, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value,
        |  max(value) AS max_value,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "kmeans" -> Ann.kmeansOracleSql,
    "dedup_cc_clusters" -> Dedup.ccClustersOracleSql,
    "dedup_cluster_stats" -> Dedup.clusterStatsOracleSql,
    "dedup_quality_survivors" -> Dedup.qualitySurvivorsOracleSql,
    "dedup_containment" -> Dedup.containmentOracleSql,
    "ann_knn_classify" ->
      s"""WITH $embCte,
         |q AS (SELECT vec_id AS q_id, label AS true_label, v AS qv FROM e WHERE vec_id < 20),
         |c AS (SELECT vec_id, label, v FROM e WHERE vec_id >= 20),
         |s AS (SELECT q_id, true_label, c.vec_id, c.label,
         |  round(list_cosine_similarity(qv, v), 4) AS cos FROM c CROSS JOIN q),
         |nn AS (SELECT * FROM (SELECT *,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM s) WHERE rnk <= 5),
         |v AS (SELECT q_id, true_label, label, count(*) AS n_votes
         |  FROM nn GROUP BY 1, 2, 3),
         |p AS (SELECT q_id, true_label, label AS pred_label FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY n_votes DESC, label) AS vr FROM v) WHERE vr = 1)
         |SELECT true_label, count(*) AS n_probes,
         |  CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_correct,
         |  CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS accuracy
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "ann_rh_bucket" -> Ann.rhBucketOracleSql,
    "ann_dim_truncation" ->
      s"""WITH $embCte,
         |q AS (SELECT vec_id AS q_id, v AS qv, v[1:16] AS qt FROM e WHERE vec_id < 5),
         |c AS (SELECT vec_id, v, v[1:16] AS vt FROM e WHERE vec_id >= 5),
         |ex AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY round(list_cosine_similarity(qv, v), 4) DESC, vec_id) AS rn
         |  FROM c CROSS JOIN q) WHERE rn <= 5),
         |tr AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY round(list_cosine_similarity(qt, vt), 4) DESC, vec_id) AS rn
         |  FROM c CROSS JOIN q) WHERE rn <= 5),
         |hits AS (SELECT tr.q_id, count(*) AS n_hits FROM tr
         |  JOIN ex ON tr.q_id = ex.q_id AND tr.vec_id = ex.vec_id GROUP BY tr.q_id)
         |SELECT q.q_id AS q_id, COALESCE(n_hits, 0) AS n_hits,
         |  COALESCE(n_hits, 0) / 5 AS recall_at_5
         |FROM (SELECT DISTINCT q_id FROM ex) q LEFT JOIN hits ON q.q_id = hits.q_id
         |ORDER BY q.q_id""".stripMargin,
    "q_grouping_sets" ->
      """WITH g AS (SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
        |  FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus)))
        |SELECT COALESCE(o_orderpriority, '(all)') AS priority,
        |  COALESCE(o_orderstatus, '(all)') AS status, n_orders, total_price
        |FROM g ORDER BY priority, status""".stripMargin,
    "q_asof_tolerance" ->
      """WITH u AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
        |  FROM events),
        |p AS (SELECT user_id,
        |  (last_click_ts IS NOT NULL AND
        |   epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(last_click_ts AS TIMESTAMP)) <= 600000000) AS matched,
        |  CASE WHEN last_click_ts IS NOT NULL AND
        |    epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(last_click_ts AS TIMESTAMP)) <= 600000000
        |    THEN epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(last_click_ts AS TIMESTAMP)) END AS gap_us
        |  FROM u WHERE event_type = 'purchase')
        |SELECT user_id, count(*) AS n_purchases,
        |  CAST(sum(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |  max(gap_us) AS max_matched_gap_us
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_scd2_history" ->
      """WITH seq AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |chg AS (SELECT * FROM seq WHERE prev IS NULL OR prev <> o_orderpriority)
        |SELECT o_custkey,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  o_orderpriority AS priority,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w AS valid_to,
        |  (lead(o_orderdate) OVER w IS NULL) AS is_current
        |FROM chg
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin,
    "text_quality_filter" ->
      s"""WITH $toksCte,
         |m AS (SELECT doc_id, len(toks) AS ntoks,
         |  CAST(length(text) AS DOUBLE) AS lenc,
         |  CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) AS nspace,
         |  CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE) AS symbols,
         |  len(list_filter(toks, x -> x='the' OR x='a' OR x='of' OR x='and' OR x='is')) AS stophits
         |  FROM t)
         |SELECT doc_id,
         |  (ntoks >= 5 AND ntoks <= 10000) AS ok_token_count,
         |  ((lenc - nspace) / ntoks >= 2.0 AND (lenc - nspace) / ntoks <= 12.0) AS ok_mean_token_len,
         |  (symbols / lenc <= 0.25) AS ok_symbol_ratio,
         |  (stophits >= 1) AS ok_stopword_evidence,
         |  ((ntoks >= 5 AND ntoks <= 10000)
         |    AND ((lenc - nspace) / ntoks >= 2.0 AND (lenc - nspace) / ntoks <= 12.0)
         |    AND (symbols / lenc <= 0.25) AND (stophits >= 1)) AS passes
         |FROM m ORDER BY doc_id""".stripMargin,
    "text_pii_mask" ->
      """WITH aug AS (SELECT doc_id,
        |  'contact user' || CAST(doc_id AS VARCHAR) || '@example.com ref ' ||
        |  lpad(CAST(doc_id * 7919 + 13 AS VARCHAR), 8, '0') || ' ' || text AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '[0-9]{4,}')) AS BIGINT) AS n_long_numbers,
        |  md5(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{4,}', '<NUM>', 'g')) AS masked_digest
        |FROM aug ORDER BY doc_id""".stripMargin,
    "text_freq_tokens" ->
      s"""WITH $toksCte,
         |tok AS (SELECT lang, unnest(toks) AS token FROM t),
         |c AS (SELECT lang, token, count(*) AS cnt FROM tok GROUP BY lang, token)
         |SELECT lang, token, cnt, rnk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS BIGINT) AS rnk
         |  FROM c) WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,
    "text_heavy_hitters_exact" ->
      s"""WITH $toksCte,
         |tok AS (SELECT unnest(toks) AS token FROM t),
         |tot AS (SELECT count(*) AS n FROM tok),
         |c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1)
         |SELECT token, cnt, (cnt * 10000) // n AS share_bp
         |FROM c, tot WHERE cnt * ${TextAnalysis.HhReportDiv} >= n
         |ORDER BY cnt DESC, token""".stripMargin,
    "text_repetition" ->
      s"""WITH $toksCte,
         |g AS (SELECT doc_id,
         |  list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) AS g2,
         |  list_transform(range(1, len(toks) - 1),
         |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS g3
         |  FROM t)
         |SELECT doc_id, CAST(len(g2) AS BIGINT) AS n_bigrams,
         |  CASE WHEN len(g2) > 0
         |    THEN round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 4)
         |    ELSE 0.0 END AS dup_bigram_ratio,
         |  CASE WHEN len(g3) > 0
         |    THEN round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 4)
         |    ELSE 0.0 END AS dup_trigram_ratio
         |FROM g ORDER BY doc_id""".stripMargin,
    "text_common_spans" ->
      s"""WITH $toksCte,
         |s AS (SELECT unnest(list_transform(range(1, len(toks) - 3),
         |  i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' ||
         |       toks[i + 3] || ' ' || toks[i + 4])) AS span FROM t)
         |SELECT span, count(*) AS n_docs_span FROM s GROUP BY span
         |ORDER BY n_docs_span DESC, span LIMIT 10""".stripMargin,
    "stream_dedup" ->
      """SELECT event_type, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_static_join" ->
      """SELECT n.n_name AS n_name, count(*) AS n_events,
        |  round(sum(e.value), 2) AS sum_value
        |FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_interval_join" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS p_us FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS c_user, event_id AS click_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS c_us FROM events WHERE event_type = 'click')
        |SELECT user_id, purchase_id, click_id
        |FROM p JOIN c ON user_id = c_user
        |  AND c_us >= p_us - 1800000000 AND c_us <= p_us
        |ORDER BY user_id, purchase_id, click_id""".stripMargin,
    "stream_interval_join_outer" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS p_us FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS c_user, event_id AS click_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS c_us FROM events WHERE event_type = 'click'),
        |wm AS (SELECT least((SELECT max(p_us) FROM p), (SELECT max(c_us) FROM c))
        |  - 3600000000 AS w),
        |m AS (SELECT user_id, purchase_id, click_id
        |  FROM p JOIN c ON user_id = c_user
        |    AND c_us >= p_us - 1800000000 AND c_us <= p_us),
        |u AS (SELECT p.user_id AS user_id, p.purchase_id AS purchase_id,
        |  CAST(NULL AS BIGINT) AS click_id FROM p
        |  WHERE p.p_us < (SELECT w FROM wm)
        |    AND NOT EXISTS (SELECT 1 FROM c WHERE c.c_user = p.user_id
        |      AND c.c_us >= p.p_us - 1800000000 AND c.c_us <= p.p_us))
        |SELECT user_id, purchase_id, click_id FROM m
        |UNION ALL SELECT user_id, purchase_id, click_id FROM u
        |ORDER BY user_id, purchase_id, click_id""".stripMargin,
    "q_distinct_hll_sketch" ->
      """WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
        |h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM du),
        |d AS (SELECT event_type, hx,
        |  (CASE WHEN substr(hx, 1, 1) BETWEEN '0' AND '9'
        |     THEN ascii(substr(hx, 1, 1)) - 48 ELSE ascii(substr(hx, 1, 1)) - 87 END) * 16 +
        |  (CASE WHEN substr(hx, 2, 1) BETWEEN '0' AND '9'
        |     THEN ascii(substr(hx, 2, 1)) - 48 ELSE ascii(substr(hx, 2, 1)) - 87 END) AS byte0,
        |  length(regexp_extract(substr(hx, 3), '^0*')) AS zh
        |  FROM h),
        |z AS (SELECT event_type, byte0 % 64 AS bucket, zh, substr(hx, 3 + zh, 1) AS fd FROM d),
        |rh AS (SELECT event_type, bucket,
        |  LEAST(4 * zh + (CASE WHEN dv >= 8 THEN 0 WHEN dv >= 4 THEN 1
        |                       WHEN dv >= 2 THEN 2 ELSE 3 END) + 1, 30) AS rho
        |  FROM (SELECT *, CASE WHEN fd = '' THEN 0
        |                       WHEN fd BETWEEN '0' AND '9' THEN ascii(fd) - 48
        |                       ELSE ascii(fd) - 87 END AS dv FROM z)),
        |reg AS (SELECT event_type, bucket, max(rho) AS r FROM rh GROUP BY 1, 2),
        |grid AS (SELECT event_type, b AS bucket FROM (SELECT DISTINCT event_type FROM events)
        |  CROSS JOIN (SELECT unnest(range(0, 64)) AS b)),
        |fullr AS (SELECT grid.event_type AS event_type, grid.bucket AS bucket,
        |    COALESCE(reg.r, 0) AS r
        |  FROM grid LEFT JOIN reg ON grid.event_type = reg.event_type
        |    AND grid.bucket = reg.bucket),
        |agg AS (SELECT event_type,
        |  md5(string_agg(CAST(bucket AS VARCHAR) || ':' || CAST(r AS VARCHAR), ',' ORDER BY bucket)) AS reg_digest,
        |  CAST(sum(CAST(pow(2, 30 - r) AS BIGINT)) AS BIGINT) AS s_int,
        |  CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero
        |  FROM fullr GROUP BY event_type),
        |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY event_type),
        |est AS (SELECT event_type, reg_digest,
        |  0.709 * 4096.0 * 1073741824.0 / s_int AS raw, v_zero FROM agg)
        |SELECT ex.event_type AS event_type, n_exact,
        |  round(CASE WHEN raw <= 160.0 AND v_zero > 0
        |             THEN 64.0 * ln(64.0 / v_zero) ELSE raw END, 2) AS hll_estimate,
        |  reg_digest
        |FROM ex JOIN est ON ex.event_type = est.event_type
        |ORDER BY event_type""".stripMargin,
    "stream_quantile_sketch" ->
      s"""SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day_start,
         |  event_type, count(*) AS n_events,
         |  CASE WHEN count(*) <= ${StreamWatcher.QuantileSketchAccuracy}
         |    THEN quantile_disc(value, 0.5) END AS p50,
         |  CASE WHEN count(*) <= ${StreamWatcher.QuantileSketchAccuracy}
         |    THEN quantile_disc(value, 0.9) END AS p90
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_sketch_distinct" ->
      """WITH du AS (SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP))
        |    AS hs, event_type, user_id FROM events),
        |hx AS (SELECT hs, event_type, md5(CAST(user_id AS VARCHAR)) AS hv
        |  FROM du),
        |d AS (SELECT hs, event_type, hv,
        |  (CASE WHEN substr(hv, 1, 1) BETWEEN '0' AND '9'
        |     THEN ascii(substr(hv, 1, 1)) - 48 ELSE ascii(substr(hv, 1, 1)) - 87 END) * 16 +
        |  (CASE WHEN substr(hv, 2, 1) BETWEEN '0' AND '9'
        |     THEN ascii(substr(hv, 2, 1)) - 48 ELSE ascii(substr(hv, 2, 1)) - 87 END) AS byte0,
        |  length(regexp_extract(substr(hv, 3), '^0*')) AS zh
        |  FROM hx),
        |z AS (SELECT hs, event_type, byte0 % 64 AS bucket, zh,
        |    substr(hv, 3 + zh, 1) AS fd FROM d),
        |rh AS (SELECT hs, event_type, bucket,
        |  LEAST(4 * zh + (CASE WHEN dv >= 8 THEN 0 WHEN dv >= 4 THEN 1
        |                       WHEN dv >= 2 THEN 2 ELSE 3 END) + 1, 30) AS rho
        |  FROM (SELECT *, CASE WHEN fd = '' THEN 0
        |                       WHEN fd BETWEEN '0' AND '9' THEN ascii(fd) - 48
        |                       ELSE ascii(fd) - 87 END AS dv FROM z)),
        |reg AS (SELECT hs, event_type, bucket, max(rho) AS r
        |  FROM rh GROUP BY 1, 2, 3),
        |grid AS (SELECT hs, event_type, b AS bucket FROM
        |  (SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hs,
        |     event_type FROM events)
        |  CROSS JOIN (SELECT unnest(range(0, 64)) AS b)),
        |fullr AS (SELECT grid.hs AS hs, grid.event_type AS event_type,
        |    grid.bucket AS bucket, COALESCE(reg.r, 0) AS r
        |  FROM grid LEFT JOIN reg ON grid.hs = reg.hs
        |    AND grid.event_type = reg.event_type AND grid.bucket = reg.bucket),
        |agg AS (SELECT hs, event_type,
        |  md5(string_agg(CAST(bucket AS VARCHAR) || ':' || CAST(r AS VARCHAR), ',' ORDER BY bucket)) AS reg_digest,
        |  CAST(sum(CAST(pow(2, 30 - r) AS BIGINT)) AS BIGINT) AS s_int,
        |  CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero
        |  FROM fullr GROUP BY 1, 2),
        |est AS (SELECT hs, event_type, reg_digest,
        |  0.709 * 4096.0 * 1073741824.0 / s_int AS raw, v_zero FROM agg)
        |SELECT hs AS hour_start, event_type,
        |  round(CASE WHEN raw <= 160.0 AND v_zero > 0
        |             THEN 64.0 * ln(64.0 / v_zero) ELSE raw END, 2) AS hll_estimate,
        |  reg_digest
        |FROM est ORDER BY hour_start, event_type""".stripMargin,
    "ann_ivf_multiprobe" ->
      s"""WITH $embCte,
         |comp AS (SELECT label AS c_id, pos - 1 AS pos, x
         |         FROM (SELECT label, unnest(v) AS x,
         |               generate_subscripts(v, 1) AS pos FROM e)),
         |cent AS (SELECT c_id, list(cx ORDER BY pos) AS cv FROM (
         |  SELECT c_id, pos, avg(x) AS cx FROM comp GROUP BY c_id, pos) GROUP BY c_id),
         |scored AS (SELECT vec_id, label, c_id,
         |  round(list_cosine_similarity(v, cv), 4) + 0.0 AS ccos FROM e CROSS JOIN cent),
         |assign AS (SELECT vec_id, c_id AS assigned_centroid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, c_id) AS rn
         |  FROM scored) WHERE rn = 1),
         |ea AS (SELECT e.vec_id, v, assigned_centroid FROM e JOIN assign ON e.vec_id = assign.vec_id),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM ea WHERE vec_id < 5),
         |pr AS (SELECT q_id, qv, c_id AS probe FROM (
         |  SELECT q.q_id, q.qv, cent.c_id,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY round(list_cosine_similarity(q.qv, cent.cv), 4) DESC, cent.c_id) AS rn
         |  FROM q CROSS JOIN cent) WHERE rn <= 2),
         |c AS (SELECT vec_id, v, assigned_centroid FROM ea WHERE vec_id >= 5),
         |s AS (SELECT q_id, c.vec_id, probe,
         |  round(list_cosine_similarity(qv, v), 4) + 0.0 AS cos
         |  FROM c JOIN pr ON c.assigned_centroid = pr.probe)
         |SELECT q_id, vec_id, probe, cos, rnk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         |  FROM s) WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "q_stickiness" ->
      """WITH e AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
        |    CAST(ts AS DATE) AS day, user_id FROM events),
        |d AS (SELECT week, day, count(DISTINCT user_id) AS dau FROM e GROUP BY 1, 2),
        |wk AS (SELECT week, count(DISTINCT user_id) AS wau FROM e GROUP BY 1),
        |a AS (SELECT week, count(*) AS n_days,
        |    CAST(sum(dau) AS BIGINT) AS sum_dau FROM d GROUP BY 1)
        |SELECT a.week AS week, n_days, wau,
        |  CAST(sum_dau AS DOUBLE) / n_days AS avg_dau,
        |  CAST(sum_dau AS DOUBLE) / n_days / wau AS stickiness
        |FROM a JOIN wk ON a.week = wk.week ORDER BY week""".stripMargin,
    "q_peak_days" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |x AS (SELECT *,
        |    lag(n_events) OVER (PARTITION BY event_type ORDER BY day) AS prev_n,
        |    lead(n_events) OVER (PARTITION BY event_type ORDER BY day) AS next_n
        |  FROM d)
        |SELECT event_type, day, n_events FROM x
        |WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
        |  AND n_events > prev_n AND n_events > next_n
        |ORDER BY event_type, day""".stripMargin,
    "q_inter_event_gaps" ->
      """WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us
        |  FROM events),
        |g AS (SELECT event_type,
        |    us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
        |  FROM e)
        |SELECT event_type, count(*) AS n_gaps,
        |  CAST(sum(gap_us) AS DOUBLE) / count(*) / 1e6 AS avg_gap_s,
        |  CAST(min(gap_us) // 1000000 AS BIGINT) AS min_gap_s,
        |  CAST(max(gap_us) // 1000000 AS BIGINT) AS max_gap_s
        |FROM g WHERE gap_us IS NOT NULL GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_modal_hour" ->
      """WITH h AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY event_type ORDER BY n DESC, hr) AS rn,
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total FROM h)
        |SELECT event_type, hr AS modal_hour, n AS n_at_mode,
        |  CAST(n AS DOUBLE) / total AS mode_share
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q_pareto_share" ->
      """WITH pc AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(rev_c) AS BIGINT) AS tot_rev_c,
        |    count(*) AS n_customers FROM pc),
        |r AS (SELECT rev_c, row_number() OVER (ORDER BY rev_c DESC, o_custkey) AS rnk,
        |    CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev_c
        |  FROM pc)
        |SELECT n_customers, CAST(max(rnk) AS BIGINT) AS n_top,
        |  CAST(max(rnk) AS DOUBLE) / n_customers AS cust_share,
        |  CAST(max(cum_rev_c) AS BIGINT) AS top_rev_c, tot_rev_c,
        |  CAST(max(cum_rev_c) AS DOUBLE) / tot_rev_c AS rev_share
        |FROM r, t WHERE (cum_rev_c - rev_c) * 5 < tot_rev_c * 4
        |GROUP BY n_customers, tot_rev_c""".stripMargin,
    "q_repeat_interval" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d
        |  FROM orders),
        |g AS (SELECT d, lag(d) OVER (PARTITION BY o_custkey
        |    ORDER BY d, o_orderkey) AS prev_d FROM o),
        |b AS (SELECT CAST(date_diff('day', prev_d, d) AS BIGINT) AS gap_days
        |  FROM g WHERE prev_d IS NOT NULL),
        |c AS (SELECT CASE WHEN gap_days <= 7 THEN 'a_0_7'
        |    WHEN gap_days <= 30 THEN 'b_8_30'
        |    WHEN gap_days <= 90 THEN 'c_31_90'
        |    ELSE 'd_90_plus' END AS bucket, gap_days FROM b)
        |SELECT bucket, count(*) AS n_gaps,
        |  CAST(sum(gap_days) AS DOUBLE) / count(*) AS avg_days,
        |  min(gap_days) AS min_days, max(gap_days) AS max_days
        |FROM c GROUP BY 1 ORDER BY bucket""".stripMargin,
    "text_hapax_ratio" ->
      s"""WITH $toksCte,
         |w AS (SELECT lang, unnest(toks) AS tok FROM t),
         |tf AS (SELECT lang, tok, count(*) AS n FROM w GROUP BY 1, 2)
         |SELECT lang, count(*) AS vocab_size,
         |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         |  CAST(sum(n) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         |    AS hapax_ratio
         |FROM tf GROUP BY 1 ORDER BY lang""".stripMargin,
    "ann_cell_balance" ->
      s"""WITH $embCte, $ivfScoredCtes,
         |asg AS (SELECT vec_id, c_id AS assigned_centroid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS rn
         |  FROM scored) WHERE rn = 1),
         |cells AS (SELECT assigned_centroid, count(*) AS n_vecs FROM asg GROUP BY 1),
         |t AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS n_total, count(*) AS n_cells
         |  FROM cells)
         |SELECT assigned_centroid, n_vecs,
         |  CAST(n_vecs AS DOUBLE) / n_total AS share,
         |  CAST(n_vecs AS DOUBLE) * n_cells / n_total AS imbalance
         |FROM cells, t ORDER BY assigned_centroid""".stripMargin,
    "ann_ivf_incremental" ->
      s"""WITH $embCte,
         |b AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
         |d AS (SELECT * FROM e WHERE vec_id % 10 = 0),
         |comp AS (SELECT label AS c_id, pos - 1 AS pos, x FROM (
         |  SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM b)),
         |cent AS (SELECT c_id, list(cx ORDER BY pos) AS cv FROM (
         |  SELECT c_id, pos, avg(x) AS cx FROM comp GROUP BY c_id, pos) GROUP BY c_id),
         |ba AS (SELECT vec_id, c_id AS assigned_centroid, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS rn
         |  FROM (SELECT vec_id, c_id,
         |    round(list_cosine_similarity(v, cv), 4) + 0.0 AS cos
         |    FROM b CROSS JOIN cent)) WHERE rn = 1),
         |da AS (SELECT vec_id, c_id AS assigned_centroid, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS rn
         |  FROM (SELECT vec_id, c_id,
         |    round(list_cosine_similarity(v, cv), 4) + 0.0 AS cos
         |    FROM d CROSS JOIN cent)) WHERE rn = 1),
         |bc AS (SELECT assigned_centroid, count(*) AS n_base,
         |  sum(CAST(round(cos * 10000) AS BIGINT)) AS sb FROM ba GROUP BY 1),
         |dc AS (SELECT assigned_centroid, count(*) AS n_delta,
         |  sum(CAST(round(cos * 10000) AS BIGINT)) AS sd FROM da GROUP BY 1)
         |SELECT assigned_centroid,
         |  coalesce(n_base, 0) AS n_base, coalesce(n_delta, 0) AS n_delta,
         |  round(coalesce(n_delta, 0) / CAST(coalesce(n_base, 0) + coalesce(n_delta, 0) AS DOUBLE), 4) + 0.0 AS delta_share,
         |  round(sb / n_base / 10000.0, 4) + 0.0 AS base_fit,
         |  round(sd / n_delta / 10000.0, 4) + 0.0 AS delta_fit,
         |  round(round(sb / n_base / 10000.0, 4) - round(sd / n_delta / 10000.0, 4), 4) + 0.0 AS fit_drop
         |FROM bc FULL JOIN dc USING (assigned_centroid)
         |ORDER BY assigned_centroid""".stripMargin,
    "vec_dim_stats" ->
      s"""WITH $embCte,
         |comp AS (SELECT pos - 1 AS dim, x FROM (
         |  SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e))
         |SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n,
         |  round(avg(x), 4) + 0.0 AS mean_x, round(stddev_samp(x), 4) + 0.0 AS sd_x,
         |  round(min(x), 4) + 0.0 AS min_x, round(max(x), 4) + 0.0 AS max_x
         |FROM comp GROUP BY 1 ORDER BY dim""".stripMargin,
    "sync_oldest_pending" ->
      s"""WITH $invCte, $durCte
         |SELECT cf, count(*) AS n_pending,
         |  CAST(sum(size_bytes) AS BIGINT) AS pending_bytes,
         |  CAST(min(epoch_us(mtime)) AS BIGINT) AS oldest_mtime_us,
         |  CAST(max(epoch_us(mtime)) AS BIGINT) AS newest_mtime_us
         |FROM dur s
         |WHERE NOT EXISTS (SELECT 1 FROM dur t
         |  WHERE t.generation % 3 <> 0 AND t.node_id <> 3 AND t.path = s.path)
         |GROUP BY cf ORDER BY cf""".stripMargin,
    "text_bpe_tokens" ->
      s"""WITH $toksCte,
         |w0 AS (SELECT unnest(toks) AS w FROM t),
         |pp AS (SELECT unnest(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS p
         |  FROM w0 WHERE len(w) >= 2),
         |mg AS (SELECT p FROM (SELECT p, count(*) AS c FROM pp GROUP BY p
         |  ORDER BY c DESC, p LIMIT 256)),
         |dw AS (SELECT doc_id, unnest(toks) AS w FROM t),
         |dp AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS p
         |  FROM dw WHERE len(w) >= 2),
         |brk AS (SELECT dp.doc_id, count(*) AS n_breaks FROM dp LEFT JOIN mg USING (p)
         |  WHERE mg.p IS NULL GROUP BY dp.doc_id),
         |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_ws_tokens,
         |  CAST(coalesce(list_sum(list_transform(toks, x -> len(x))), 0) AS BIGINT) AS n_tok_chars
         |  FROM t)
         |SELECT base.doc_id, n_ws_tokens, n_tok_chars,
         |  n_ws_tokens + coalesce(brk.n_breaks, 0) AS n_bpe_tokens,
         |  (1000000 * (n_ws_tokens + coalesce(brk.n_breaks, 0))) // n_ws_tokens AS pieces_per_word_ppm
         |FROM base LEFT JOIN brk USING (doc_id) ORDER BY base.doc_id""".stripMargin,
    "corpus_token_budget_bpe" ->
      s"""WITH $toksCte,
         |w0 AS (SELECT unnest(toks) AS w FROM t),
         |pp AS (SELECT unnest(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS p
         |  FROM w0 WHERE len(w) >= 2),
         |mg AS (SELECT p FROM (SELECT p, count(*) AS c FROM pp GROUP BY p
         |  ORDER BY c DESC, p LIMIT 256)),
         |dw AS (SELECT doc_id, unnest(toks) AS w FROM t),
         |dp AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS p
         |  FROM dw WHERE len(w) >= 2),
         |brk AS (SELECT dp.doc_id, count(*) AS n_breaks FROM dp LEFT JOIN mg USING (p)
         |  WHERE mg.p IS NULL GROUP BY dp.doc_id),
         |m AS (SELECT t.doc_id, t.lang,
         |  CAST(len(toks) + coalesce(brk.n_breaks, 0) AS BIGINT) AS n_toks,
         |  CAST(round(round((1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a')) / CAST(len(toks) AS DOUBLE)) * least(1.0, len(toks) / 50.0), 4) * 10000) AS BIGINT) AS qs
         |  FROM t LEFT JOIN brk USING (doc_id)),
         |tot AS (SELECT (CAST(sum(n_toks) AS BIGINT) * 6) // 10 AS budget FROM m),
         |r AS (SELECT *, sum(n_toks) OVER (ORDER BY qs DESC, doc_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks FROM m),
         |sel AS (SELECT r.* FROM r, tot WHERE cum_toks - n_toks < budget),
         |lt AS (SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS lang_toks FROM m GROUP BY lang)
         |SELECT lt.lang, lt.n_docs, count(*) AS n_selected, lt.lang_toks,
         |  CAST(sum(sel.n_toks) AS BIGINT) AS toks_selected,
         |  CAST(sum(sel.n_toks) AS DOUBLE) / lt.lang_toks AS tok_share
         |FROM sel JOIN lt ON sel.lang = lt.lang
         |GROUP BY lt.lang, lt.n_docs, lt.lang_toks ORDER BY lt.lang""".stripMargin,
    "corpus_curriculum_order" ->
      s"""WITH $toksCte,
         |m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
         |  CAST(round(round((1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a')) / CAST(len(toks) AS DOUBLE)) * least(1.0, len(toks) / 50.0), 4) * 10000) AS BIGINT) AS qs,
         |  CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS s,
         |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS y
         |  FROM t),
         |me AS (SELECT *, (206835 * greatest(s, 1) * n_toks
         |    - 1015 * n_toks * n_toks - 84600 * y * greatest(s, 1))
         |    // (greatest(s, 1) * n_toks) AS ease_m FROM m),
         |tot AS (SELECT (CAST(sum(n_toks) AS BIGINT) * 6) // 10 AS budget FROM me),
         |r AS (SELECT *, sum(n_toks) OVER (ORDER BY qs DESC, doc_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks FROM me),
         |sel AS (SELECT r.* FROM r, tot WHERE cum_toks - n_toks < budget),
         |ph AS (SELECT *, CAST(ntile(5) OVER (ORDER BY ease_m DESC, doc_id)
         |  AS BIGINT) AS phase FROM sel)
         |SELECT phase, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS phase_toks,
         |  CAST(max(ease_m) AS BIGINT) AS ease_hi,
         |  CAST(min(ease_m) AS BIGINT) AS ease_lo,
         |  CAST(sum(qs) AS DOUBLE) / count(*) / 10000.0 AS mean_quality
         |FROM ph GROUP BY phase ORDER BY phase""".stripMargin,
    "corpus_token_budget" ->
      s"""WITH $toksCte,
         |m AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_toks,
         |  CAST(round(round((1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a')) / CAST(len(toks) AS DOUBLE)) * least(1.0, len(toks) / 50.0), 4) * 10000) AS BIGINT) AS qs
         |  FROM t),
         |tot AS (SELECT (CAST(sum(n_toks) AS BIGINT) * 6) // 10 AS budget FROM m),
         |r AS (SELECT *, sum(n_toks) OVER (ORDER BY qs DESC, doc_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks FROM m),
         |sel AS (SELECT r.* FROM r, tot WHERE cum_toks - n_toks < budget),
         |lt AS (SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS lang_toks FROM m GROUP BY lang)
         |SELECT lt.lang, lt.n_docs, count(*) AS n_selected, lt.lang_toks,
         |  CAST(sum(sel.n_toks) AS BIGINT) AS toks_selected,
         |  CAST(sum(sel.n_toks) AS DOUBLE) / lt.lang_toks AS tok_share
         |FROM sel JOIN lt ON sel.lang = lt.lang
         |GROUP BY lt.lang, lt.n_docs, lt.lang_toks ORDER BY lt.lang""".stripMargin,
    "vec_cosine_hist" ->
      s"""WITH $embCte,
         |s AS (SELECT vec_id, v FROM e WHERE vec_id % 19 = 0),
         |p AS (SELECT CAST(floor(round(list_cosine_similarity(a.v, b.v), 4) * 10) AS BIGINT) AS band
         |  FROM s a JOIN s b ON a.vec_id < b.vec_id),
         |h AS (SELECT band, count(*) AS n_pairs FROM p GROUP BY band),
         |tp AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS tp FROM h)
         |SELECT band, CAST(band AS DOUBLE) / 10 AS cos_lo, n_pairs,
         |  CAST(n_pairs AS DOUBLE) / tp AS share
         |FROM h, tp ORDER BY band""".stripMargin,
    "q_trend_slope" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(day) AS d0 FROM d GROUP BY 1),
        |xy AS (SELECT d.event_type, CAST(d.day - b.d0 AS BIGINT) AS x, y
        |  FROM d JOIN b ON d.event_type = b.event_type),
        |s AS (SELECT event_type, count(*) AS n_days, CAST(sum(x) AS BIGINT) AS sx,
        |  CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
        |  CAST(sum(x * x) AS BIGINT) AS sxx FROM xy GROUP BY 1)
        |SELECT event_type, n_days,
        |  CAST(n_days * sxy - sx * sy AS DOUBLE) /
        |    nullif(CAST(n_days * sxx - sx * sx AS DOUBLE), 0.0) AS slope_per_day,
        |  CAST(sy AS DOUBLE) / n_days AS mean_daily
        |FROM s ORDER BY event_type""".stripMargin,
    "sync_catchup_eta" ->
      s"""WITH $invCte, $durCte,
         |tgt AS (SELECT path FROM dur WHERE generation % 3 <> 0 AND node_id <> 3),
         |p AS (SELECT cf, count(*) AS n_pending,
         |  CAST(sum(size_bytes) AS BIGINT) AS pending_bytes
         |  FROM dur s WHERE NOT EXISTS (SELECT 1 FROM tgt WHERE tgt.path = s.path)
         |  GROUP BY cf),
         |d AS (SELECT cf, CAST(sum(size_bytes) AS BIGINT) AS done_bytes,
         |  CAST(max(epoch_us(mtime)) - min(epoch_us(mtime)) AS BIGINT) AS span_us
         |  FROM dur s WHERE EXISTS (SELECT 1 FROM tgt WHERE tgt.path = s.path)
         |  GROUP BY cf)
         |SELECT p.cf, p.n_pending, p.pending_bytes, d.done_bytes,
         |  CAST(done_bytes AS DOUBLE) * 1e6 /
         |    nullif(CAST(span_us AS DOUBLE), 0.0) AS rate_bytes_s,
         |  CAST(pending_bytes AS DOUBLE) *
         |    nullif(CAST(span_us AS DOUBLE), 0.0) / done_bytes / 1e6 AS eta_s
         |FROM p LEFT JOIN d ON p.cf = d.cf ORDER BY p.cf""".stripMargin,
    "q_top_movers" ->
      """WITH wk AS (SELECT event_type,
        |  CAST(date_trunc('week', ts) AS DATE) AS week, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT *, lag(n, 1) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
        |  FROM wk),
        |d AS (SELECT event_type, week, n, prev_n, n - prev_n AS delta
        |  FROM l WHERE prev_n IS NOT NULL),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |  ORDER BY abs(delta) DESC, week) AS rn FROM d)
        |SELECT event_type, week, prev_n AS prev_week_n, n AS week_n,
        |  CAST(delta AS BIGINT) AS delta,
        |  round(CAST(delta AS DOUBLE) / nullif(CAST(prev_n AS DOUBLE), 0.0) * 100, 2)
        |    AS pct_change
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "mm_format_profile" ->
      """WITH m AS (SELECT
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |       ELSE 'video/mp4' END AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  n_chars % 640 AS width, n_chars % 480 AS height
        |  FROM documents)
        |SELECT mime, count(*) AS n_assets,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  min(n_bytes) AS min_bytes, max(n_bytes) AS max_bytes,
        |  CAST(sum(n_bytes) AS DOUBLE) / count(*) AS avg_bytes,
        |  CAST(count(DISTINCT (width, height)) AS BIGINT) AS n_geometries
        |FROM m GROUP BY mime ORDER BY mime""".stripMargin,
    "vec_sim_threshold_sweep" ->
      s"""WITH $embCte,
         |s AS (SELECT vec_id, v FROM e WHERE vec_id % 19 = 0),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  round(list_cosine_similarity(a.v, b.v), 4) + 0.0 AS cos
         |  FROM s a JOIN s b ON a.vec_id < b.vec_id),
         |th AS (SELECT * FROM (VALUES (0.2), (0.4), (0.6), (0.8)) t(threshold)),
         |f AS (SELECT threshold, vec_a, vec_b FROM p CROSS JOIN th
         |  WHERE cos >= threshold),
         |ne AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_edges
         |  FROM f GROUP BY 1),
         |nn AS (SELECT threshold, CAST(count(DISTINCT vec_id) AS BIGINT) AS n_nodes
         |  FROM (SELECT threshold, vec_a AS vec_id FROM f
         |        UNION ALL SELECT threshold, vec_b FROM f) GROUP BY 1)
         |SELECT th.threshold AS threshold, coalesce(ne.n_edges, 0) AS n_edges,
         |  coalesce(nn.n_nodes, 0) AS n_nodes
         |FROM th LEFT JOIN ne USING (threshold) LEFT JOIN nn USING (threshold)
         |ORDER BY threshold""".stripMargin,
    "q_weekend_effect" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, y, (isodow(day) IN (6, 7)) AS is_weekend FROM d),
        |s AS (SELECT event_type,
        |  CAST(sum(CASE WHEN is_weekend THEN y END) AS BIGINT) AS weekend_events,
        |  CAST(count(CASE WHEN is_weekend THEN 1 END) AS BIGINT) AS weekend_days,
        |  CAST(sum(CASE WHEN NOT is_weekend THEN y END) AS BIGINT) AS weekday_events,
        |  CAST(count(CASE WHEN NOT is_weekend THEN 1 END) AS BIGINT) AS weekday_days
        |  FROM w GROUP BY 1)
        |SELECT event_type, weekend_days, weekday_days,
        |  round(CAST(weekend_events AS DOUBLE) /
        |    nullif(CAST(weekend_days AS DOUBLE), 0.0), 2) AS avg_weekend,
        |  round(CAST(weekday_events AS DOUBLE) /
        |    nullif(CAST(weekday_days AS DOUBLE), 0.0), 2) AS avg_weekday,
        |  round(CAST(weekend_events AS DOUBLE) * weekday_days /
        |    nullif(CAST(weekday_events AS DOUBLE) * weekend_days, 0.0), 4)
        |    AS weekend_lift
        |FROM s ORDER BY event_type""".stripMargin,
    "text_char_entropy" ->
      """WITH c AS (SELECT doc_id, lang,
        |  list_transform(range(1, length(text) + 1), i -> substr(text, i, 1)) AS ch
        |  FROM documents),
        |d AS (SELECT doc_id, lang, CAST(len(ch) AS BIGINT) AS n_chars_counted,
        |  list_transform(list_distinct(ch),
        |    x -> CAST(len(list_filter(ch, y -> y = x)) AS DOUBLE)) AS counts
        |  FROM c)
        |SELECT doc_id, lang, n_chars_counted,
        |  CAST(len(counts) AS BIGINT) AS n_distinct_chars,
        |  round(log2(CAST(n_chars_counted AS DOUBLE)) -
        |    (CAST(list_aggregate(list_transform(counts,
        |       x -> CAST(round(x * log2(x) * 1000000) AS BIGINT)), 'sum') AS DOUBLE)
        |     / 1000000.0) / CAST(n_chars_counted AS DOUBLE), 4) AS char_entropy
        |FROM d ORDER BY doc_id""".stripMargin,
    "io_snapshot_diff" ->
      """WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
        |  CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT CAST(0 AS BIGINT) AS from_version, CAST(1 AS BIGINT) AS to_version,
        |  count(*) AS rows_added, CAST(sum(price_c) AS BIGINT) AS added_value_c,
        |  CAST(0 AS BIGINT) AS rows_removed, CAST(0 AS BIGINT) AS removed_value_c
        |FROM o WHERE d >= DATE '1998-01-01'
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS BIGINT),
        |  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |ORDER BY from_version""".stripMargin,
    "text_top_terms" ->
      s"""WITH $toksCte,
         |pairs AS (SELECT doc_id, unnest(toks) AS term FROM t),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM pairs GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM
         |  (SELECT DISTINCT doc_id, term FROM pairs) GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
         |s AS (SELECT doc_id, term,
         |  round(tf * ln(nd / df), 4) AS tfidf
         |  FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |  ORDER BY tfidf DESC, term) AS BIGINT) AS rnk FROM s)
         |SELECT doc_id, rnk, term, tfidf FROM r WHERE rnk <= 3
         |ORDER BY doc_id, rnk""".stripMargin,
    "corpus_near_dup_by_source" ->
      ("WITH " + graft.dedup.Dedup.candOracleBody + """,
        |inv AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM cand
        |  UNION ALL SELECT doc_b FROM cand))
        |SELECT d.source, count(*) AS n_docs,
        |  CAST(count(inv.doc_id) AS BIGINT) AS n_near_dup,
        |  CAST(count(inv.doc_id) AS DOUBLE) / count(*) AS near_dup_rate
        |FROM documents d LEFT JOIN inv ON d.doc_id = inv.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin),
    "corpus_dup_provenance" -> graft.dedup.Dedup.dupProvenanceOracleSql,
    "dedup_minhash_calibration" -> {
      val agree = (0 until graft.dedup.Dedup.MinhashK)
        .map(k => s"(CASE WHEN sa.sig$k = sb.sig$k THEN 1 ELSE 0 END)")
        .mkString(" + ")
      "WITH " + graft.dedup.Dedup.repsOracleCte + ",\n" +
        graft.dedup.Dedup.candOracleBodyFrom("reps") + s""",
        |sets AS (SELECT doc_id, list_sort(list_distinct(sh)) AS shs FROM s),
        |pj AS (SELECT CAST($agree AS BIGINT) AS n_agree,
        |  CASE WHEN len(list_distinct(list_concat(a.shs, b.shs))) > 0
        |    THEN CAST(round(CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(a.shs, b.shs))) AS DOUBLE)
        |      * 10000) AS BIGINT)
        |    ELSE CAST(10000 AS BIGINT) END AS jac_scaled
        |  FROM cand JOIN sets a ON cand.doc_a = a.doc_id
        |  JOIN sets b ON cand.doc_b = b.doc_id
        |  JOIN sig sa ON cand.doc_a = sa.doc_id
        |  JOIN sig sb ON cand.doc_b = sb.doc_id)
        |SELECT n_agree,
        |  CAST(n_agree AS DOUBLE) / ${graft.dedup.Dedup.MinhashK} AS est_jaccard,
        |  count(*) AS n_pairs,
        |  CAST(sum(jac_scaled) AS DOUBLE) / count(*) / 10000.0
        |    AS mean_exact_jaccard
        |FROM pj GROUP BY n_agree ORDER BY n_agree""".stripMargin
    },
    "mm_size_outliers" ->
      """WITH m AS (SELECT
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |       ELSE 'video/mp4' END AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents),
        |st AS (SELECT mime, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS s1,
        |  CAST(sum(n_bytes * n_bytes) AS BIGINT) AS s2 FROM m GROUP BY 1),
        |sd AS (SELECT mime, n, CAST(s1 AS DOUBLE) / n AS mean_b,
        |  sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) AS sd_b
        |  FROM st)
        |SELECT m.mime, count(*) AS n_assets,
        |  CAST(sum(CASE WHEN abs(m.n_bytes - sd.mean_b) > 2.0 * sd.sd_b
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(sum(CASE WHEN abs(m.n_bytes - sd.mean_b) > 2.0 * sd.sd_b
        |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS outlier_rate
        |FROM m JOIN sd USING (mime) GROUP BY m.mime ORDER BY m.mime""".stripMargin,
    "sync_twcs_compaction" ->
      s"""WITH $invCte, $durCte,
         |b AS (SELECT cf, snap_date AS bucket, count(*) AS n_files,
         |    CAST(sum(size_bytes) AS BIGINT) AS total_bytes
         |  FROM dur GROUP BY 1, 2),
         |m AS (SELECT *, bucket = max(bucket) OVER (PARTITION BY cf) AS is_current
         |  FROM b)
         |SELECT cf, bucket, n_files, total_bytes, is_current,
         |  (NOT is_current AND n_files > 1) AS needs_major,
         |  (is_current AND n_files >= 4) AS stcs_trigger
         |FROM m ORDER BY cf, bucket""".stripMargin,
    "graph_transitivity" -> graft.graph.GraphOps.transitivityOracleSql,
    "q_mann_whitney" ->
      """WITH cells AS (SELECT event_type, value,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM events GROUP BY 1, 2),
        |cum AS (SELECT event_type, ca, cb,
        |    sum(cb) OVER (PARTITION BY event_type ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cb
        |  FROM cells),
        |ag AS (SELECT event_type,
        |    CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
        |    CAST(sum(ca * (2 * (cum_cb - cb) + cb)) AS BIGINT) AS u2_a
        |  FROM cum GROUP BY 1)
        |SELECT event_type, n_a, n_b, u2_a,
        |  (CAST(u2_a AS DOUBLE) / 2.0 - CAST(n_a AS DOUBLE) * n_b / 2.0)
        |    / sqrt(CAST(n_a AS DOUBLE) * n_b * (n_a + n_b + 1) / 12.0) AS z
        |FROM ag WHERE n_a > 0 AND n_b > 0 ORDER BY event_type""".stripMargin,
    "q_kendall_tau" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
        |  FROM events GROUP BY 1, 2),
        |n AS (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1),
        |p AS (SELECT x.event_type AS event_type,
        |    CAST(sum(CASE WHEN x.s < y.s THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        |    CAST(sum(CASE WHEN x.s > y.s THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        |    CAST(sum(CASE WHEN x.s = y.s THEN 1 ELSE 0 END) AS BIGINT) AS ties
        |  FROM daily x JOIN daily y ON x.event_type = y.event_type AND x.day < y.day
        |  GROUP BY 1)
        |SELECT event_type, n_days, concordant, discordant, ties,
        |  (2.0 * (concordant - discordant)) / (n_days * (n_days - 1)) AS tau
        |FROM n JOIN p USING (event_type)
        |WHERE n_days > 1 ORDER BY event_type""".stripMargin,
    "io_prune_effectiveness" ->
      s"""WITH b AS (SELECT max(l_partkey) AS max_p, max(l_suppkey) AS max_s
         |  FROM lineitem),
         |c AS (SELECT (l_partkey * 256) // (max_p + 1) AS x8,
         |             (l_suppkey * 256) // (max_s + 1) AS y8
         |  FROM lineitem, b),
         |z AS (SELECT x8, y8, ${graft.sources.ZOrder.morton8Sql("x8", "y8")} AS z,
         |    (x8 BETWEEN 96 AND 127 AND y8 BETWEEN 96 AND 127) AS hit
         |  FROM c),
         |f AS (
         |  SELECT 'linear' AS layout, x8 // 4 AS file_id, count(*) AS n,
         |      min(x8) AS min_x, max(x8) AS max_x,
         |      min(y8) AS min_y, max(y8) AS max_y,
         |      CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS hits
         |    FROM z GROUP BY 1, 2
         |  UNION ALL
         |  SELECT 'zorder', z // 1024, count(*),
         |      min(x8), max(x8), min(y8), max(y8),
         |      CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
         |    FROM z GROUP BY 1, 2),
         |r AS (SELECT *,
         |    NOT (max_x < 96 OR min_x > 127 OR max_y < 96 OR min_y > 127) AS rd
         |  FROM f)
         |SELECT layout, count(*) AS n_files,
         |  CAST(sum(CASE WHEN rd THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
         |  CAST(sum(CASE WHEN rd THEN n ELSE 0 END) AS BIGINT) AS rows_read,
         |  CAST(sum(hits) AS BIGINT) AS rows_matched
         |FROM r GROUP BY 1 ORDER BY layout""".stripMargin,
    "q_theil_sen" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
        |  FROM events GROUP BY 1, 2),
        |sl AS (SELECT x.event_type AS event_type,
        |    CAST(y.s - x.s AS DOUBLE) / date_diff('day', x.day, y.day) AS slope,
        |    x.day AS dx, y.day AS dy
        |  FROM daily x JOIN daily y
        |    ON x.event_type = y.event_type AND x.day < y.day),
        |r AS (SELECT event_type, slope,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY slope, dx, dy) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n_pairs
        |  FROM sl)
        |SELECT event_type, n_pairs,
        |  slope AS slope_med_per_day
        |FROM r WHERE rn = (n_pairs + 1) // 2
        |ORDER BY event_type""".stripMargin,
    "q_spearman" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS u,
        |    count(*) AS v
        |  FROM events GROUP BY 1, 2),
        |rk AS (SELECT event_type,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY u)
        |      + count(*) OVER (PARTITION BY event_type, u) - 1 AS ru,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY v)
        |      + count(*) OVER (PARTITION BY event_type, v) - 1 AS rv
        |  FROM daily),
        |ag AS (SELECT event_type, count(*) AS n_days,
        |    CAST(sum(ru) AS HUGEINT) AS sx, CAST(sum(rv) AS HUGEINT) AS sy,
        |    CAST(sum(ru * rv) AS HUGEINT) AS sxy,
        |    CAST(sum(ru * ru) AS HUGEINT) AS sxx,
        |    CAST(sum(rv * rv) AS HUGEINT) AS syy
        |  FROM rk GROUP BY 1)
        |SELECT event_type, n_days,
        |  CAST(n_days * sxy - sx * sy AS DOUBLE) /
        |    nullif(sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE) *
        |      CAST(n_days * syy - sy * sy AS DOUBLE)), 0.0) AS rho
        |FROM ag WHERE n_days > 1 ORDER BY event_type""".stripMargin,
    "io_clustering_depth" ->
      s"""WITH b AS (SELECT max(l_partkey) AS max_p, max(l_suppkey) AS max_s
         |  FROM lineitem),
         |c AS (SELECT (l_partkey * 256) // (max_p + 1) AS x8,
         |             (l_suppkey * 256) // (max_s + 1) AS y8
         |  FROM lineitem, b),
         |z AS (SELECT x8, y8, ${graft.sources.ZOrder.morton8Sql("x8", "y8")} AS z
         |  FROM c),
         |f AS (
         |  SELECT 'linear' AS layout, x8 // 4 AS file_id,
         |      min(x8) AS min_x, max(x8) AS max_x
         |    FROM z GROUP BY 1, 2
         |  UNION ALL
         |  SELECT 'zorder', z // 1024, min(x8), max(x8)
         |    FROM z GROUP BY 1, 2),
         |d AS (SELECT layout, pos, CAST(sum(delta) AS BIGINT) AS d FROM (
         |    SELECT layout, min_x AS pos, 1 AS delta FROM f
         |    UNION ALL SELECT layout, max_x + 1, -1 FROM f) u
         |  GROUP BY 1, 2),
         |r AS (SELECT layout, sum(d) OVER (PARTITION BY layout ORDER BY pos
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM d),
         |md AS (SELECT layout, CAST(max(run) AS BIGINT) AS max_depth
         |  FROM r GROUP BY 1),
         |sp AS (SELECT layout, count(*) AS n_files,
         |    CAST(sum(max_x - min_x + 1) AS BIGINT) AS span_sum
         |  FROM f GROUP BY 1)
         |SELECT sp.layout AS layout, n_files, max_depth,
         |  round(CAST(span_sum AS DOUBLE) / 256.0, 4) AS avg_depth
         |FROM sp JOIN md USING (layout) ORDER BY layout""".stripMargin,
  )
}
