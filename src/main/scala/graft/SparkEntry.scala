package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (reproduction layer) and the
  * extension layers (relational, dedup, similarity, text, events/streaming)
  * registers one entry in [[queries]]; SQL-expressible ones register a
  * DuckDB oracle in [[oracleSql]] keyed identically. Column names and value
  * rounding are mirrored exactly between the Spark plan and the oracle SQL
  * (the driver sorts columns by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.FlightOps.qFlightReport(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reproduction layer (SURVEY.md §2.1–§2.5)
    "q_flight_report" -> (ops.FlightOps.qFlightReport _),
    "q_populate" -> (ops.FlightOps.qPopulate _),
    "q_secondary" -> (ops.FlightOps.qSecondary _),
    "q_filter_year" -> (ops.FlightOps.qFilterYear _),
    "q_filter_successful" -> (ops.FlightOps.qFilterSuccessful _),
    "q_group_month_sum_count" -> (ops.FlightOps.qGroupMonthSumCount _),
    "q_flight_aggregator" -> (ops.FlightOps.qFlightAggregator _),
    // Extension layer: relational operators (SURVEY.md §2.6 gaps)
    "q_join_broadcast" -> (ops.RelationalOps.qJoinBroadcast _),
    "q_join_sortmerge" -> (ops.RelationalOps.qJoinSortMerge _),
    "q_join_semi" -> (ops.RelationalOps.qJoinSemi _),
    "q_join_anti" -> (ops.RelationalOps.qJoinAnti _),
    "q_join_outer" -> (ops.RelationalOps.qJoinOuter _),
    "q_join_range" -> (ops.RelationalOps.qJoinRange _),
    "q_topk_per_group" -> (ops.RelationalOps.qTopkPerGroup _),
    "q_topk_custom" -> (ops.RelationalOps.qTopkCustom _),
    "q_window_running" -> (ops.RelationalOps.qWindowRunning _),
    "q_window_analytics" -> (ops.RelationalOps.qWindowAnalytics _),
    "q_rollup" -> (ops.RelationalOps.qRollup _),
    "q_cube" -> (ops.RelationalOps.qCube _),
    "q_distinct" -> (ops.RelationalOps.qDistinct _),
    "q_set_ops" -> (ops.RelationalOps.qSetOps _),
    "q_set_ops_all" -> (ops.RelationalOps.qSetOpsAll _),
    "q_unpivot" -> (ops.RelationalOps.qUnpivot _),
    "q_sort_limit" -> (ops.RelationalOps.qSortLimit _),
    "q_scalar_string_math" -> (ops.RelationalOps.qScalarStringMath _),
    "q_scalar_date" -> (ops.RelationalOps.qScalarDate _),
    "q_json_extract" -> (ops.RelationalOps.qJsonExtract _),
    "q_array_funcs" -> (ops.RelationalOps.qArrayFuncs _),
    "q_pricing_summary" -> (ops.RelationalOps.qPricingSummary _),
    "q_group_having" -> (ops.RelationalOps.qGroupHaving _),
    "q_stats_agg" -> (ops.RelationalOps.qStatsAgg _),
    "q_null_semantics" -> (ops.RelationalOps.qNullSemantics _),
    "q_sketch_accuracy" -> (ops.RelationalOps.qSketchAccuracy _),
    // Extension layer: event-time processing
    "q_events_tumbling" -> (ops.EventOps.qEventsTumbling _),
    "q_events_sliding" -> (ops.EventOps.qEventsSliding _),
    "q_events_session" -> (ops.EventOps.qEventsSession _),
    "q_events_asof" -> (ops.EventOps.qEventsAsof _),
    "q_events_interarrival" -> (ops.EventOps.qEventsInterarrival _),
    "q_events_timerange" -> (ops.EventOps.qEventsTimeRange _),
    "q_scd2" -> (ops.EventOps.qScd2 _),
    "q_events_resample" -> (ops.EventOps.qEventsResample _),
    "q_new_users_daily" -> (ops.EventOps.qNewUsersDaily _),
    "q_group_median" -> (ops.EventOps.qGroupMedian _),
    "q_percentile_bands" -> (ops.EventOps.qPercentileBands _),
    "q_mode" -> (ops.AnalyticsOps.qMode _),
    "q_trend_slope" -> (ops.AnalyticsOps.qTrendSlope _),
    "q_rfm_segments" -> (ops.AnalyticsOps.qRfmSegments _),
    "q_gini_spend" -> (ops.AnalyticsOps.qGiniSpend _),
    "q_rolling_median" -> (ops.EventOps.qRollingMedian _),
    "q_degree_assortativity" -> (ops.GraphOps.qDegreeAssortativity _),
    "q_assoc_rules" -> (ops.AnalyticsOps.qAssocRules _),
    "q_benford" -> (ops.AnalyticsOps.qBenford _),
    "q_cusum_changepoint" -> (ops.EventOps.qCusumChangepoint _),
    "q_dow_hour_heatmap" -> (ops.EventOps.qDowHourHeatmap _),
    "q_mad_robust" -> (ops.EventOps.qMadRobust _),
    "q_type_bitmask" -> (ops.AnalyticsOps.qTypeBitmask _),
    "q_string_agg" -> (ops.AnalyticsOps.qStringAgg _),
    "q_interval_merge" -> (ops.EventOps.qIntervalMerge _),
    "q_attribution" -> (ops.EventOps.qAttribution _),
    "q_time_weighted" -> (ops.EventOps.qTimeWeighted _),
    "q_peak_concurrency" -> (ops.EventOps.qPeakConcurrency _),
    // Graph analytics: integer micro-unit PageRank over transition edges
    // + degree-ordered triangle counting
    "q_pagerank" -> (ops.GraphOps.qPagerank _),
    "q_triangle_count" -> (ops.GraphOps.qTriangleCount _),
    // Extension layer: text analysis
    "q_text_quality" -> (ops.TextOps.qTextQuality _),
    "q_lang_id" -> (ops.TextOps.qLangId _),
    "q_token_topk" -> (ops.TextOps.qTokenTopk _),
    "q_doc_fingerprint" -> (ops.TextOps.qDocFingerprint _),
    "q_bpe_token_count" -> (ops.TextOps.qBpeTokenCount _),
    "q_corpus_clean" -> (ops.TextOps.qCorpusClean _),
    "q_decontaminate" -> (ops.TextOps.qDecontaminate _),
    "q_sample_deterministic" -> (ops.TextOps.qSampleDeterministic _),
    "q_chunk_documents" -> (ops.TextOps.qChunkDocuments _),
    "q_repetition_score" -> (ops.TextOps.qRepetitionScore _),
    "q_tfidf_topterms" -> (ops.TextOps.qTfidfTopTerms _),
    "q_quota_sample" -> (ops.TextOps.qQuotaSample _),
    "q_shard_pack" -> (ops.TextOps.qShardPack _),
    "q_shard_publish" -> (ops.TextOps.qShardPublish _),
    "q_train_split" -> (ops.TextOps.qTrainSplit _),
    "q_stratified_sample" -> (ops.TextOps.qStratifiedSample _),
    "q_quantile_filter" -> (ops.TextOps.qQuantileFilter _),
    "q_term_search" -> (ops.TextOps.qTermSearch _),
    "q_bm25" -> (ops.TextOps.qBm25 _),
    "q_hll_distinct" -> (ops.TextOps.qHllDistinct _),
    "q_perplexity_filter" -> (ops.TextOps.qPerplexityFilter _),
    "q_sliding_windows" -> (ops.TextOps.qSlidingWindows _),
    "q_inverted_index" -> (ops.TextOps.qInvertedIndex _),
    "q_pipeline_e2e" -> (ops.TextOps.qPipelineE2e _),
    "q_text_normalize" -> (ops.TextOps.qTextNormalize _),
    // Extension layer: deduplication
    "q_dedup_exact" -> (ops.DedupOps.qDedupExact _),
    "q_dedup_ngram_jaccard" -> (ops.DedupOps.qDedupNgramJaccard _),
    "q_dedup_minhash_lsh" -> (ops.DedupOps.qDedupMinhashLsh _),
    "q_minhash_estimate" -> (ops.DedupOps.qMinhashEstimate _),
    "q_fuzzy_match" -> (ops.DedupOps.qFuzzyMatch _),
    "q_fuzzy_match2" -> (ops.DedupOps.qFuzzyMatch2 _),
    "q_dedup_incremental" -> (ops.DedupOps.qDedupIncremental _),
    "q_lang_rebalance" -> (ops.TextOps.qLangRebalance _),
    "q_bloom_prune" -> (ops.SourceSinkOps.qBloomPruneJoin _),
    "q_observe_metrics" -> (ops.SourceSinkOps.qObserveMetrics _),
    "q_cbo_stats" -> (ops.SourceSinkOps.qCboStats _),
    "q_dedup_simhash" -> (ops.DedupOps.qDedupSimhash _),
    "q_dedup_embedding_cosine" -> (ops.DedupOps.qDedupEmbeddingCosine _),
    "q_dedup_clusters" -> (ops.DedupOps.qDedupClusters _),
    "q_dedup_apply" -> (ops.DedupOps.qDedupApply _),
    "q_substr_dedup" -> (ops.DedupOps.qSubstrDedup _),
    "q_containment_dedup" -> (ops.DedupOps.qContainmentDedup _),
    "q_markov_transitions" -> (ops.EventOps.qMarkovTransitions _),
    "q_anomaly_zscore" -> (ops.EventOps.qAnomalyZscore _),
    // Extension layer: similarity search
    "q_ann_bruteforce" -> (ops.SimilarityOps.qAnnBruteforce _),
    "q_ann_ivf" -> (ops.SimilarityOps.qAnnIvf _),
    "q_ann_lsh" -> (ops.SimilarityOps.qAnnLsh _),
    "q_embed_quantize" -> (ops.SimilarityOps.qEmbedQuantize _),
    "q_kmeans" -> (ops.SimilarityOps.qKmeans _),
    "q_ann_ivf_kmeans" -> (ops.SimilarityOps.qAnnIvfKmeans _),
    "q_semantic_dedup" -> (ops.SimilarityOps.qSemanticDedup _),
    "q_knn_graph" -> (ops.SimilarityOps.qKnnGraph _),
    "q_pmi_collocations" -> (ops.TextOps.qPmiCollocations _),
    "q_priority_sample" -> (ops.TextOps.qPrioritySample _),
    "q_copurchase_communities" -> (ops.GraphOps.qCopurchaseCommunities _),
    "q_stream_topk" -> (streaming.EventStream.qStreamTopk _),
    "q_ewma_smooth" -> (ops.EventOps.qEwmaSmooth _),
    "q_shortest_path" -> (ops.GraphOps.qShortestPath _),
    "q_pivot" -> (ops.RelationalOps.qPivot _),
    "q_seq_pack" -> (ops.TextOps.qSeqPack _),
    "q_bpe_merges" -> (ops.TextOps.qBpeMerges _),
    "q_mutual_info" -> (ops.TextOps.qMutualInfo _),
    "q_vocab_coverage" -> (ops.TextOps.qVocabCoverage _),
    "q_langid_confusion" -> (ops.TextOps.qLangidConfusion _),
    "q_chi_square" -> (ops.TextOps.qChiSquare _),
    "q_bootstrap_ci" -> (ops.EventOps.qBootstrapCi _),
    "q_span_corruption" -> (ops.TextOps.qSpanCorruption _),
    "q_winnow_fingerprint" -> (ops.TextOps.qWinnowFingerprint _),
    "q_ngram_novelty" -> (ops.TextOps.qNgramNovelty _),
    "q_dataset_card" -> (ops.TextOps.qDatasetCard _),
    "q_label_smooth" -> (ops.SimilarityOps.qLabelSmooth _),
    "q_next_event_examples" -> (ops.EventOps.qNextEventExamples _),
    "q_walk_corpus" -> (ops.GraphOps.qWalkCorpus _),
    "q_token_zipf" -> (ops.TextOps.qTokenZipf _),
    // Source/sink closure (S1/S2 CSV, S6 text) + scale techniques
    "q_csv_ingest" -> (ops.SourceSinkOps.qCsvIngest _),
    "q_json_ingest" -> (ops.SourceSinkOps.qJsonIngest _),
    "q_orc_ingest" -> (ops.SourceSinkOps.qOrcIngest _),
    "q_csv_malformed" -> (ops.SourceSinkOps.qCsvMalformed _),
    "q_schema_evolution" -> (ops.SourceSinkOps.qSchemaEvolution _),
    "q_federated_join" -> (ops.SourceSinkOps.qFederatedJoin _),
    "q_sql_surface" -> (ops.SourceSinkOps.qSqlSurface _),
    "q_managed_table" -> (ops.SourceSinkOps.qManagedTable _),
    "q_wide_csv_report" -> (ops.SourceSinkOps.qWideCsvReport _),
    "q_keyed_lookup" -> (ops.SourceSinkOps.qKeyedLookup _),
    "q_text_report" -> (ops.SourceSinkOps.qTextReport _),
    "q_skew_salted_agg" -> (ops.SourceSinkOps.qSkewSaltedAgg _),
    "q_skew_salted_join" -> (ops.SourceSinkOps.qSkewSaltedJoin _),
    "q_skew_aqe_join" -> (ops.SourceSinkOps.qSkewAqeJoin _),
    "q_zorder_key" -> (ops.SourceSinkOps.qZorderKey _),
    "q_grouping_sets" -> (ops.SourceSinkOps.qGroupingSets _),
    // Layout/maintenance surface (partition pruning, compaction, DPP,
    // bucketed co-located join, keyed MERGE)
    "q_partition_prune" -> (ops.SourceSinkOps.qPartitionPrune _),
    "q_compact" -> (ops.SourceSinkOps.qCompact _),
    "q_compact_sized" -> (ops.SourceSinkOps.qCompactSized _),
    "q_dpp_prune" -> (ops.SourceSinkOps.qDppPrune _),
    "q_bucketed_join" -> (ops.SourceSinkOps.qBucketedJoin _),
    "q_upsert" -> (ops.SourceSinkOps.qUpsert _),
    // Approximate-search quality as a driver invariant
    "q_ann_recall" -> (ops.SimilarityOps.qAnnRecall _),
    // Structured Streaming, driver-checked via an AvailableNow drain
    "q_stream_ingest" -> (streaming.EventStream.qStreamIngest _),
    "q_stream_window" -> (streaming.EventStream.qStreamWindow _),
    "q_stream_join" -> (streaming.EventStream.qStreamJoin _),
    "q_stream_sessionize" -> (streaming.EventStream.qStreamSessionize _),
    "q_stream_dedup" -> (streaming.EventStream.qStreamDedup _),
    "q_stream_upsert" -> (streaming.EventStream.qStreamUpsert _),
    // Count-min sketch heavy hitters (estimates hash-pinned + invariants)
    "q_heavy_hitters" -> (ops.TextOps.qHeavyHitters _),
    "q_bigram_lm" -> (ops.TextOps.qBigramLm _),
    // Extension layer: multimodal binary columns
    "q_multimodal_meta" -> (ops.MultimodalOps.qMultimodalMeta _),
    "q_image_features" -> (ops.MultimodalOps.qImageFeatures _),
    "q_audio_frames" -> (ops.MultimodalOps.qAudioFrames _),
    // Multi-join decision-support (TPC-H Q3/Q5 shapes, exact-integer money)
    "q_top_orders" -> (ops.AnalyticsOps.qTopOrders _),
    "q_region_volume" -> (ops.AnalyticsOps.qRegionVolume _),
    "q_value_histogram" -> (ops.AnalyticsOps.qValueHistogram _),
    "q_data_quality" -> (ops.AnalyticsOps.qDataQuality _),
    "q_funnel" -> (ops.AnalyticsOps.qFunnel _),
    "q_cohort_retention" -> (ops.AnalyticsOps.qCohortRetention _),
    "q_copurchase" -> (ops.AnalyticsOps.qCopurchase _),
    "q_spend_deciles" -> (ops.AnalyticsOps.qSpendDeciles _),
    "q_skyline" -> (ops.AnalyticsOps.qSkyline _),
    "q_incr_agg" -> (ops.AnalyticsOps.qIncrAgg _),
    "q_group_size_dist" -> (ops.AnalyticsOps.qGroupSizeDist _),
    "q_wow_change" -> (ops.AnalyticsOps.qWowChange _),
    // Corpus scrubbing: PII redaction, domain blocklist, paragraph dedup
    "q_pii_redact" -> (ops.ScrubOps.qPiiRedact _),
    "q_url_filter" -> (ops.ScrubOps.qUrlFilter _),
    "q_paragraph_dedup" -> (ops.ScrubOps.qParagraphDedup _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.FlightOracles.all ++ ops.RelationalOracles.all ++
      ops.EventOracles.all ++ ops.PipelineOracles.all ++
      ops.SourceSinkOracles.all ++ ops.AnalyticsOracles.all ++
      ops.ScrubOracles.all
}
