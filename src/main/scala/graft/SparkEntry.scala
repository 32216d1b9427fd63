package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * DataFrame program; `oracleSql` maps the same key to DuckDB SQL the driver
  * runs over the same parquet tables. Column names and float rounding are
  * kept identical on both sides (SURVEY.md §6).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full reference pipeline end to end: events → OHLC bars →
    * rolling CCI → crossover signals → grid trade simulation → strategy
    * aggregation → best-condition-per-series tables. */
  def entry(spark: SparkSession): DataFrame =
    CciPipeline.bestOf(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.q01PricingSummary _),
    "q02_filter_project" -> (Relational.q02FilterProject _),
    "q03_shipping_priority" -> (Relational.q03ShippingPriority _),
    "q05_local_supplier" -> (Relational.q05LocalSupplier _),
    "q06_forecast_revenue" -> (Relational.q06ForecastRevenue _),
    "q07_semi_join" -> (Relational.q07SemiJoin _),
    "q08_anti_join" -> (Relational.q08AntiJoin _),
    "q09_rollup" -> (Relational.q09Rollup _),
    "q10_window_rank" -> (Relational.q10WindowRank _),
    "q11_running_sum" -> (Relational.q11RunningSum _),
    "q12_distinct_topk" -> (Relational.q12DistinctTopk _),
    "q13_quantiles" -> (Relational.q13Quantiles _),
    "q14_cross_ref" -> (Relational.q14CrossRef _),
    "r01_symbol_dim" -> (CciPipeline.symbolDim _),
    "r02_ohlc_bars" -> (CciPipeline.ohlcBarsQuery _),
    "r03_upsert_keep_last" -> (CciPipeline.upsertKeepLast _),
    "r04_cci" -> (CciPipeline.cciQuery _),
    "r05_signals" -> (CciPipeline.signalsQuery _),
    "r06_trade_sim" -> (CciPipeline.tradesQuery _),
    "r07_strategy_agg" -> (CciPipeline.strategyAggQuery _),
    "r08_best_of" -> (CciPipeline.bestOf _),
    "r09_recommendations" -> (CciPipeline.recommendations _),
    "r10_candidate_filter" -> (CciPipeline.candidateFilter _),
    "r11_net_revenue" -> (CciPipeline.netRevenue _),
    "d01_dedup_exact" -> (graft.dedup.Dedup.exact _),
    "d02_dedup_ngram_jaccard" -> (graft.dedup.Dedup.ngramJaccard _),
    "d03_dedup_minhash_lsh" -> (graft.dedup.Dedup.minhashLsh _),
    "d04_dedup_simhash" -> (graft.dedup.Dedup.simhash _),
    "d05_dedup_embedding" -> (graft.dedup.Dedup.embeddingCosine _),
    "s01_ann_bruteforce" -> (graft.similarity.Similarity.bruteForceTopK _),
    "s02_ann_lsh" -> (graft.similarity.Similarity.lshTopK _),
    "t01_token_count" -> (TextAnalysis.tokenCount _),
    "t02_quality_score" -> (TextAnalysis.qualityScore _),
    "t03_lang_id" -> (TextAnalysis.langId _),
    "t04_fingerprint" -> (TextAnalysis.fingerprint _),
    "m01_multimodal_meta" -> (graft.multimodal.Multimodal.mediaMeta _),
    "v01_sessionize" -> (graft.streaming.EventStream.sessionize _),
    "q15_pivot" -> (Extras.pivotCounts _),
    "q16_json_extract" -> (Extras.jsonExtract _),
    "q17_range_window" -> (Extras.rangeWindow _),
    "r12_csv_roundtrip" -> (Extras.csvRoundtrip _),
    "q18_typed_agg" -> (Typed.typedStats _),
    "a01_approx_sketches" -> (Typed.approxSketches _),
    "q19_correlated_avg" -> (Extras.correlatedAvg _),
    "r13_order_lifecycle" -> (CciPipeline.orderLifecycle _),
    "s03_ann_ivf" -> (graft.similarity.Similarity.ivfTopK _),
    "q20_ntile" -> (Extras.ntileBuckets _),
    "q21_cube" -> (Extras.cubeAgg _),
    "p01_profile" -> (Extras.profileColumns _),
    "r14_json_roundtrip" -> (Extras.jsonRoundtrip _),
    "q22_asof_join" -> (Extras.asofJoin _),
    "ml01_trade_features" -> (graft.ml.Features.tradeFeaturesQuery _),
    "ml02_win_model" -> (graft.ml.Features.trainWinModel _),
    "ml03_kmeans_cells" -> ((s: org.apache.spark.sql.SparkSession, d: String) => graft.ml.Features.kmeansCells(s, d)),
    "r15_history_filter" -> (CciPipeline.historyFilter _),
    "p02_train_test_split" -> (Extras.trainTestSplit _),
    "q23_set_ops" -> (Extras.setOps _),
    "d06_fuzzy_levenshtein" -> (graft.dedup.Dedup.fuzzyLevenshtein _),
    "r16_partitioned_sink" -> (Extras.partitionedSink _),
    "r17_incremental_merge" -> (Extras.incrementalMerge _),
    "q24_time_dims" -> (Extras.timeDims _),
    "r18_order_reconcile" -> (CciPipeline.orderReconcile _),
    "r19_latest_snapshot" -> (Extras.latestSnapshot _),
    "r20_history_grid_sim" -> (CciPipeline.tradesHistoryGrid _),
    "r21_fetch_watermark" -> (CciPipeline.fetchWatermark _),
    "d07_dedup_clusters" -> (graft.dedup.Dedup.dedupClusters _),
    "d08_dedup_incremental" -> (graft.dedup.Dedup.incrementalDedup _),
    "d09_dedup_embedding_ivf" -> (graft.similarity.Similarity.embeddingDedupIvf _),
    "t05_vocab" -> (TextAnalysis.vocab _),
    "t06_decontaminate" -> (TextAnalysis.decontaminate _),
    "p03_curated_corpus" -> (Curation.curatedCorpus _),
    "r22_trading_calendar" -> (CciPipeline.tradingCalendar _),
    "r24_orc_roundtrip" -> (Extras.orcRoundtrip _),
    "p04_sequence_pack" -> (Curation.sequencePack _),
    "p05_stratified_sample" -> (Curation.stratifiedSample _),
    "m02_payload_features" -> (graft.multimodal.Multimodal.payloadFeatures _),
    "m03_frame_sample" -> (graft.multimodal.Multimodal.frameSamples _),
    "s04_ann_ivf_trained" -> ((s: SparkSession, d: String) =>
      graft.similarity.Similarity.ivfTrainedTopK(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Relational.q01Sql,
    "q02_filter_project" -> Relational.q02Sql,
    "q03_shipping_priority" -> Relational.q03Sql,
    "q05_local_supplier" -> Relational.q05Sql,
    "q06_forecast_revenue" -> Relational.q06Sql,
    "q07_semi_join" -> Relational.q07Sql,
    "q08_anti_join" -> Relational.q08Sql,
    "q09_rollup" -> Relational.q09Sql,
    "q10_window_rank" -> Relational.q10Sql,
    "q11_running_sum" -> Relational.q11Sql,
    "q12_distinct_topk" -> Relational.q12Sql,
    "q13_quantiles" -> Relational.q13Sql,
    "q14_cross_ref" -> Relational.q14Sql,
    "r01_symbol_dim" -> CciPipeline.symbolDimSql,
    "r02_ohlc_bars" -> CciPipeline.ohlcBarsSql,
    "r03_upsert_keep_last" -> CciPipeline.upsertKeepLastSql,
    "r04_cci" -> CciPipeline.cciSql,
    "r05_signals" -> CciPipeline.signalsSql,
    "r06_trade_sim" -> CciPipeline.tradesSql,
    "r07_strategy_agg" -> CciPipeline.strategyAggSql,
    "r08_best_of" -> CciPipeline.bestOfSql,
    "r09_recommendations" -> CciPipeline.recommendationsSql,
    "r10_candidate_filter" -> CciPipeline.candidateFilterSql,
    "r11_net_revenue" -> CciPipeline.netRevenueSql,
    "d01_dedup_exact" -> graft.dedup.Dedup.exactSql,
    "d02_dedup_ngram_jaccard" -> graft.dedup.Dedup.ngramJaccardSql,
    "d03_dedup_minhash_lsh" -> graft.dedup.Dedup.minhashLshSql,
    "d04_dedup_simhash" -> graft.dedup.Dedup.simhashSql,
    "d05_dedup_embedding" -> graft.dedup.Dedup.embeddingCosineSql,
    "s01_ann_bruteforce" -> graft.similarity.Similarity.bruteForceTopKSql,
    // s02_ann_lsh: approximate by construction -> rows-only check
    "t01_token_count" -> TextAnalysis.tokenCountSql,
    "t02_quality_score" -> TextAnalysis.qualityScoreSql,
    "t03_lang_id" -> TextAnalysis.langIdSql,
    "t04_fingerprint" -> TextAnalysis.fingerprintSql,
    "m01_multimodal_meta" -> graft.multimodal.Multimodal.mediaMetaSql,
    "v01_sessionize" -> graft.streaming.EventStream.sessionizeSql,
    "q15_pivot" -> Extras.pivotCountsSql,
    "q16_json_extract" -> Extras.jsonExtractSql,
    "q17_range_window" -> Extras.rangeWindowSql,
    "r12_csv_roundtrip" -> Extras.csvRoundtripSql,
    "q18_typed_agg" -> Typed.typedStatsSql,
    // a01_approx_sketches: engine-specific sketches -> rows-only check
    "q19_correlated_avg" -> Extras.correlatedAvgSql,
    "r13_order_lifecycle" -> CciPipeline.orderLifecycleSql,
    "s03_ann_ivf" -> graft.similarity.Similarity.ivfTopKSql,
    "q20_ntile" -> Extras.ntileBucketsSql,
    "q21_cube" -> Extras.cubeAggSql,
    "p01_profile" -> Extras.profileColumnsSql,
    "r14_json_roundtrip" -> Extras.jsonRoundtripSql,
    "q22_asof_join" -> Extras.asofJoinSql,
    // ml01-ml03: MLlib estimators (scaler moments / LR optimizer / KMeans)
    // are not SQL-expressible -> rows-only checks; quality asserted in tests
    "r15_history_filter" -> CciPipeline.historyFilterSql,
    "p02_train_test_split" -> Extras.trainTestSplitSql,
    "q23_set_ops" -> Extras.setOpsSql,
    "d06_fuzzy_levenshtein" -> graft.dedup.Dedup.fuzzyLevenshteinSql,
    "r16_partitioned_sink" -> Extras.partitionedSinkSql,
    "r17_incremental_merge" -> Extras.incrementalMergeSql,
    "q24_time_dims" -> Extras.timeDimsSql,
    "r18_order_reconcile" -> CciPipeline.orderReconcileSql,
    "r19_latest_snapshot" -> Extras.latestSnapshotSql,
    "r20_history_grid_sim" -> CciPipeline.tradesHistoryGridSql,
    "r21_fetch_watermark" -> CciPipeline.fetchWatermarkSql,
    "d07_dedup_clusters" -> graft.dedup.Dedup.dedupClustersSql,
    "d08_dedup_incremental" -> graft.dedup.Dedup.incrementalDedupSql,
    "d09_dedup_embedding_ivf" -> graft.similarity.Similarity.embeddingDedupIvfSql,
    "t05_vocab" -> TextAnalysis.vocabSql,
    "t06_decontaminate" -> TextAnalysis.decontaminateSql,
    "p03_curated_corpus" -> Curation.curatedCorpusSql,
    "r22_trading_calendar" -> CciPipeline.tradingCalendarSql,
    "r24_orc_roundtrip" -> Extras.orcRoundtripSql,
    "p04_sequence_pack" -> Curation.sequencePackSql,
    "p05_stratified_sample" -> Curation.stratifiedSampleSql,
    "m02_payload_features" -> graft.multimodal.Multimodal.payloadFeaturesSql,
    "m03_frame_sample" -> graft.multimodal.Multimodal.frameSamplesSql
  )
}
