package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{Analytics, Custom, Functions, LlmPipeline, Quant, Relational, SqlApi, Stateful, Streaming, Windows}
import graft.oracle.OracleSql

/** Driver contract — see /root/repo/SURVEY.md §2 (the operator inventory)
  * and §7 (build plan). Every operator is a pure
  * `(SparkSession, sfDir) => DataFrame`; oracle-gated entries carry a
  * DuckDB SQL twin in [[OracleSql]] with identical column names, rounding,
  * and total row order (§5.3 determinism contract).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggPricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 scans + interchange formats
    "scan_parquet" -> (Relational.scanParquet _),
    "scan_pruned" -> (Relational.scanPruned _),
    "source_csv" -> (graft.io.Formats.sourceCsv _),
    "source_json" -> (graft.io.Formats.sourceJson _),
    "source_orc" -> (graft.io.Formats.sourceOrc _),
    "source_kinesis_envelope" -> (graft.io.Formats.sourceKinesisEnvelope _),
    "sink_partitioned" -> (graft.io.Formats.sinkPartitioned _),
    // §2.2 projection / filter
    "project_compute" -> (Relational.projectCompute _),
    "filter_pred" -> (Relational.filterPred _),
    "filter_regex" -> (Relational.filterRegex _),
    // §2.3 joins
    "join_broadcast" -> (Relational.joinBroadcast _),
    "join_sortmerge" -> (Relational.joinSortmerge _),
    "join_shuffledhash" -> (Relational.joinShuffledhash _),
    "join_left" -> (Relational.joinLeft _),
    "join_full" -> (Relational.joinFull _),
    "join_semi" -> (Relational.joinSemi _),
    "join_bloom_prefilter" -> (Relational.joinBloomPrefilter _),
    "join_anti" -> (Relational.joinAnti _),
    "join_theta_range" -> (Relational.joinThetaRange _),
    "join_asof" -> (Relational.joinAsof _),
    "join_asof_forward" -> (Relational.joinAsofForward _),
    // §2.4 aggregations
    "agg_pricing_summary" -> (Relational.aggPricingSummary _),
    "agg_global" -> (Relational.aggGlobal _),
    "agg_distinct" -> (Relational.aggDistinct _),
    "agg_approx_distinct" -> (Relational.aggApproxDistinct _),
    "agg_rollup" -> (Relational.aggRollup _),
    "agg_cube" -> (Relational.aggCube _),
    "agg_groupingsets" -> (Relational.aggGroupingSets _),
    "agg_stats" -> (Relational.aggStats _),
    "agg_percentile" -> (Relational.aggPercentile _),
    "agg_approx_percentile" -> (Relational.aggApproxPercentile _),
    "agg_heavy_hitters_cms" -> (Relational.aggHeavyHittersCms _),
    "agg_mode" -> (Relational.aggMode _),
    "agg_collect" -> (Relational.aggCollect _),
    "agg_pivot" -> (Relational.aggPivot _),
    "agg_unpivot" -> (Relational.aggUnpivot _),
    // §2.5 windows
    "win_rank" -> (Windows.winRank _),
    "win_lag_lead" -> (Windows.winLagLead _),
    "win_running" -> (Windows.winRunning _),
    "win_moving_range" -> (Windows.winMovingRange _),
    "win_topk_per_group" -> (Windows.winTopkPerGroup _),
    "win_topk_native" -> (Windows.winTopkNative _),
    "win_first_last" -> (Windows.winFirstLast _),
    "win_dist" -> (Windows.winDist _),
    "ts_gapfill" -> (Windows.tsGapfill _),
    // §2.6 sorts / limits
    "sort_multi" -> (Relational.sortMulti _),
    "topk_global" -> (Relational.topkGlobal _),
    "limit_offset" -> (Relational.limitOffset _),
    // §2.7 set ops / dedup
    "set_union" -> (Relational.setUnion _),
    "set_intersect" -> (Relational.setIntersect _),
    "set_except" -> (Relational.setExcept _),
    "dedup_exact_rows" -> (Relational.dedupExactRows _),
    "cdc_upsert_latest" -> (Relational.cdcUpsertLatest _),
    // §2.8 scalar function families
    "fn_string" -> (Functions.fnString _),
    "fn_date" -> (Functions.fnDate _),
    "fn_math" -> (Functions.fnMath _),
    "fn_cond" -> (Functions.fnCond _),
    "fn_array" -> (Functions.fnArray _),
    "fn_map_json" -> (Functions.fnMapJson _),
    "fn_hash" -> (Functions.fnHash _),
    "fn_hash_seeded" -> (Functions.fnHashSeeded _),
    "fn_bitwise" -> (Functions.fnBitwise _),
    // §2.11 UDF / UDTF surface
    "udf_scalar" -> (Functions.udfScalar _),
    "udtf_explode" -> (Functions.udtfExplode _),
    // §2.9 streaming (batch-equivalent forms; runtime parity in ScalaTest)
    "stream_tumbling_1h" -> (Streaming.streamTumbling1h _),
    "stream_sliding" -> (Streaming.streamSliding _),
    "stream_session_30m" -> (Streaming.streamSession30m _),
    "stream_dedup_watermark" -> (Streaming.streamDedupWatermark _),
    "stream_static_join" -> (Streaming.streamStaticJoin _),
    "stream_stream_join" -> (Streaming.streamStreamJoin _),
    "stream_stateful_session" -> (Stateful.streamStatefulSession _),
    "stream_stateful_tws" -> (Stateful.streamStatefulTws _),
    // §2.10 LLM-data-pipeline operators
    "dedup_exact_sha" -> (LlmPipeline.dedupExactSha _),
    "dedup_near_minhash" -> (LlmPipeline.dedupNearMinhash _),
    "dedup_simhash" -> (LlmPipeline.dedupSimhash _),
    "dedup_simhash_pairs" -> (LlmPipeline.dedupSimhashPairs _),
    "dedup_ngram_jaccard" -> (LlmPipeline.dedupNgramJaccard _),
    "dedup_embedding_cosine" -> (LlmPipeline.dedupEmbeddingCosine _),
    "dedup_embedding_lsh" -> (LlmPipeline.dedupEmbeddingLsh _),
    "dedup_cluster_cc" -> (LlmPipeline.dedupClusterCc _),
    "knn_cosine" -> (LlmPipeline.knnCosine _),
    "knn_lsh_bucketed" -> (LlmPipeline.knnLshBucketed _),
    "knn_lsh_joined" -> (LlmPipeline.knnLshJoined _),
    "sim_threshold" -> (LlmPipeline.simThreshold _),
    "text_tokenize_wordcount" -> (LlmPipeline.textTokenizeWordcount _),
    "text_tfidf_topterms" -> (LlmPipeline.textTfidfTopterms _),
    "text_lang_stats" -> (LlmPipeline.textLangStats _),
    "text_quality_score" -> (LlmPipeline.textQualityScore _),
    "text_token_count" -> (LlmPipeline.textTokenCount _),
    "text_langid" -> (LlmPipeline.textLangid _),
    "text_fingerprint" -> (LlmPipeline.textFingerprint _),
    "text_edit_distance" -> (LlmPipeline.textEditDistance _),
    "sample_stratified" -> (LlmPipeline.sampleStratified _),
    "pipeline_corpus_curate" -> (LlmPipeline.pipelineCorpusCurate _),
    "pipeline_feature_snapshot" -> (LlmPipeline.pipelineFeatureSnapshot _),
    "corpus_shuffle" -> (LlmPipeline.corpusShuffle _),
    "pack_sequences" -> (LlmPipeline.packSequences _),
    "multimodal_struct" -> (LlmPipeline.multimodalStruct _),
    "multimodal_binary" -> (LlmPipeline.multimodalBinary _),
    "multimodal_framesample" -> (LlmPipeline.multimodalFrameSample _),
    // §2.4/§2.11 custom typed aggregation + custom Catalyst surface
    "agg_custom_typed" -> (Custom.aggCustomTyped _),
    "agg_hll_custom" -> (Custom.aggHllCustom _),
    "agg_tdigest" -> (Custom.aggTdigest _),
    "join_asof_native" -> (Relational.joinAsofNative _),
    "join_range_bucketed" -> (Relational.joinRangeBucketed _),
    "knn_ivf" -> (LlmPipeline.knnIvf _),
    // SQL front door (ops/SqlApi.scala): spark.sql over temp views
    "sql_tpch_q3" -> (SqlApi.sqlTpchQ3 _),
    "sql_subquery_scalar" -> (SqlApi.sqlSubqueryScalar _),
    "sql_subquery_exists" -> (SqlApi.sqlSubqueryExists _),
    "sql_subquery_scalar_corr" -> (SqlApi.sqlSubqueryScalarCorr _),
    "fn_vector_native" -> (Functions.fnVectorNative _),
    "layout_zorder" -> (Functions.layoutZorder _),
    "join_skew_salted" -> (Relational.joinSkewSalted _),
    // §2.14 round-4: product analytics + training-pipeline layers
    "funnel_ordered" -> (Analytics.funnelOrdered _),
    "cohort_retention" -> (Analytics.cohortRetention _),
    "attribution_last_touch" -> (Analytics.attributionLastTouch _),
    "cdc_scd2" -> (Analytics.cdcScd2 _),
    "ts_resample_ohlc" -> (Analytics.tsResampleOhlc _),
    "agg_histogram" -> (Analytics.aggHistogram _),
    "assoc_pairs" -> (Analytics.assocPairs _),
    "split_train_test" -> (Analytics.splitTrainTest _),
    "pipeline_mixture_weights" -> (Analytics.pipelineMixtureWeights _),
    "join_bucketed_colocated" -> (Analytics.joinBucketedColocated _),
    "mv_incremental_refresh" -> (Analytics.mvIncrementalRefresh _),
    "graph_pagerank" -> (LlmPipeline.graphPagerank _),
    "multimodal_batch_infer" -> (LlmPipeline.multimodalBatchInfer _),
    "dedup_incremental" -> (LlmPipeline.dedupIncremental _),
    "text_ngram_freq" -> (LlmPipeline.textNgramFreq _),
    "analytics_rfm" -> (Analytics.analyticsRfm _),
    "corpus_mixture_sample" -> (Analytics.corpusMixtureSample _),
    "join_asof_nearest" -> (Relational.joinAsofNearest _),
    "layout_compaction" -> (graft.io.Formats.layoutCompaction _),
    "sink_partition_overwrite_dynamic" -> (graft.io.Formats.sinkPartitionOverwriteDynamic _),
    "source_schema_evolution" -> (graft.io.Formats.sourceSchemaEvolution _),
    // round-6: decontamination, quantization, entropy, interval overlap
    "decontaminate_ngram" -> (LlmPipeline.decontaminateNgram _),
    "embedding_quantize" -> (LlmPipeline.embeddingQuantize _),
    "agg_entropy" -> (Analytics.aggEntropy _),
    "join_interval_overlap" -> (Analytics.joinIntervalOverlap _),
    "text_bm25_topterms" -> (LlmPipeline.textBm25Topterms _),
    "text_lm_score" -> (LlmPipeline.textLmScore _),
    // round-6b: anomaly/smoothing/graph/moments + PII scrub + interleave
    "anomaly_zscore" -> (Analytics.anomalyZscore _),
    "ts_ewma" -> (Analytics.tsEwma _),
    "graph_triangle_count" -> (Analytics.graphTriangleCount _),
    "agg_skew_kurt" -> (Analytics.aggSkewKurt _),
    "text_pii_redact" -> (LlmPipeline.textPiiRedact _),
    "corpus_interleave" -> (LlmPipeline.corpusInterleave _),
    "win_streak" -> (Windows.winStreak _),
    "agg_corr_exact" -> (Analytics.aggCorrExact _),
    "text_ttr" -> (LlmPipeline.textTtr _),
    "embedding_centroid" -> (LlmPipeline.embeddingCentroid _),
    "feature_minmax_norm" -> (Analytics.featureMinmaxNorm _),
    "join_asof_tolerance" -> (Relational.joinAsofTolerance _),
    "agg_bitmap_distinct" -> (Custom.aggBitmapDistinct _),
    "sql_recursive_cte" -> (SqlApi.sqlRecursiveBfs _),
    "dq_profile" -> (Analytics.dqProfile _),
    "corpus_budget_select" -> (LlmPipeline.corpusBudgetSelect _),
    "assoc_rules" -> (Analytics.assocRules _),
    "text_keyword_logodds" -> (LlmPipeline.textKeywordLogodds _),
    "seq_transition_matrix" -> (Analytics.seqTransitionMatrix _),
    "seq_session_paths" -> (Analytics.seqSessionPaths _),
    // round-6c: quantitative/statistics layer
    "agg_gini" -> (Quant.aggGini _),
    "feature_zscore_norm" -> (Quant.featureZscoreNorm _),
    "win_pct_change" -> (Quant.winPctChange _),
    "ts_anomaly_mad" -> (Quant.tsAnomalyMad _),
    "seq_pmi_bigrams" -> (Quant.seqPmiBigrams _),
    "graph_degree_stats" -> (Quant.graphDegreeStats _),
    "cdc_deletes" -> (Quant.cdcDeletes _),
    "ts_interpolate_linear" -> (Quant.tsInterpolateLinear _),
    "text_readability" -> (Quant.textReadability _),
    "corpus_curriculum" -> (Quant.corpusCurriculum _),
    "embedding_dim_stats" -> (Quant.embeddingDimStats _),
    "ts_autocorr_lag1" -> (Quant.tsAutocorrLag1 _),
    "agg_quantile_bands" -> (Quant.aggQuantileBands _),
    "feature_robust_scale" -> (Quant.featureRobustScale _),
    "analytics_dau" -> (Quant.analyticsDau _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.sql
}
