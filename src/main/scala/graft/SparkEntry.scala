package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Every implemented operator from SURVEY.md §2 gets a named entry in
  * [[queries]]; where the semantics are ANSI-SQL-expressible the matching
  * DuckDB oracle is in [[oracleSql]] (same result schema, same column
  * names — the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query (SURVEY §2.A A1–A7) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.aggrRepoLanguages(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a_flagship_languages" -> (Flagship.aggrRepoLanguages _),
    "a2_explode_drops_empty" -> (Flagship.explodeDropsEmpty _),
    "a2_explode_outer_keeps_empty" -> (Flagship.explodeOuterKeepsEmpty _),
    "a6_literal" -> (Analytics.a6Literal _),
    "q1_pricing_summary" -> (Analytics.q1PricingSummary _),
    "q3_top_orders" -> (Analytics.q3TopOrders _),
    "q5_region_revenue" -> (Analytics.q5RegionRevenue _),
    "w_top3_orders_per_cust" -> (Analytics.wTop3OrdersPerCust _),
    "w_running_revenue" -> (Analytics.wRunningRevenue _),
    "s_nation_intersect" -> (Analytics.sNationIntersect _),
    "s_nation_except" -> (Analytics.sNationExcept _),
    "r_rollup_orders" -> (Analytics.rRollupOrders _),
    "r_pivot_status" -> (Analytics.rPivotStatus _),
    "r_cube_orders" -> (Analytics.rCubeOrders _),
    "r_grouping_sets" -> (Analytics.rGroupingSets _),
    "x_tfidf_terms" -> (TextOps.tfidfTerms _),
    "q_percentiles" -> (Analytics.qPercentiles _),
    "q_approx_distinct" -> (Analytics.qApproxDistinct _), // rows-only: HLL sketches are engine-specific
    "q_exact_distinct" -> (Analytics.qExactDistinct _),
    "j_semi_customers_with_orders" -> (Analytics.jSemiCustomersWithOrders _),
    "j_salted_join" -> (Skew.saltedRevenueByStatus _),
    "e_props_extract" -> (Events.propsExtract _),
    "e_sessionize" -> (Events.sessionize _),
    "e_hourly_windows" -> (Events.hourlyWindows _),
    "e_asof_join" -> (Events.asofJoin _),
    "b21_test_unique" -> (DqQueries.b21Unique _),
    "b22_test_not_null" -> (DqQueries.b22NotNull _),
    "b23_test_accepted_values" -> (DqQueries.b23AcceptedValues _),
    "b24_test_relationships" -> (DqQueries.b24Relationships _),
    "b19_test_eval" -> (DqQueries.b19TestEval _),
    "b36_freshness" -> (DqQueries.b36Freshness _),
    "b1_table_swap" -> (MatQueries.b1TableSwap _),
    "b3_view" -> (MatQueries.b3View _),
    "b5_delete_insert" -> (MatQueries.b5DeleteInsert _),
    "b7_merge" -> (MatQueries.b7Merge _),
    "b7_merge_update_subset" -> (MatQueries.b7MergeUpdateSubset _),
    "b9_insert_overwrite" -> (MatQueries.b9InsertOverwrite _),
    "b11_snapshot_timestamp" -> (MatQueries.b11SnapshotTimestamp _),
    "b15_snapshot_check" -> (MatQueries.b15SnapshotCheck _),
    "b18_seed" -> (MatQueries.b18Seed _),
    "b20_copy" -> (MatQueries.b20Copy _),
    "b48_append_new_columns" -> (MatQueries.b48AppendNewColumns _),
    "x_dedup_exact" -> (TextOps.dedupExact _),
    "x_dedup_ngram_jaccard" -> (TextOps.dedupNgramJaccard _),
    "x_dedup_minhash_lsh" -> (TextOps.dedupMinhashLsh _),
    "x_dedup_clusters" -> (TextOps.dedupClusters _),
    "x_dedup_keep_best" -> (TextOps.dedupKeepBest _),
    "x_dedup_incremental" -> (TextOps.dedupIncremental _),
    "x_pack_sequences" -> ((ss, dd) => TextOps.packSequences(ss, dd)),
    "x_simhash" -> (TextOps.simhash _),
    "x_simhash_pairs" -> (TextOps.simhashPairs _),
    "x_token_count" -> (TextOps.tokenCount _),
    "x_quality_score" -> (TextOps.qualityScore _),
    "x_lang_id" -> (TextOps.langId _),
    "x_fingerprint" -> (TextOps.fingerprint _),
    "x_winnow_fingerprint" -> (TextOps.winnowFingerprint _),
    "x_decontaminate" -> (TextOps.decontaminate _),
    "x_pii_redact" -> (TextOps.piiRedact _),
    "x_repetition" -> (TextOps.repetitionMetrics _),
    "x_knn_brute" -> (Similarity.knnBrute _),
    "x_knn_lsh_bucket" -> (Similarity.knnLshBucket _),
    "x_knn_topk_agg" -> (Similarity.knnTopKAgg _),
    "x_knn_ivf" -> (Similarity.knnIvf _),
    "x_embedding_near_dups" -> (Similarity.embeddingNearDups _),
    "x_stratified_sample" -> (TextOps.stratifiedSample _),
    "x_curation_pipeline" -> (TextOps.curationPipeline _),
    "x_embedding_quantize" -> (Similarity.embeddingQuantize _),
    "x_multimodal_meta" -> (Multimodal.mediaMeta _),
    "x_media_features" -> (Multimodal.mediaFeatures _),
    "x_frame_sample" -> (Multimodal.frameSample _),
    "o_build_dag" -> (OrchestratorQueries.buildDag _),
    "o_incremental_model" -> (OrchestratorQueries.incrementalModel _),
    "o_insert_overwrite_pruned" -> (OrchestratorQueries.insertOverwritePruned _),
    // streaming sessionization equivalence vs the batch twin (bounded
    // input + watermark-advancing sentinel; see StreamingJobs)
    "st_sessionize_equiv" -> (graft.streaming.StreamingJobs.sessionizeEquiv _)
  )

  /** DuckDB-runnable ANSI SQL per queries key (same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "a_flagship_languages" -> Flagship.aggrRepoLanguagesSql,
    "a2_explode_drops_empty" -> Flagship.explodeDropsEmptySql,
    "a2_explode_outer_keeps_empty" -> Flagship.explodeOuterKeepsEmptySql,
    "a6_literal" -> Analytics.a6LiteralSql,
    "q1_pricing_summary" -> Analytics.q1PricingSummarySql,
    "q3_top_orders" -> Analytics.q3TopOrdersSql,
    "q5_region_revenue" -> Analytics.q5RegionRevenueSql,
    "w_top3_orders_per_cust" -> Analytics.wTop3OrdersPerCustSql,
    "w_running_revenue" -> Analytics.wRunningRevenueSql,
    "s_nation_intersect" -> Analytics.sNationIntersectSql,
    "s_nation_except" -> Analytics.sNationExceptSql,
    "r_rollup_orders" -> Analytics.rRollupOrdersSql,
    "r_pivot_status" -> Analytics.rPivotStatusSql,
    "r_cube_orders" -> Analytics.rCubeOrdersSql,
    "r_grouping_sets" -> Analytics.rGroupingSetsSql,
    "x_tfidf_terms" -> TextOps.tfidfTermsSql,
    "q_percentiles" -> Analytics.qPercentilesSql,
    "q_exact_distinct" -> Analytics.qExactDistinctSql,
    "j_semi_customers_with_orders" -> Analytics.jSemiCustomersWithOrdersSql,
    "j_salted_join" -> Skew.saltedRevenueByStatusSql,
    "e_props_extract" -> Events.propsExtractSql,
    "e_sessionize" -> Events.sessionizeSql,
    // same oracle as the batch sessionizer minus the per-user ordinal
    "st_sessionize_equiv" ->
      s"""SELECT user_id, session_start_ms, n_events, sum_value
         |FROM (${Events.sessionizeSql})""".stripMargin,
    "e_hourly_windows" -> Events.hourlyWindowsSql,
    "e_asof_join" -> Events.asofJoinSql,
    "b21_test_unique" -> DqQueries.b21UniqueSql,
    "b22_test_not_null" -> DqQueries.b22NotNullSql,
    "b23_test_accepted_values" -> DqQueries.b23AcceptedValuesSql,
    "b24_test_relationships" -> DqQueries.b24RelationshipsSql,
    "b19_test_eval" -> DqQueries.b19TestEvalSql,
    "b36_freshness" -> DqQueries.b36FreshnessSql,
    "b1_table_swap" -> MatQueries.b1TableSwapSql,
    "b3_view" -> MatQueries.b3ViewSql,
    "b5_delete_insert" -> MatQueries.b5DeleteInsertSql,
    "b7_merge" -> MatQueries.b7MergeSql,
    "b7_merge_update_subset" -> MatQueries.b7MergeUpdateSubsetSql,
    "b9_insert_overwrite" -> MatQueries.b9InsertOverwriteSql,
    "b11_snapshot_timestamp" -> MatQueries.b11SnapshotTimestampSql,
    "b15_snapshot_check" -> MatQueries.b15SnapshotCheckSql,
    "b18_seed" -> MatQueries.b18SeedSql,
    "b20_copy" -> MatQueries.b20CopySql,
    "b48_append_new_columns" -> MatQueries.b48AppendNewColumnsSql,
    "x_dedup_exact" -> TextOps.dedupExactSql,
    "x_dedup_ngram_jaccard" -> TextOps.dedupNgramJaccardSql,
    "x_dedup_minhash_lsh" -> TextOps.dedupMinhashLshSql,
    "x_dedup_clusters" -> TextOps.dedupClustersSql,
    "x_dedup_keep_best" -> TextOps.dedupKeepBestSql,
    "x_dedup_incremental" -> TextOps.dedupIncrementalSql,
    "x_pack_sequences" -> TextOps.packSequencesSql,
    "x_simhash" -> TextOps.simhashSql,
    "x_simhash_pairs" -> TextOps.simhashPairsSql,
    "x_token_count" -> TextOps.tokenCountSql,
    "x_quality_score" -> TextOps.qualityScoreSql,
    "x_lang_id" -> TextOps.langIdSql,
    "x_fingerprint" -> TextOps.fingerprintSql,
    "x_winnow_fingerprint" -> TextOps.winnowFingerprintSql,
    "x_decontaminate" -> TextOps.decontaminateSql,
    "x_pii_redact" -> TextOps.piiRedactSql,
    "x_repetition" -> TextOps.repetitionMetricsSql,
    "x_knn_brute" -> Similarity.knnBruteSql,
    "x_knn_lsh_bucket" -> Similarity.knnLshBucketSql,
    "x_knn_topk_agg" -> Similarity.knnBruteSql, // same contract as brute
    "x_knn_ivf" -> Similarity.knnIvfSql,
    "x_embedding_near_dups" -> Similarity.embeddingNearDupsSql,
    "x_stratified_sample" -> TextOps.stratifiedSampleSql,
    "x_curation_pipeline" -> TextOps.curationPipelineSql,
    "x_embedding_quantize" -> Similarity.embeddingQuantizeSql,
    "x_multimodal_meta" -> Multimodal.mediaMetaSql,
    "x_media_features" -> Multimodal.mediaFeaturesSql,
    "x_frame_sample" -> Multimodal.frameSampleSql,
    "o_build_dag" -> OrchestratorQueries.buildDagSql,
    "o_incremental_model" -> OrchestratorQueries.incrementalModelSql,
    "o_insert_overwrite_pruned" -> OrchestratorQueries.insertOverwritePrunedSql
  )
}
