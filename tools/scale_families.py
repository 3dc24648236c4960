#!/usr/bin/env python3
"""Group per-query bench times into SCALE.md cost-model families and
compute the sf0.1 -> sf1 ratio per family.

Usage: scale_families.py bench_sf01.json bench_sf1.json
"""
import json
import sys

FAMILIES = [
    ("relational agg", ["a_flagship_languages", "a2_explode_drops_empty",
        "a2_explode_outer_keeps_empty", "a6_literal", "q1_pricing_summary",
        "q_exact_distinct", "q_approx_distinct", "q_percentiles",
        "r_pivot_status", "r_cube_orders", "r_grouping_sets", "r_rollup_orders",
        "s_nation_except", "s_nation_intersect", "q_approx_percentiles"]),
    ("relational join", ["q3_top_orders", "q5_region_revenue",
        "j_semi_customers_with_orders", "j_salted_join", "e_interval_join"]),
    ("correlated subqueries (decorrelation)", ["q4_late_orders",
        "q13_custdist", "q17_small_qty"]),
    ("event analytics (funnel/cohort)", ["e_funnel",
        "e_cohort_retention"]),
    ("window / sessionize", ["w_top3_orders_per_cust", "w_running_revenue", "e_sessionize",
        "e_sessionize_salted", "e_asof_join", "e_hourly_windows",
        "e_props_extract"]),
    ("materialize-write", ["b1_table_swap", "b3_view", "b5_delete_insert",
        "b7_merge", "b7_merge_update_subset", "b9_insert_overwrite",
        "b18_seed", "b19_test_eval", "b20_copy", "b21_test_unique",
        "b22_test_not_null", "b23_test_accepted_values",
        "b24_test_relationships", "b36_freshness",
        "b48_append_new_columns"]),
    ("dbt-utils tests", ["b_test_accepted_range", "b_test_unique_combination",
        "b_test_expression_is_true", "b_test_not_accepted_values",
        "b_test_equal_rowcount", "b_test_fewer_rows_than",
        "b_test_not_null_proportion", "b_test_sequential_values",
        "b_test_mutually_exclusive_ranges", "b_test_recency",
        "b_test_cardinality_equality"]),
    ("SCD-2 snapshots", ["b11_snapshot_timestamp", "b15_snapshot_check"]),
    ("orchestrator lifecycle", ["o_build_dag", "o_incremental_model",
        "o_insert_overwrite_pruned", "o_user_macros", "o_graph_selectors",
        "o_mv_avg_model", "b2_partitions_loop", "o_microbatch", "o_clone",
        "o_metric_query", "o_cross_project_ref", "o_source_formats",
        "o_jinja_loops", "o_jinja_filters", "o_package_macros", "o_dynamic_pivot", "o_star_select", "o_utils_macros", "o_union_relations",
        "o_ddl_roundtrip"]),
    ("row deletes / compaction / z-order / bloom", ["x_row_deletes",
        "x_compact_table", "x_zorder_box", "x_bloom_lookup"]),
    ("MV maintenance + serving", ["x_agg_view", "x_mv_rewrite",
        "x_mv_stale_serve", "x_mv_avg", "x_cdc_apply",
        "x_consumer_pipeline"]),
    ("keyword search + retrieval", ["x_keyword_search",
        "x_keyword_bm25", "x_hybrid_search"]),
    ("banded dedup", ["x_dedup_exact", "x_dedup_paragraph",
        "x_dedup_ngram_jaccard", "x_dedup_minhash_lsh", "x_simhash",
        "x_simhash_pairs",
        "x_dedup_incremental", "x_dedup_incremental_fuzzy",
        "x_dedup_bloom_gate", "x_decontam_spans",
        "x_winnow_fingerprint", "x_fingerprint"]),
    ("CC dedup clusters", ["x_dedup_clusters", "x_dedup_keep_best"]),
    ("ANN exact baselines (incl. compressed-brute flat PQ)",
        ["x_knn_brute", "x_knn_topk_agg", "x_knn_pq"]),
    ("ANN scale path", ["x_knn_ivf", "x_knn_lsh_bucket",
        "x_embedding_near_dups", "x_semantic_dedup", "x_knn_ivf_pq"]),
    ("k-means", ["x_kmeans"]),
    ("labeled-embedding evals", ["x_knn_label_eval", "x_label_cohesion"]),
    ("text per-row + curation", ["x_token_count", "x_quality_score",
        "x_quality_gate", "x_lang_id", "x_pii_redact", "x_repetition",
        "x_boilerplate_strip", "x_contam_frac", "x_decontaminate",
        "x_tfidf_terms", "x_mix_sources", "x_mix_temperature", "x_mix_epochs",
        "x_stratified_sample", "x_split_assign", "x_epoch_shuffle",
        "x_chunk_overlap", "x_pack_sequences", "x_embedding_quantize",
        "x_curation_pipeline", "x_pretraining_pipeline", "x_sample_exact_k", "x_lm_score",
        "x_gopher_rules", "x_corpus_report", "x_embedding_rp",
        "x_bpe_encode"]),
    ("multimodal", ["x_multimodal_meta", "x_media_features",
        "x_frame_sample"]),
    ("streaming equivalence", ["st_sessionize_equiv",
        "st_stream_join_equiv", "st_dedup_equiv"]),
    ("BPE training", ["x_bpe_merges"]),
    ("sketch + targeted selection", ["x_heavy_hitters", "x_dsir_select",
        "x_ccnet_buckets", "e_hll_sketch_union"]),
]


def load(p):
    line = open(p).read()
    return json.loads(line[line.find("{"):])


def main():
    a = load(sys.argv[1])["queries"]
    b = load(sys.argv[2])["queries"]
    assigned = set()
    print(f"{'family':44s} {'sf0.1':>7s} {'sf1':>8s} {'ratio':>6s}")
    for fam, qs in FAMILIES:
        hit = [q for q in qs if q in a and q in b]
        assigned.update(hit)
        if not hit:
            continue
        sa = sum(a[q] for q in hit)
        sb = sum(b[q] for q in hit)
        print(f"{fam:44s} {sa:6.1f}s {sb:7.1f}s {sb / sa:5.1f}x"
              + (f"   (missing: {set(qs) - set(hit)})"
                 if len(hit) < len(qs) else ""))
    rest = sorted((set(a) & set(b)) - assigned)
    if rest:
        sa = sum(a[q] for q in rest)
        sb = sum(b[q] for q in rest)
        print(f"{'UNASSIGNED ' + str(rest):44s} {sa:6.1f}s {sb:7.1f}s")
    ta, tb = sum(a.values()), sum(b.values())
    print(f"{'TOTAL':44s} {ta:6.1f}s {tb:7.1f}s {tb / ta:5.1f}x")


if __name__ == "__main__":
    main()
