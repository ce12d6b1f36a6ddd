"""Every tier-C query must have a named value-level covering test.

Tier-C registry entries carry no DuckDB oracle (approx sketches,
streaming state, index/layout structures), so the driver's record for
them is rows-only.  The compensating contract is a unit golden — this
test makes that contract enforceable: each tier-C name maps to the
test function that pins its semantics, and the map must stay total.
A new tier-C operator without a covering test fails here, which is
exactly the round-4 lesson (unpinned seams fail silently).
"""

from __future__ import annotations

import importlib

from pg_telemetry_spark.registry import all_queries

#: tier-C query -> (test module, covering test function).  Most are
#: named after the query; the rest pin the same semantics through the
#: underlying operator API.
COVERING_TESTS = {
    "wl_kcore": (
        "tests.test_units_graph",
        "test_kcore_matches_local_peel",
    ),
    "wl_bfs_hops": (
        "tests.test_units_graph",
        "test_bfs_hops_matches_local_bfs",
    ),
    "ts_kalman_smooth": (
        "tests.test_units_timeseries_ext",
        "test_kalman_matches_local_recursion",
    ),
    "ts_dtw_pairs": (
        "tests.test_units_stats",
        "test_dtw_pairs_match_local_replay",
    ),
    "wl_label_propagation": (
        "tests.test_units_graph",
        "test_label_propagation_matches_local_replay",
    ),
    "snk_manifest_snapshot": (
        "tests.test_units_sources",
        "test_manifest_snapshot_time_travel",
    ),
    "ts_holt_forecast": (
        "tests.test_units_timeseries_ext",
        "test_holt_forecast_matches_local_recursion",
    ),
    "agg_tdigest": (
        "tests.test_units_tdigest",
        "test_spark_tdigest_counts_exact_and_estimates_close",
    ),
    "wl_pagerank": (
        "tests.test_units_graph",
        "test_pagerank_matches_numpy_power_iteration",
    ),
    "agg_approx_cd": ("tests.test_units_timeseries", "test_approx_count_distinct_within_5pct"),
    "agg_approx_pct": ("tests.test_units_workload", "test_approx_percentile_error_bounded"),
    "agg_heavy_hitters_mg": ("tests.test_units_dataeng", "test_misra_gries_guarantees"),
    "agg_hll_rollup": (
        "tests.test_units_workload",
        "test_hll_rollup_merge_matches_single_pass_and_exact",
    ),
    "llm_ann_ivf": ("tests.test_units_llm_ext", "test_ivf_structural_and_recall"),
    "llm_ann_ivf_kmeans": (
        "tests.test_units_llm_ext",
        "test_ivf_kmeans_structural_recall_and_determinism",
    ),
    "llm_ann_lsh": ("tests.test_units_llm_ext", "test_lsh_ann_recovers_planted_neighbors"),
    "llm_ann_incr": (
        "tests.test_ann_index_plan",
        "test_ann_incr_probe_equals_one_shot_and_recall_floor",
    ),
    "llm_ann_compact": (
        "tests.test_ann_index_plan",
        "test_ann_compact_equals_rebuild_on_evolving_hot_set",
    ),
    "llm_ann_route": (
        "tests.test_ann_index_plan",
        "test_ann_route_crossover",
    ),
    "llm_bpe_train": ("tests.test_units_bpe", "test_bpe_train_matches_python_reference"),
    "llm_bpe_apply": ("tests.test_units_bpe", "test_bpe_apply_matches_python_reference"),
    "llm_dedup_cc": ("tests.test_units_llm", "test_connected_components_match_union_find"),
    "llm_dedup_cc_star": ("tests.test_units_llm", "test_star_components_on_adversarial_chain"),
    "llm_dedup_incr": ("tests.test_units_llm", "test_incremental_dedup_equals_full_rebuild"),
    "llm_dedup_near": ("tests.test_units_llm", "test_near_dup_recovers_injected_pairs"),
    "llm_multimodal_binary": (
        "tests.test_units_llm_ext",
        "test_multimodal_plumbing_deterministic_and_shaped",
    ),
    "llm_simhash": (
        "tests.test_units_llm_ext",
        "test_simhash_near_dups_are_close_and_random_pairs_far",
    ),
    "snk_foreachbatch": ("tests.test_units_streaming", "test_foreachbatch_sink_idempotent_on_replay"),
    "snk_parquet_part": ("tests.test_plan_shapes", "test_partition_pruning_on_warehouse_layout"),
    "sort_partitions": ("tests.test_units_sources", "test_sort_partitions_all_sorted_no_rows_lost"),
    "src_csv_corrupt": ("tests.test_units_sources", "test_csv_corrupt_quarantine_exact_split"),
    "src_jdbc_pg": ("tests.test_units_sources", "test_jdbc_seam_descriptor_and_reader_config"),
    "ts_lttb": ("tests.test_units_timeseries_ext", "test_lttb_properties"),
    "udf_map_batches": (
        "tests.test_units_llm",
        "test_builtin_shingles_agree_with_pandas_variant",
    ),
    "src_stream_file": (
        "tests.test_units_streaming",
        "test_file_stream_batches_match_static_day_counts",
    ),
    "str_dedup": ("tests.test_units_streaming", "test_streaming_dedup_emits_each_id_once"),
    "str_output_modes": (
        "tests.test_units_streaming",
        "test_output_modes_ordering_and_window_parity",
    ),
    "str_session_window": (
        "tests.test_units_streaming",
        "test_streaming_sessions_match_batch_gaps_and_islands",
    ),
    "str_sliding_window": (
        "tests.test_units_streaming",
        "test_sliding_window_final_state_matches_batch",
    ),
    "str_stateful": ("tests.test_units_streaming", "test_stateful_counts_match_batch_groupby"),
    "str_stream_static": ("tests.test_units_streaming", "test_stream_static_join_matches_batch_join"),
    "str_stream_stream_join": (
        "tests.test_units_streaming",
        "test_stream_stream_join_matches_batch_join",
    ),
    "str_watermark": ("tests.test_units_streaming", "test_watermark_drops_late_rows"),
    "str_topk_windowed": (
        "tests.test_units_streaming",
        "test_topk_windowed_final_state_matches_batch_topk",
    ),
    "str_anomaly_baseline": (
        "tests.test_units_streaming",
        "test_anomaly_baseline_matches_batch_rule",
    ),
    "llm_ann_pq": (
        "tests.test_units_llm_ext",
        "test_pq_adc_matches_numpy_and_recall",
    ),
    "llm_mmr_diversify": (
        "tests.test_units_selection",
        "test_mmr_matches_local_greedy",
    ),
    "layout_compaction": (
        "tests.test_units_sources",
        "test_compaction_plan_invariants",
    ),
}


def test_every_tier_c_query_has_a_covering_test():
    tier_c = sorted(n for n, q in all_queries().items() if q.oracle is None)
    unmapped = [n for n in tier_c if n not in COVERING_TESTS]
    assert not unmapped, f"tier-C queries without a covering unit test: {unmapped}"
    for name, (mod_name, fn_name) in COVERING_TESTS.items():
        mod = importlib.import_module(mod_name)
        assert hasattr(mod, fn_name), (
            f"{name}: covering test {mod_name}.{fn_name} does not exist"
        )
