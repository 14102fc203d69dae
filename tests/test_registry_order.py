"""Pin the catalog iteration order so every capability class stays inside the
external harness's verification window (first 50 entries of ``queries()``).

Round-1 lesson: import order alone left all dedup/vector/text/stats/pipeline/
streaming entries outside the window, so they got no external correctness row
despite passing the identical local oracle comparison.
"""

from __future__ import annotations

from vmhub_data_pipeline_spark.queries import PRIORITY_WINDOW, queries, oracle_sql

WINDOW = 50

# Every capability tier must have at least one entry in the first-50 window.
# Round-4 composition (VERDICT r3 task 2): the window is given over entirely
# to the 49 r3c queries that have never received a driver row (weakest-
# evidence first: iterative/stateful/composed, then multimodal byte decode,
# text, events, stats, pipeline-audit, curation, window tiers) plus the
# round's one fix (vector_quantize_int8) and ann_lsh_topk's first
# post-oracle-upgrade driver row. Displaced entries all hold at least one
# driver hash-green row from r1-r3 and stay covered by the full-catalog
# local mirror, which now rejects both canonicalization classes that
# historically diverged from the driver (HUGEINT, nested columns).
REQUIRED_IN_WINDOW = {
    "vector": ["vector_quantize_int8", "knn_mmr_diverse", "ann_lsh_topk"],
    "graph": ["graph_label_propagation", "graph_triangle_count"],
    "dedup": [
        "dedup_survivorship",
        "dedup_overlap_matrix",
        "dedup_levenshtein_pairs",
        "dedup_blocking_eval",
    ],
    "join": ["join_feature_store_pit", "join_q9_product_profit"],
    "multimodal": ["multimodal_audio_stats", "multimodal_video_frames"],
    "text": [
        "text_bm25_topk",
        "text_collocations_pmi",
        "text_zipf_slope",
        "text_entropy_by_source",
        "text_langid_confusion",
    ],
    "events": [
        "events_cdc_apply",
        "events_gapfill_hourly",
        "events_outliers_mad",
        "events_ordered_funnel",
        "events_markov_transitions",
        "events_markov_eval",
        "events_multitouch_attribution",
        "events_ab_experiment",
        "events_anomaly_zscore",
        "events_time_weighted_avg",
        "events_unpivot",
        "events_ewma_daily",
    ],
    "stats": [
        "stats_chi2_drift",
        "stats_winsorize",
        "stats_kanonymity_audit",
        "stats_histogram_profile",
    ],
    "pipeline": [
        "pipeline_incremental_aggregate",
        "pipeline_fk_integrity",
        "pipeline_key_skew_report",
        "pipeline_partition_checksum",
        "pipeline_quality_audit",
        "pipeline_snapshot_diff",
        "pipeline_rag_manifest",
    ],
    "curation": [
        "curation_temperature_mix",
        "curation_budget_apportion",
        "curation_contrastive_pairs",
        "curation_dataset_card",
    ],
    "window": ["window_cumulative_distinct", "window_period_over_period"],
    "sketch": ["agg_cms_heavy_hitters", "agg_kmv_merge"],
    "streaming": ["streaming_cms_fold"],
}


def test_priority_window_is_exactly_the_first_entries():
    names = list(queries())
    assert names[: len(PRIORITY_WINDOW)] == list(PRIORITY_WINDOW)
    # no duplicates in the priority list
    assert len(set(PRIORITY_WINDOW)) == len(PRIORITY_WINDOW)
    assert len(PRIORITY_WINDOW) == WINDOW


def test_every_capability_class_inside_window():
    window = set(list(queries())[:WINDOW])
    for tier, members in REQUIRED_IN_WINDOW.items():
        present = [m for m in members if m in window]
        assert present, f"tier {tier!r} has no representative in the first-{WINDOW} window"


def test_window_members_exist_and_oracle_backed_where_expected():
    qs = queries()
    oracles = oracle_sql()
    for name in PRIORITY_WINDOW:
        assert name in qs
    # every rows-only query (minhash/simhash/ann/sketches/fake-decode
    # features/LSH clustering) already has its no_oracle driver row from
    # r1/r2 and a repeat adds nothing — the round-3 window is 100%
    # oracle-backed
    rows_only = {n for n in PRIORITY_WINDOW if n not in oracles}
    assert rows_only == set()
