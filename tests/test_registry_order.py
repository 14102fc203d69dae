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
REQUIRED_IN_WINDOW = {
    # LLM-pipeline tiers (the round-1 gap)
    "dedup": [
        "dedup_exact",
        "dedup_jaccard_pairs",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding_cosine",
    ],
    "vector": ["knn_cosine_topk", "vector_centroids", "vector_norms", "ann_ivf_topk", "ann_lsh_topk"],
    "text": ["text_quality", "text_fingerprint", "text_langid", "text_shingles", "text_stats"],
    "pipeline": [
        "pipeline_lake_paths",
        "pipeline_date_functions",
        "pipeline_bad_date_tolerance",
        "pipeline_string_functions",
        "pipeline_date_series",
    ],
    "stats": ["agg_variance_corr", "agg_percentiles", "agg_arg_minmax", "agg_collect_sorted"],
    "subquery": ["subquery_scalar", "subquery_exists", "subquery_correlated_scalar"],
    "streaming": [
        "streaming_tumbling_day",
        "streaming_session_windows",
        "streaming_dedup_replay",
        "streaming_interval_join",
    ],
    "dedup_cluster": ["dedup_cluster_cc"],
    "multimodal": ["multimodal_features", "multimodal_format_detect"],
    # dataset-assembly tier (new in r2)
    "curation": [
        "curation_hash_split",
        "curation_stratified_sample",
        "curation_pack_sequences",
        "curation_global_shuffle",
        "text_pii_redact",
        "pipeline_training_manifest",
        "text_line_dedup",
        "curation_decontaminate_ngram",
    ],
    # regression guard: previously-verified classes (displaced members keep
    # local-oracle coverage via tests/test_queries_oracle.py full-catalog run)
    "agg": ["q1_pricing_summary"],
    "window": ["window_topk_per_group"],
    "join": ["join_q3_shipping", "join_asof_attribution"],
    "setop": ["topk_orders"],
    "events": ["events_sessionize"],
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
    # rows-only entries are the approx/sketch/multimodal ones, by design
    rows_only = {n for n in PRIORITY_WINDOW if n not in oracles}
    assert rows_only == {
        "dedup_minhash_lsh",
        "dedup_simhash",
        "ann_ivf_topk",
        "ann_lsh_topk",
        "agg_approx_sketches",
        "multimodal_features",
    }
