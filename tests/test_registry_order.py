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
# Round-5 composition (VERDICT r4 tasks 1+3): first driver contact for the
# round's additions/oracle upgrades (dedup_jaccard_pairs_capped, ann_pq_topk,
# vector_pca_power, ann_ivf_topk, and the six NEW r5 queries — cluster-aware
# split, exact-substring audit, bigram LM, drift report, Lorenz curve, PCM
# energy) and the never-checked tail; re-proof for the stale r1/r2-only
# greens; guards for the r5-touched queries; the rest regression guards over
# the r4-green tier (displaced guards all hold fresh r4 driver greens). dedup_cluster_lsh is the single
# rows-only entry by design (probabilistic LSH recall — the driver records
# the weaker rows/schema check).
REQUIRED_IN_WINDOW = {
    "vector": [
        "vector_drift_report",
        "ann_pq_topk",
        "vector_pca_power",
        "ann_ivf_topk",
        "vector_centroids",
        "vector_norms",
        "vector_quantize_int8",
        "knn_mmr_diverse",
        "ann_lsh_topk",
    ],
    "graph": ["graph_label_propagation"],
    "dedup": [
        "dedup_jaccard_pairs_capped",
        "dedup_exact_substring",
        "dedup_dbscan_grid",
        "dedup_cluster_lsh",
        "dedup_survivorship",
        "dedup_levenshtein_pairs",
        "dedup_blocking_eval",
    ],
    "join": ["join_feature_store_pit", "pipeline_bloom_prefilter"],
    "multimodal": [
        "multimodal_format_detect",
        "multimodal_audio_energy",
        "multimodal_video_frames",
    ],
    "text": ["text_perplexity_filter", "text_bm25_topk", "text_bigram_lm_score", "text_ngram_novelty"],
    "events": [
        "events_association_rules",
        "events_funnel",
        "events_json_extract",
        "events_pivot",
        "events_cdc_apply",
        "events_ab_experiment",
        "events_lorenz_curve",
        "events_rfm_segmentation",
    ],
    "stats": [
        "agg_gini_concentration",
        "agg_mode",
        "agg_regression_trend",
        "stats_kanonymity_audit",
        "stats_benford_audit",
        "case_bucketing",
    ],
    "pipeline": [
        "pipeline_fk_integrity",
        "pipeline_rag_manifest",
    ],
    "curation": ["curation_temperature_mix", "curation_cluster_split", "curation_shard_manifest"],
    "window": ["window_period_over_period"],
    "sketch": [
        "agg_bottomk_quantile_sketch",
        "agg_kmv_merge",
        "agg_kmv_intersection",
    ],
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
    # dedup_cluster_lsh rotates in per VERDICT r4 task 3 — it is rows-only
    # BY DESIGN (LSH recall is probabilistic; precision pinned in
    # tests/test_operators.py), and it has never had a driver row of any
    # kind. Everything else in the window is oracle-backed.
    rows_only = {n for n in PRIORITY_WINDOW if n not in oracles}
    assert rows_only == {"dedup_cluster_lsh"}
