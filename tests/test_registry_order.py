"""Pin the catalog iteration order so every capability class stays inside the
external harness's verification window (first 50 entries of ``queries()``).

Round-1 lesson: import order alone left all dedup/vector/text/stats/pipeline/
streaming entries outside the window, so they got no external correctness row
despite passing the identical local oracle comparison.
"""

from __future__ import annotations

from vmhub_data_pipeline_spark.queries import PRIORITY_WINDOW, queries, oracle_sql

WINDOW = 50

# Round-10 composition (VERDICT r9 tasks 1-5): the window rotates onto
# ALL 42 queries whose latest driver evidence is round 5 — after r10 no
# query's evidence predates round 6 — plus 5 first contacts for the r10
# additions (LSH persist probe / tombstone delete / bucket-occupancy
# audit / streamed LSH growth / IVF-OPQ), 2 regression guards for the
# rewritten paths (dedup_lsh_index_append's single-signature-pass audit,
# streaming_index_growth's loud-timeout contract), and the 1 spare slot
# starting the r6 queue (q6_forecast_revenue). The class-coverage
# requirement below reflects THIS composition: the r7-r9-fresh tiers
# (window functions, setops, subquery, most star joins, most of the ANN
# serving family) sit the round out.
REQUIRED_IN_WINDOW = {
    "agg": ["agg_mode", "agg_kmv_merge", "agg_regression_trend"],
    "join": ["join_feature_store_pit"],
    "events": [
        "events_funnel",
        "events_cdc_apply",
        "events_ab_experiment",
    ],
    "text": ["text_bm25_topk", "text_perplexity_filter"],
    "dedup": [
        "dedup_lsh_persist_probe",
        "dedup_lsh_index_delete",
        "dedup_lsh_bucket_stats",
        "dedup_lsh_index_append",
        "dedup_exact_substring",
    ],
    "vector": ["ann_ivfopq_topk", "vector_centroids", "vector_drift_report"],
    "graph": ["graph_label_propagation"],
    "multimodal": ["multimodal_format_detect", "multimodal_video_frames"],
    "stats": ["stats_kanonymity_audit", "stats_benford_audit"],
    "curation": [
        "curation_temperature_mix",
        "curation_cluster_split",
        "curation_shard_manifest",
    ],
    "streaming": [
        "streaming_lsh_index_growth",
        "streaming_index_growth",
        "streaming_cms_fold",
    ],
    "pipeline": ["pipeline_fk_integrity", "pipeline_rag_manifest"],
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
    # The r9 rotation's r3/r4-evidence tiers are fully oracle-backed, and
    # so are the round's three first contacts and the guard — the
    # catalog's two BY-DESIGN rows-only entries (agg_approx_sketches,
    # multimodal_features) hold r7 driver rows and sit this round out, so
    # EVERY window member is oracle-backed.
    rows_only = {n for n in PRIORITY_WINDOW if n not in oracles}
    assert rows_only == set()


def test_readme_counts_match_registry():
    """README's catalog counts must track the registry (VERDICT r5 task 5:
    r4's 'totals in lockstep' fix reached COVERAGE.md but not README — this
    makes the README numbers un-stale-able)."""
    import os
    import re

    from vmhub_data_pipeline_spark import queries as catalog

    catalog._load_all()
    readme = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")
    ).read()
    m = re.search(r"(\d+) named queries, (\d+) with DuckDB oracle", readme)
    assert m, "README no longer states catalog counts"
    n_q, n_o = int(m.group(1)), int(m.group(2))
    assert n_q == len(catalog.REGISTRY), (n_q, len(catalog.REGISTRY))
    assert n_o == sum(1 for q in catalog.REGISTRY.values() if q.oracle), n_o
