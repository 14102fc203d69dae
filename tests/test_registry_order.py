"""Pin the catalog iteration order so every capability class stays inside the
external harness's verification window (first 50 entries of ``queries()``).

Round-1 lesson: import order alone left all dedup/vector/text/stats/pipeline/
streaming entries outside the window, so they got no external correctness row
despite passing the identical local oracle comparison.
"""

from __future__ import annotations

from vmhub_data_pipeline_spark.queries import PRIORITY_WINDOW, queries, oracle_sql

WINDOW = 50

# Round-14 composition (VERDICT r13 task 4): 3 first contacts for the
# r13-build additions that never had driver contact, 5 regression guards
# for the paths most rewritten by the two optimization rounds, and 42
# slots draining the oldest evidence (the 9 oracle-backed r7 stragglers,
# then the r8 cohort in registration order, tail swapped so agg and
# stats keep coverage). The no-oracle entries (agg_approx_sketches,
# multimodal_features) sit out; everything rotated out stays covered by
# the full-catalog local mirror at sf0.001.
REQUIRED_IN_WINDOW = {
    "agg": ["agg_hll_distinct"],
    "stats": ["stats_psi_drift"],
    "join": ["join_q8_market_share", "join_salted_skew"],
    "subquery": ["subquery_correlated_scalar"],
    "setops": ["set_union_all"],
    "events": ["events_tumbling_day", "events_scd2_history"],
    "text": ["text_langid", "text_quality_filter", "text_tfidf_topterms"],
    "curation": ["curation_hash_split", "curation_global_shuffle"],
    "pipeline": [
        "pipeline_index_maintenance",
        "pipeline_rag_retrieval",
        "pipeline_corpus_curation",
    ],
    "dedup": [
        "dedup_lsh_grown_maintenance",
        "dedup_incremental_lsh",
        "dedup_minhash_lsh",
        "dedup_winnow_pairs",
        "dedup_sorted_neighborhood",
    ],
    "vector": [
        "ann_ivf_rebalance_all",
        "vector_pca_power",
        "ann_ivf_cell_stats",
        "knn_int8_rerank",
    ],
    "graph": ["graph_pagerank_dups"],
    "streaming": [
        "streaming_tumbling_day",
        "streaming_session_windows",
        "streaming_interval_join",
    ],
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
    # The catalog's two BY-DESIGN rows-only entries (agg_approx_sketches,
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
