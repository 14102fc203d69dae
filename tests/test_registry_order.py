"""Pin the catalog iteration order so every capability class stays inside the
external harness's verification window (first 50 entries of ``queries()``).

Round-1 lesson: import order alone left all dedup/vector/text/stats/pipeline/
streaming entries outside the window, so they got no external correctness row
despite passing the identical local oracle comparison.
"""

from __future__ import annotations

from vmhub_data_pipeline_spark.queries import PRIORITY_WINDOW, queries, oracle_sql

WINDOW = 50

# Round-9 composition (VERDICT r8 tasks 1+9): the window rotates onto
# ALL 46 queries whose latest driver evidence is round 3 or round 4 —
# clearing the freshness queue entirely (after r9 no query's evidence
# predates round 5) — plus 3 first contacts for the r9 additions (LSH
# index append, streamed index growth, OPQ) and one regression guard for
# the round's rewritten path (vector_pca_power — the _power_top_pc
# extraction OPQ's rotation fit shares). The class-coverage requirement
# below reflects THIS composition: the r5-r8-fresh tiers (window
# functions, setops, scan-agg, subquery, most joins, the ANN serving
# family) sit the round out.
REQUIRED_IN_WINDOW = {
    "agg": ["agg_cms_heavy_hitters"],
    "join": ["join_q9_product_profit"],
    "events": [
        "events_retention_cohort",
        "events_ordered_funnel",
        "events_multitouch_attribution",
    ],
    "text": ["text_corpus_quality_report", "text_collocations_pmi"],
    "dedup": ["dedup_lsh_index_append", "dedup_overlap_matrix"],
    "vector": ["ann_opq_topk", "vector_pca_power"],
    "graph": ["graph_triangle_count"],
    "multimodal": ["multimodal_chunk_sample", "multimodal_audio_stats"],
    "stats": ["stats_chi2_drift", "stats_histogram_profile", "stats_winsorize"],
    "curation": [
        "curation_build_vocab",
        "curation_tokenize_apply",
        "curation_bpe_merges",
    ],
    "streaming": [
        "streaming_index_growth",
        "streaming_dedup_replay",
        "streaming_pii_redact",
        "streaming_incremental_dedup",
    ],
    "pipeline": ["pipeline_rag_retrieval", "pipeline_quality_audit"],
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
