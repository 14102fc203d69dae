"""Pin the catalog iteration order so every capability class stays inside the
external harness's verification window (first 50 entries of ``queries()``).

Round-1 lesson: import order alone left all dedup/vector/text/stats/pipeline/
streaming entries outside the window, so they got no external correctness row
despite passing the identical local oracle comparison.
"""

from __future__ import annotations

from vmhub_data_pipeline_spark.queries import PRIORITY_WINDOW, queries, oracle_sql

WINDOW = 50

# Round-7 composition (VERDICT r6 task 3): the window rotates onto the 39
# queries whose latest driver evidence is round-2 (the oldest tier left
# after r6 retired the r1 tier), plus 11 slots for the round's changes
# (the five NEW queries — composed IVF-PQ, its residual-coded twin, the
# TPC-H Q20 analog, the KS drift monitor, the BPE encode pass — and one
# regression guard per rewritten plan-machinery path, each picked by
# its widest consumer: SQL-literal ANN builders, constraint-stripped
# index checkpoints, the PSI order-statistic fetch, the shared LSH
# signature cache, the zip_with_global_index change). The class-coverage
# requirement below reflects THIS composition: the r3-r6-fresh tiers
# (multimodal, graph, most streaming, most pipeline) sit the round out.
REQUIRED_IN_WINDOW = {
    "agg": ["agg_percentiles", "agg_arg_minmax", "agg_variance_corr"],
    "join": [
        "join_q20_potential_promotion",
        "join_q3_shipping",
        "join_asof_attribution",
    ],
    "window": ["window_topk_per_group"],
    "setops": ["set_union_all"],
    "scan-agg": ["q1_pricing_summary"],
    "events": ["events_sessionize", "events_rfm_segmentation"],
    "text": ["text_quality", "text_pii_redact", "text_fingerprint"],
    "dedup": [
        "dedup_exact",
        "dedup_jaccard_pairs",
        "dedup_cluster_cc",
        "dedup_cluster_lsh",
    ],
    "vector": [
        "ann_ivfpq_topk",
        "ann_ivfpq_residual_topk",
        "ann_pq_topk",
        "ann_ivf_topk",
        "knn_cosine_topk",
    ],
    "stats": ["stats_psi_drift", "stats_ks_drift"],
    "curation": [
        "curation_hash_split",
        "curation_global_shuffle",
        "curation_bpe_encode",
    ],
    "streaming": ["streaming_tumbling_day", "streaming_interval_join"],
    "pipeline": ["pipeline_lake_paths", "pipeline_date_series"],
    "subquery": ["subquery_exists", "subquery_correlated_scalar"],
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
    # The r7 rotation brings the r2-evidence tier into the window, which
    # includes the catalog's two BY-DESIGN rows-only entries (their r2
    # driver row was also rows-only — that IS their freshest obtainable
    # evidence class): agg_approx_sketches (engine-native sketch
    # internals) and multimodal_features (PIL-absent fake decode). Every
    # other window member is oracle-backed.
    rows_only = {n for n in PRIORITY_WINDOW if n not in oracles}
    assert rows_only == {"agg_approx_sketches", "multimodal_features"}


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
