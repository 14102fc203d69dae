"""Pin the catalog iteration order so every capability class stays inside the
external harness's verification window (first 50 entries of ``queries()``).

Round-1 lesson: import order alone left all dedup/vector/text/stats/pipeline/
streaming entries outside the window, so they got no external correctness row
despite passing the identical local oracle comparison.
"""

from __future__ import annotations

from vmhub_data_pipeline_spark.queries import PRIORITY_WINDOW, queries, oracle_sql

WINDOW = 50

# Round-6 composition (VERDICT r5 task 2): the window rotates onto the 38
# queries whose ONLY driver evidence was round-1, plus 12 slots for the
# round's changes (NTILE rewrites + capped-Jaccard guards, the three LSH /
# SimHash oracle upgrades, six new queries). The class-coverage requirement
# below reflects THIS composition: the vector / multimodal / streaming /
# pipeline / graph tiers deliberately sit the round out — every entry of
# theirs holds an r4/r5 driver green, the freshest evidence in the catalog,
# while the r1 tier's rows were five fixture/canonicalizer generations old.
REQUIRED_IN_WINDOW = {
    "agg": ["agg_rollup", "agg_cube", "agg_grouping_sets", "agg_count_distinct"],
    "join": [
        "join_q2_min_cost_supplier",
        "join_q11_important_stock",
        "join_q16_supplier_variety",
        "join_q5_region_revenue",
        "join_semi",
        "join_anti",
    ],
    "window": ["window_rank", "window_ntile", "window_running_sum"],
    "setops": ["set_intersect", "set_except", "set_union_distinct"],
    "scan-agg": ["daily_revenue", "q6_forecast_revenue"],
    "events": ["events_sliding_2h", "events_rfm_segmentation", "events_lorenz_curve"],
    "text": ["text_stats", "text_token_count"],
    "dedup": [
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_cluster_lsh",
        "dedup_jaccard_pairs_capped",
    ],
    "stats": ["stats_psi_drift", "agg_stats_by_segment"],
    "sketch": ["agg_theta_difference"],
    "curation": ["curation_dsir_weights"],
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
    # Since r6 every window member is oracle-backed: the md5-portable
    # MinHash/SimHash rework upgraded the last LSH rows-only entries
    # (dedup_minhash_lsh, dedup_simhash, dedup_cluster_lsh) to full DuckDB
    # replays; the two remaining catalog rows-only entries
    # (agg_approx_sketches, multimodal_features) are engine/Python-bound
    # by design and stay outside the window.
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
