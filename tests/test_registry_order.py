"""Pin the catalog iteration order so every capability class stays inside the
external harness's verification window (first 50 entries of ``queries()``).

Round-1 lesson: import order alone left all dedup/vector/text/stats/pipeline/
streaming entries outside the window, so they got no external correctness row
despite passing the identical local oracle comparison.
"""

from __future__ import annotations

from vmhub_data_pipeline_spark.queries import PRIORITY_WINDOW, queries, oracle_sql

WINDOW = 50

# Round-8 composition (VERDICT r7 tasks 1+2): the window rotates onto 36
# of the 48 queries whose latest driver evidence is round-3 (the oldest
# tier left after r7 retired the r2 tier; the remaining 12 queue for r9),
# plus 14 slots for the round's changes (first contact for
# streaming_psi_bins — the catalog's only zero-evidence query — and the
# seven NEW r8 queries, plus one regression guard per rewritten path: the
# shared drift-monitor preamble rewrote both numeric monitors, the BPE
# NULL coalesce, the _query_lut_col signature + fused composed fits
# cover both IVF-PQ probes, the session-evicting LSH pair-set cache).
# The class-coverage requirement below reflects THIS composition: the
# r4-r7-fresh tiers (window functions, setops, scan-agg, subquery, the
# pipeline_ops family, most streaming) sit the round out.
REQUIRED_IN_WINDOW = {
    "agg": ["agg_kmv_distinct", "agg_hll_distinct"],
    "join": [
        "join_q13_order_distribution",
        "join_q18_large_orders",
        "join_salted_skew",
    ],
    "events": ["events_tumbling_day", "events_scd2_history"],
    "text": ["text_langid", "text_tfidf_topterms", "text_line_dedup_rebuild"],
    "dedup": [
        "dedup_winnow_pairs",
        "dedup_semantic",
        "dedup_incremental_exact",
        "dedup_cluster_lsh",
        "dedup_incremental_lsh",
        "text_passage_dedup_rebuild",
    ],
    "vector": [
        "ann_ivfpq_topk",
        "ann_ivfpq_residual_topk",
        "ann_ivfpq_add_batch",
        "ann_ivf_cell_stats",
        "ann_ivf_rebalance",
        "ann_ivfpq_filtered_topk",
        "ann_ivf_delete",
        "ann_ivfpq_persist_probe",
        "knn_int8_rerank",
    ],
    "graph": ["graph_pagerank_dups"],
    "multimodal": ["multimodal_decode_dims", "multimodal_pixel_stats"],
    "stats": ["stats_psi_drift", "stats_ks_drift"],
    "curation": [
        "curation_domain_mix",
        "curation_bpe_encode",
    ],  # curation_build_vocab + curation_tokenize_apply rotated to the r9 queue
    "streaming": [
        "streaming_psi_bins",
        "streaming_ann_route",
        "streaming_late_data_drop",
    ],
    "pipeline": ["pipeline_corpus_curation"],
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
    # The r8 rotation's r3-evidence tier is fully oracle-backed, and so
    # are the round's eleven first contacts and six guards — the catalog's
    # two BY-DESIGN rows-only entries (agg_approx_sketches,
    # multimodal_features) hold fresh r7 driver rows and sit this round
    # out, so EVERY window member is oracle-backed.
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
