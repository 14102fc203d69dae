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
# Round-3 composition: r2's failure + changed oracles first, then the 24
# queries that never received a driver row, then the post-drift events tier,
# then one r2-green guard per class.
REQUIRED_IN_WINDOW = {
    "dedup": [
        "dedup_semantic",
        "dedup_incremental_exact",
        "dedup_sorted_neighborhood",
    ],
    "vector": ["knn_cosine_topk", "vector_quantize_int8", "knn_int8_rerank"],
    "text": [
        "text_langid",
        "text_tfidf_topterms",
        "text_classifier_score",
        "text_perplexity_filter",
        "text_quality_filter",
        "text_repetition_signals",
    ],
    "pipeline": [
        # pipeline_training_manifest rotated out in round 3b (r2-green;
        # composed stages severally checked) for dedup_sorted_neighborhood
        "pipeline_corpus_curation",
        "pipeline_rag_retrieval",
    ],
    "streaming": [
        "streaming_dedup_replay",
        "streaming_session_windows",
        "streaming_pii_redact",
    ],
    "dedup_cluster": ["graph_pagerank_dups"],
    "multimodal": [
        "multimodal_decode_dims",
        "multimodal_chunk_sample",
        "multimodal_pixel_stats",
    ],
    "curation": [
        "curation_chunk_windows",
        "curation_bpe_merges",
        "curation_domain_mix",
        "curation_decontaminate_exact",
        "curation_decontaminate_ngram",
        "curation_build_vocab",
        "curation_tokenize_apply",
        "curation_upsample_epochs",
        "text_line_dedup_rebuild",
    ],
    # regression guard: previously-verified classes (displaced members —
    # agg_percentiles, subquery_correlated_scalar, topk_orders, events_pivot,
    # all r1+r2 double-green — keep local-oracle coverage via the
    # tests/test_queries_oracle.py full-catalog run)
    "window": ["events_dedup_latest", "events_retention_cohort"],
    "join": [
        "join_q8_market_share",
        "join_q15_top_supplier",
        "join_q21_waiting_supplier",
        "join_salted_skew",
    ],
    "events": ["events_watermark", "events_scd2_history"],
    "sketch": ["agg_kmv_distinct", "agg_hll_distinct"],
    # round-3b additions: winnowing fingerprints + pair matching, weighted
    # sampling, and the Spark 4 VARIANT path
    "winnow": ["text_winnow_fingerprint", "dedup_winnow_pairs"],
    "sampling": ["curation_weighted_sample"],
    "variant": ["events_variant_extract"],
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
