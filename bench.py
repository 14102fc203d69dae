"""Benchmark harness (driver contract): run the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

"value" is the total wall-clock of all headline queries (each executed to
completion via a count-collecting action). Spark session build time is
excluded — the metric is query execution, matching how the reference's
baseline is derived (per-operation pacing, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vmhub_data_pipeline_spark import queries as catalog
from vmhub_data_pipeline_spark.session import build_session

# Representative slice of SURVEY §2: scan+agg, star joins, windows,
# sessionization, text, dedup (exact + LSH), vector search, percentile
# stats, and a REAL Structured Streaming execution — one entry per tier so
# a round-over-round regression in any tier is visible in BENCH_r{N}.
HEADLINE = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "daily_revenue",
    "agg_percentiles",
    "join_q3_shipping",
    "join_q5_region_revenue",
    "join_asof_attribution",
    "window_topk_per_group",
    "window_running_sum",
    "events_sessionize",
    "text_langid",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_cosine_topk",
    "streaming_tumbling_day",
    "streaming_interval_join",
    # the scale-path clustering (LSH pairs -> CC). The exact variant
    # dedup_cluster_cc stays in the catalog/correctness window but not the
    # bench: the fixture's ~30-word vocabulary makes EVERY token hot, so
    # exact inverted-index pair generation degenerates to all-pairs at
    # sf0.1 (~23 s) — a fixture pathology, not the operator's scale story.
    "dedup_cluster_lsh",
    # dataset-assembly tier: scan-speed PII scrub + the distributed
    # zipWithIndex global shuffle (range repartition + enumerate)
    "text_pii_redact",
    "curation_global_shuffle",
    # model-based filtering tier: hashed-linear classifier (scan-speed),
    # per-language perplexity terciles, bucket-scoped semantic dedup
    "text_classifier_score",
    "text_perplexity_filter",
    "dedup_semantic",
    # round 3: storage quantization (scan-speed zip_with) + the line-dedup
    # rebuild (one text-carrying shuffle + doc-grain reassembly)
    "vector_quantize_int8",
    "text_line_dedup_rebuild",
    # round 3b: winnowing selection (pure scan-stage array-math throughput),
    # the deterministic HLL register fold, and the Arrow-batched real pixel
    # decode — one entry per new tier
    "text_winnow_fingerprint",
    "agg_hll_distinct",
    "multimodal_pixel_stats",
    # round 3c: the attribution join+window family and the two-pass
    # broadcast-bounds profiler — one entry per new tier
    "events_multitouch_attribution",
    "stats_histogram_profile",
    # round 5: the PRODUCTION capped near-dup configuration (df<=100
    # candidate gen + exact re-verify — the scale path, now oracle-checked)
    # and the scan-side scatter-matrix PCA (dim^2 agg keys, O(model) driver
    # math) — both newly registered/upgraded, neither had timing history
    "dedup_jaccard_pairs_capped",
    "vector_pca_power",
    # round 5 additions: passage-grain exact-substring audit (digest-only
    # shuffles), bigram-LM scoring (vocab^2 profile join), and the
    # scan-stage PCM energy fold — one entry per new tier
    "dedup_exact_substring",
    "text_bigram_lm_score",
    "multimodal_audio_energy",
    # round 6: the pseudo-partsupp correlated-min star join (broadcast dims
    # + partitioned min window + TakeOrderedAndProject), the distributed-
    # NTILE PSI drift monitor, and the DSIR token-explode scoring pass —
    # one entry per new tier
    "join_q2_min_cost_supplier",
    "stats_psi_drift",
    "curation_dsir_weights",
]

# Every headline entry runs 3 times, median recorded (r4; previously only
# the entries that had PROVEN noisy got repeats, which made single-run blips
# — e.g. text_pii_redact +58% in r3 on an unchanged zero-shuffle plan —
# indistinguishable from regressions). First-run effects being amortized:
# cold columnar reads (~2x on the LSH entries), one-time python-worker
# spawn + codegen compile on Arrow/mapInPandas paths (4-8x measured).
REPEATS_DEFAULT = 3

# Iterative-graph tier tracked at sf0.01: the exact-pair stage both entries
# share is fixture-pathological at sf0.1 (~30-word vocabulary makes every
# token hot — see the dedup_cluster_lsh note above), but the per-round CC /
# PageRank shuffle cost is exactly what needs round-over-round visibility.
# Reported under "secondary"/"secondary_sf"; excluded from the headline
# total so "value" stays comparable with BENCH_r01/r02.
SECONDARY = [
    "dedup_cluster_cc",
    "graph_pagerank_dups",
    "curation_bpe_merges",
    # shares the exact-pair stage's fixture pathology, so sf0.01 like the rest
    "graph_triangle_count",
    # winnow-candidate generation + per-pair O(len^2) DP — tracked so a
    # re-inlining regression (see the localCheckpoint note in the query)
    # shows up round-over-round
    "dedup_levenshtein_pairs",
    # CC + cluster-grain survivorship: tracks the golden-record join cost
    # on top of the shared iterative closure
    "dedup_survivorship",
    # r5: first timing history for the unrolled-oracle ANN pair — the IVF
    # Lloyd fit + probed-cell re-rank. (ann_pq_topk is split below into
    # ann_pq_fit / ann_pq_probe — VERDICT r5 task 4: the 8.49 s r5 number
    # was ~all training fit, which a serving system pays once per corpus,
    # not per query.)
    "ann_ivf_topk",
    # r5: cluster-aware split = CC + cluster-size join + hash assignment;
    # tracked at sf0.01 with the rest of the iterative exact-pair tier
    "curation_cluster_split",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = build_session("vmhub-bench")
    qs = catalog.queries()

    # warm-up: JVM/codegen startup + parquet footer/file-index priming so
    # query 1 doesn't pay one-time session costs (bench measures queries)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from vmhub_data_pipeline_spark.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).collect()
    # land the streaming fixture outside the timed region: the NDJSON
    # re-land is test harness, not query execution (cached per sf_dir)
    from vmhub_data_pipeline_spark.queries.streaming_queries import _landed_events

    _landed_events(spark, sf_dir)

    def run_once(name: str, d: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        n = qs[name](spark, d).count()
        return time.perf_counter() - t0, n

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        runs = [run_once(name, sf_dir) for _ in range(REPEATS_DEFAULT)]
        dt = sorted(t for t, _ in runs)[len(runs) // 2]  # median
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({runs[0][1]} rows, {len(runs)} run(s))", file=sys.stderr)

    sec_dir = os.environ.get("SPARK_GRAFT_SECONDARY_SF_DIR", "/root/testdata/sf0.01")
    sec_sf = float(sec_dir.rstrip("/").rsplit("sf", 1)[-1])
    secondary: dict[str, float] = {}
    for name in SECONDARY:
        # 3-run median here too (r5; VERDICT r4 task 5): single runs made
        # noise and regression indistinguishable on the 1-3 s iterative tier
        runs = [run_once(name, sec_dir) for _ in range(REPEATS_DEFAULT)]
        dt = sorted(t for t, _ in runs)[len(runs) // 2]
        secondary[name] = round(dt, 3)
        print(
            f"# [secondary sf{sec_sf}] {name}: {dt:.3f}s "
            f"({runs[0][1]} rows, {len(runs)} run(s))",
            file=sys.stderr,
        )

    # PQ fit vs probe, reported apart (VERDICT r5 task 4): the codebook fit
    # is a train-once cost (O(corpus x iter) distributed, O(model) driver),
    # the probe is what a query actually pays against the resident index.
    from vmhub_data_pipeline_spark.queries.vector import _PQ_FIT_CACHE, pq_index_cached

    _PQ_FIT_CACHE.clear()
    t0 = time.perf_counter()
    pq_index_cached(spark, sec_dir)
    secondary["ann_pq_fit"] = round(time.perf_counter() - t0, 3)
    probe_runs = [run_once("ann_pq_topk", sec_dir) for _ in range(REPEATS_DEFAULT)]
    secondary["ann_pq_probe"] = round(
        sorted(t for t, _ in probe_runs)[len(probe_runs) // 2], 3
    )
    print(
        f"# [secondary sf{sec_sf}] ann_pq_fit: {secondary['ann_pq_fit']:.3f}s, "
        f"ann_pq_probe: {secondary['ann_pq_probe']:.3f}s "
        f"({probe_runs[0][1]} rows)",
        file=sys.stderr,
    )

    # sf-growth probe for the quadratic-adjacent candidate-pair tiers: the
    # df/hot-gram caps argue the candidate volume (Σdf²) stays near-linear;
    # one measured exponent per round PROVES it. e = log(t_hi/t_lo) /
    # log(rows_hi/rows_lo) over the documents table — e ≈ 1 linear,
    # e ≈ 2 quadratic. Median of 3 runs per scale (these run in 0.1-3 s,
    # where single-run noise would swamp the exponent).
    #
    # dedup_jaccard_pairs (the registered query) runs UNCAPPED by design —
    # the fixture's ~30-word vocabulary makes every token hot, so the exact
    # full-recall variant IS Σdf²-quadratic there (measured e ≈ 1.7; that
    # number is the fixture pathology the query's docstring documents, not
    # the operator's scale story). The production configuration is probed
    # alongside as jaccard_capped (max_token_doc_freq=100, candidates from
    # sub-cap tokens only + exact re-verify): its exponent is the one that
    # must stay ~1.
    def _jaccard_capped(s, d):
        from vmhub_data_pipeline_spark.operators.dedup import jaccard_similarity_pairs

        docs = s.read.parquet(f"{d}/documents.parquet")
        return jaccard_similarity_pairs(
            docs, "doc_id", "text", threshold=0.9, group_col="lang",
            max_token_doc_freq=100,
        )

    scaling: dict[str, dict] = {}
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        import math

        row_counts: dict[tuple[str, str], int] = {}

        def nrows(d: str, table: str) -> int:
            key = (d, table)
            if key not in row_counts:
                row_counts[key] = spark.read.parquet(f"{d}/{table}.parquet").count()
            return row_counts[key]

        # (probe, fn, table whose row count defines the scale ratio).
        # r6 additions (VERDICT r5 task 6): the r5 queries with
        # super-linear potential — exact-substring's digest-grain counts
        # under boilerplate skew, grid-DBSCAN's cell-graph CC rounds vs
        # density, and the Bloom prefilter's k-bit explode.
        probes = [
            ("dedup_jaccard_pairs", lambda s, d: qs["dedup_jaccard_pairs"](s, d), "documents"),
            ("jaccard_capped_100", _jaccard_capped, "documents"),
            ("dedup_winnow_pairs", lambda s, d: qs["dedup_winnow_pairs"](s, d), "documents"),
            ("curation_decontaminate_ngram", lambda s, d: qs["curation_decontaminate_ngram"](s, d), "documents"),
            ("dedup_exact_substring", lambda s, d: qs["dedup_exact_substring"](s, d), "documents"),
            ("dedup_dbscan_grid", lambda s, d: qs["dedup_dbscan_grid"](s, d), "embeddings"),
            ("pipeline_bloom_prefilter", lambda s, d: qs["pipeline_bloom_prefilter"](s, d), "orders"),
        ]
        for name, fn, table in probes:
            rows_lo, rows_hi = nrows(sec_dir, table), nrows(sf_dir, table)

            def once(d):
                t0 = time.perf_counter()
                fn(spark, d).count()
                return time.perf_counter() - t0

            t_lo = sorted(once(sec_dir) for _ in range(3))[1]
            t_hi = sorted(once(sf_dir) for _ in range(3))[1]
            e = math.log(t_hi / t_lo) / math.log(rows_hi / rows_lo)
            scaling[name] = {
                "t_lo": round(t_lo, 3),
                "t_hi": round(t_hi, 3),
                "rows_lo": rows_lo,
                "rows_hi": rows_hi,
                "exponent": round(e, 3),
            }
            print(
                f"# [scaling] {name}: {t_lo:.3f}s @{rows_lo} -> {t_hi:.3f}s @{rows_hi}"
                f" (e={e:.3f})",
                file=sys.stderr,
            )

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "secondary": secondary,
                "secondary_sf": sec_sf,
                "scaling": scaling,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
