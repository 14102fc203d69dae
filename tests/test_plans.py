"""Physical-plan regression gates: the plans we shipped are the plans we
keep (SURVEY §4; the 100 TB design stance enforced as assertions)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vmhub_data_pipeline_spark import queries as catalog
from vmhub_data_pipeline_spark.plans import (
    count_exchanges,
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    has_window_group_limit,
)

catalog._load_all()
Q = catalog.REGISTRY


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    """All four Q6 predicates must reach the parquet reader."""
    df = Q["q6_forecast_revenue"].fn(spark, sf_dir)
    assert has_pushed_filters(df, "l_shipdate", "l_discount", "l_quantity")


def test_q1_column_pruning(spark, sf_dir):
    """Q1 reads 7 of 11 lineitem columns; ReadSchema must not contain the
    unused join keys."""
    plan = explain_str(Q["q1_pricing_summary"].fn(spark, sf_dir))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, "no ReadSchema in plan"
    s = read_schema[0]
    assert "l_partkey" not in s and "l_suppkey" not in s and "l_orderkey" not in s


def test_broadcast_dims_stay_broadcast(spark, sf_dir):
    """Fixed-size dims must broadcast (J1 lookup-join shape) — a silent
    regression to sort-merge join is a 100 TB shuffle of the fact table."""
    assert has_broadcast_join(Q["join_broadcast_dim"].fn(spark, sf_dir))
    assert has_broadcast_join(Q["join_q5_region_revenue"].fn(spark, sf_dir))


def test_topk_plans_as_group_limit(spark, sf_dir):
    """rank<=k filters must plan as WindowGroupLimit (per-partition top-k),
    not a full per-key sort."""
    assert has_window_group_limit(Q["window_topk_per_group"].fn(spark, sf_dir))
    assert has_window_group_limit(Q["events_dedup_latest"].fn(spark, sf_dir))


def test_global_topk_is_take_ordered(spark, sf_dir):
    plan = explain_str(Q["topk_orders"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


@pytest.mark.slow
def test_no_cartesian_in_pair_generation(spark, sf_dir):
    """Near-dup pair generation must never degrade to CartesianProduct —
    the inverted-index/LSH/bucket equi-joins are the whole point."""
    for name in ("dedup_jaccard_pairs", "dedup_minhash_lsh", "dedup_simhash", "dedup_semantic"):
        plan = explain_str(Q[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_classifier_score_is_scan_stage(spark, sf_dir):
    """The hashed-linear classifier is a pure projection: any exchange means
    the weight fold fell out of the scan stage."""
    assert count_exchanges(Q["text_classifier_score"].fn(spark, sf_dir)) == 0


def test_perplexity_profile_joins_are_broadcast(spark, sf_dir):
    """Perplexity scoring joins the (vocab x langs) LM profile into the
    per-(doc,word) fact side — broadcast at any corpus size, like langid."""
    plan = explain_str(Q["text_perplexity_filter"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_knn_broadcasts_queries_not_corpus(spark, sf_dir):
    """Brute-force kNN: the query side broadcasts; the corpus must stream
    (no shuffle of the big side before scoring)."""
    df = Q["knn_cosine_topk"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


@pytest.mark.slow
def test_shuffle_budgets(spark, sf_dir):
    """Exchange-count ceilings per query shape: catching a plan that grows
    an extra shuffle (e.g. a lost partitioning reuse) at review time."""
    budgets = {
        "q1_pricing_summary": 1,   # partial+final agg = 1 exchange
        "q6_forecast_revenue": 1,  # single scalar agg
        "daily_revenue": 1,
        "events_sessionize": 1,    # window + groupBy share one shuffle on user_id
        "window_running_sum": 1,
        "events_dedup_latest": 1,
        "text_line_dedup": 2,            # digest window + doc-grain groupBy
        "curation_pack_sequences": 1,    # shard window; final agg reuses its layout
        "curation_stratified_sample": 1, # WindowGroupLimit + one stratum shuffle
        "curation_hash_split": 1,        # split is scan-stage; audit agg shuffles once
        "curation_upsample_epochs": 0,   # generate-and-explode projection
    }
    for name, budget in budgets.items():
        n = count_exchanges(Q[name].fn(spark, sf_dir))
        assert n <= budget, f"{name}: {n} exchanges > budget {budget}"


def test_langid_profile_joins_are_broadcast(spark, sf_dir):
    """langid's profile/totals join against the exploded fact side must be
    broadcast — profile cardinality is vocab x langs (tiny) at any corpus
    size; a shuffle join would move the whole corpus twice."""
    plan = explain_str(Q["text_langid"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """S9+: two tables bucketed on the join key must sort-merge join with
    ZERO shuffle exchanges — the write-once/join-many topology that removes
    the per-join fact-table shuffle at scale."""
    from vmhub_data_pipeline_spark.pipeline.lake import write_bucketed_table

    sf = "/root/testdata/sf0.001"
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    write_bucketed_table(
        cust, "bkt_customer", ("c_custkey",), 4, sort_cols=("c_custkey",),
        path=str(tmp_path / "bkt_customer"),
    )
    write_bucketed_table(
        orders, "bkt_orders", ("o_custkey",), 4, sort_cols=("o_custkey",),
        path=str(tmp_path / "bkt_orders"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_orders").join(
            spark.table("bkt_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it's not just a plan artifact — the join actually runs
        assert joined.count() > 0
        # contrast: the same join over plain parquet shuffles both sides
        plain = orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_customer")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_q8_star_broadcasts_all_dims_single_shuffle(spark, sf_dir):
    """Q8's 8-way star: every dimension leg (part filter, both nation
    roles, region, supplier) must ride broadcast joins, leaving exactly
    ONE exchange — the final groupBy. A second exchange means a fact-table
    shuffle crept into the star."""
    df = Q["join_q8_market_share"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert count_exchanges(df) <= 1, plan


def test_quality_filter_is_zero_shuffle(spark, sf_dir):
    """The Gopher/C4 rule filter is per-row: its plan must contain NO
    exchange at all (scan-speed at 100 TB is the whole point)."""
    df = Q["text_quality_filter"].fn(spark, sf_dir)
    assert count_exchanges(df) == 0, explain_str(df)


def test_q15_reuses_revenue_agg_within_two_shuffles(spark, sf_dir):
    """Q15 computes the revenue view, its scalar max, and the supplier
    attach within two exchanges (the groupBy + one for the max); the top
    set must come back as a broadcast, never a supplier-side shuffle."""
    df = Q["join_q15_top_supplier"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert has_broadcast_join(df), plan
    assert count_exchanges(df) <= 2, plan


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Runtime bloom-filter injection (the non-broadcast cousin of DPP):
    when a selective dimension side cannot broadcast, Spark should still
    push a bloom `might_contain` probe into the fact scan's filter —
    at 100 TB this is the difference between scanning lineitem in full
    and skipping most of it. Fixture tables sit under the size thresholds,
    so the test pins the CAPABILITY with thresholds scaled down; the
    session defaults keep production sizing."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)


def test_pii_redact_is_zero_shuffle(spark, sf_dir):
    """PII scrubbing is a pure regexp projection: no exchange anywhere —
    the redaction pass must run at scan speed over 100 TB."""
    df = Q["text_pii_redact"].fn(spark, sf_dir)
    assert count_exchanges(df) == 0, explain_str(df)


def test_hash_split_assignment_is_zero_shuffle(spark, sf_dir):
    """Split *assignment* (before the audit agg) must stay inside the scan
    stage: md5 + CASE projection, no exchange."""
    from vmhub_data_pipeline_spark.operators.sampling import assign_split
    from vmhub_data_pipeline_spark.tables import load

    (docs,) = load(spark, sf_dir, "documents")
    df = assign_split(docs, "doc_id", seed="split-v1")
    assert count_exchanges(df) == 0, explain_str(df)


def test_domain_mix_doc_side_joins_are_broadcast(spark, sf_dir):
    """The per-source threshold table (|sources| rows) must reach the
    per-document filter via broadcast — hash-shuffling the corpus to join
    a 20-row table would be the classic scale mistake."""
    plan = explain_str(Q["curation_domain_mix"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_vocab_rank_filter_plans_as_global_topk(spark, sf_dir):
    """The vocab truncation must filter on the BARE row_number attribute so
    limit pushdown fires: for the unpartitioned window that plans as
    TakeOrderedAndProject (distributed top-k merge). Deriving token_id
    first and filtering on it defeats the rule (measured: full
    single-partition sort of the vocab)."""
    plan = explain_str(Q["curation_build_vocab"].fn(spark, sf_dir), "simple")
    assert "TakeOrderedAndProject(limit=32" in plan, plan


def test_scd2_windows_share_one_shuffle(spark, sf_dir):
    """Both SCD2 windows partition by user_id; Catalyst must reuse a single
    exchange — a second shuffle would double the 100 TB event move."""
    df = Q["events_scd2_history"].fn(spark, sf_dir)
    assert count_exchanges(df) == 1


def test_quantize_fact_side_never_shuffles(spark, sf_dir):
    """int8 quantization: the corpus joins the per-dim scales via broadcast
    only; the two exchanges in the plan are the dims-sized scale aggregation
    (post partial-max) and its single-row collapse — never the fact table."""
    df = Q["vector_quantize_int8"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 2
    assert "CartesianProduct" not in explain_str(df)


def test_line_rebuild_shuffle_budget(spark, sf_dir):
    """Reconstruction floor: exactly one text-carrying window shuffle plus
    the doc-grain groupBy — any third exchange is a regression."""
    df = Q["text_line_dedup_rebuild"].fn(spark, sf_dir)
    assert count_exchanges(df) == 2


def test_chunk_windows_is_zero_shuffle(spark, sf_dir):
    """Retrieval chunking is pure scan-stage array math — any exchange means
    the 1.33x overlap fan-out started moving over the network."""
    df = Q["curation_chunk_windows"].fn(spark, sf_dir)
    assert count_exchanges(df) == 0


def test_tfidf_and_margin_rank_filters_group_limit(spark, sf_dir):
    """Per-doc top-k prunes must plan as WindowGroupLimit so per-partition
    pruning happens before the doc-grain shuffle."""
    assert has_window_group_limit(Q["text_tfidf_topterms"].fn(spark, sf_dir))
    assert has_window_group_limit(Q["text_langid_margin"].fn(spark, sf_dir))
    assert has_window_group_limit(Q["knn_int8_rerank"].fn(spark, sf_dir))


def test_incremental_dedup_never_cartesian(spark, sf_dir):
    """The new-batch audit joins on the content digest (plus one broadcast
    cutoff row) — a cartesian means the asymmetric index degenerated."""
    plan = explain_str(Q["dedup_incremental_exact"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan.replace("BroadcastNestedLoopJoin", "")
    assert has_broadcast_join(Q["dedup_incremental_exact"].fn(spark, sf_dir))


def test_winnow_fingerprint_is_zero_shuffle(spark, sf_dir):
    """Winnowing selection (shingle -> hash -> window-min -> distinct) is
    one scan-stage projection per document — any exchange means the shingle
    fan-out started moving over the network."""
    df = Q["text_winnow_fingerprint"].fn(spark, sf_dir)
    assert count_exchanges(df) == 0, explain_str(df)


def test_winnow_fingerprint_hashes_each_gram_once(spark, sf_dir):
    """Each gram must be md5-hashed exactly once into the array column. If
    CollapseProject ever re-inlines the hash array into the W slice()
    window-min consumers (the sentinel column stops it today), md5 appears
    W times in the plan and the stage degrades to O(n*W) hash evals —
    measured 3x slower at sf0.1, quadratic in the worst inlining."""
    plan = explain_str(Q["text_winnow_fingerprint"].fn(spark, sf_dir))
    assert plan.count("md5") == 1, f"md5 evaluated {plan.count('md5')} times"


def test_winnow_pairs_never_cartesian(spark, sf_dir):
    """The MOSS match step joins on the 52-bit fingerprint with a hot-key
    cap — a cartesian means the inverted index degenerated to all-pairs."""
    plan = explain_str(Q["dedup_winnow_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan.replace("BroadcastNestedLoopJoin", "")


def test_weighted_sample_plans_as_group_limit(spark, sf_dir):
    """The per-source rank<=k cut must plan as WindowGroupLimit so each map
    task forwards at most k rows per source into the shuffle."""
    assert has_window_group_limit(Q["curation_weighted_sample"].fn(spark, sf_dir))
    # cost computation is scan-stage: one exchange (the source window) only
    assert count_exchanges(Q["curation_weighted_sample"].fn(spark, sf_dir)) == 1


def test_variant_extract_single_shuffle(spark, sf_dir):
    """VARIANT parse + typed path reads are scan-stage; the only exchange
    is the decade groupBy (partial aggregation map-side)."""
    df = Q["events_variant_extract"].fn(spark, sf_dir)
    assert count_exchanges(df) == 1, explain_str(df)


def test_kmv_sketch_rank_prunes_map_side(spark, sf_dir):
    """The k-th-minimum cut must plan as WindowGroupLimit: each map task
    forwards at most k hashes per group — the bounded-state sketch property,
    held distributively."""
    df = Q["agg_kmv_distinct"].fn(spark, sf_dir)
    assert has_window_group_limit(df), explain_str(df)
    assert count_exchanges(df) <= 4


def test_hll_register_grain_bounded(spark, sf_dir):
    """HLL folds to (group x 512 registers) in the first aggregate — the
    shuffle budget pins the register-merge topology (distinct + register
    max + fold + exact twin + join)."""
    df = Q["agg_hll_distinct"].fn(spark, sf_dir)
    assert count_exchanges(df) <= 5, explain_str(df)


def test_triangle_count_never_cartesian(spark, sf_dir):
    """Oriented-edge triangle enumeration joins on node ids — a cartesian
    means an edge leg lost its equi-join key."""
    plan = explain_str(Q["graph_triangle_count"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan.replace("BroadcastNestedLoopJoin", "")


def test_quality_audit_one_pass_per_table(spark, sf_dir):
    """Every declared constraint folds into one scan per table — adding
    constraints must never add scans. (Exchanges are 2 per table: the
    count-distinct key shuffle + the single-row final fold.)"""
    df = Q["pipeline_quality_audit"].fn(spark, sf_dir)
    plan = explain_str(df)
    # formatted explain prints each node twice (tree + detail); count tree rows
    assert plan.count("+- Scan parquet") == 2, plan
    assert count_exchanges(df) <= 4, plan


def test_pixel_stats_decode_is_zero_shuffle(spark, sf_dir):
    """The pixel decode runs mapInPandas where the payload partitions live —
    any exchange means image bytes started moving over the network."""
    df = Q["multimodal_pixel_stats"].fn(spark, sf_dir)
    assert count_exchanges(df) == 0, explain_str(df)


def test_cdc_apply_single_key_shuffle(spark, sf_dir):
    """The MERGE apply is one keep-latest pass: the rank window and the
    change-count window share a single key exchange. (No WindowGroupLimit
    here BY DESIGN: n_changes needs every row of the partition, so the
    rn=1 prune cannot legally happen map-side.)"""
    df = Q["events_cdc_apply"].fn(spark, sf_dir)
    assert count_exchanges(df) <= 1, explain_str(df)


def test_gapfill_spine_joins_broadcast(spark, sf_dir):
    """The hour spine (single-row min/max explode) must broadcast onto the
    aggregate — a shuffled join would move the fact side for a dim of a
    few thousand rows."""
    assert has_broadcast_join(Q["events_gapfill_hourly"].fn(spark, sf_dir))


def test_mad_outlier_thresholds_broadcast(spark, sf_dir):
    """med/MAD collapse to |event_types| rows and broadcast back onto the
    fact scan — the outlier filter itself must not shuffle the facts."""
    assert has_broadcast_join(Q["events_outliers_mad"].fn(spark, sf_dir))


def test_partition_checksum_one_scan_one_shuffle(spark, sf_dir):
    """Row hashing is a scan projection; the only exchange is the
    month-grain SUM (map-side combined)."""
    df = Q["pipeline_partition_checksum"].fn(spark, sf_dir)
    assert count_exchanges(df) == 1, explain_str(df)


def test_rag_retrieval_composition_shape(spark, sf_dir):
    """The flagship retrieval plan: chunk dedup (rn=1) and per-query top-3
    both plan as WindowGroupLimit; the query batch rides a broadcast; no
    cartesian anywhere (the scored cross join must be broadcast-nested-loop
    over the 3-row query side, never a shuffled cartesian)."""
    df = Q["pipeline_rag_retrieval"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert has_window_group_limit(df), plan
    assert "CartesianProduct" not in plan.replace("BroadcastNestedLoopJoin", "")
    assert "Broadcast" in plan


def test_levenshtein_runs_only_on_candidates(spark, sf_dir):
    """The quadratic edit-distance verify must sit above the winnow
    candidate join, never a cartesian. The query's final plan is opaque
    (the DP output is localCheckpoint-materialized so filter pushdown
    cannot re-inline the O(len^2) call into each consumer), so the gate
    rebuilds the pre-checkpoint candidate topology from the same public
    pieces and pins THAT plan."""
    import pyspark.sql.functions as F_

    from vmhub_data_pipeline_spark.queries.text import text_winnow_fingerprint

    fps = text_winnow_fingerprint(spark, sf_dir)
    rare = fps.groupBy("fp").agg(F_.count(F_.lit(1)).alias("df")).filter(F_.col("df") <= 20)
    cands = (
        fps.join(rare.select("fp"), "fp").alias("a")
        .join(fps.alias("b"), (F_.col("a.fp") == F_.col("b.fp")) & (F_.col("a.doc_id") < F_.col("b.doc_id")))
    )
    plan = explain_str(cands)
    assert "CartesianProduct" not in plan.replace("BroadcastNestedLoopJoin", "")
    # and the end-to-end query still verifies with Levenshtein (behavior,
    # oracle-checked for values): output respects the ratio threshold
    rows = Q["dedup_levenshtein_pairs"].fn(spark, sf_dir).collect()
    assert rows and all(r["edit_ratio"] <= 0.4 for r in rows)


def test_skew_report_global_topk_take_ordered(spark, sf_dir):
    """The heaviest-keys cut must plan as TakeOrderedAndProject (each
    partition forwards at most 10 rows); the one-row stats side must ride
    a broadcast."""
    df = Q["pipeline_key_skew_report"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Broadcast" in plan, plan


def test_gini_rank_and_fold_share_nation_shuffle(spark, sf_dir):
    """Customer totals -> rank window -> nation fold: the rank and the
    final groupBy both partition by nation; budget caps the chain at the
    join + customer-grain agg + nation window (3 exchanges)."""
    df = Q["agg_gini_concentration"].fn(spark, sf_dir)
    assert count_exchanges(df) <= 3, explain_str(df)


def test_regression_trend_single_shuffle(spark, sf_dir):
    """OLS moments are one map-side-combined aggregate — exactly 1 exchange."""
    assert count_exchanges(Q["agg_regression_trend"].fn(spark, sf_dir)) <= 1


def test_chi2_totals_broadcast_back(spark, sf_dir):
    """The totals row must come back via broadcast, not a shuffled join, and
    row-grain data must shuffle only once (the category-count aggregate)."""
    df = Q["stats_chi2_drift"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_winsorize_thresholds_broadcast(spark, sf_dir):
    """Pass-2 must join per-group thresholds by BROADCAST: re-shuffling the
    fact against a 3-row threshold table is the classic quantile-clip
    mistake at scale."""
    assert has_broadcast_join(Q["stats_winsorize"].fn(spark, sf_dir))


def test_entropy_totals_broadcast(spark, sf_dir):
    """Per-source totals (one row per source) broadcast back onto the
    (source, word) counts."""
    assert has_broadcast_join(Q["text_entropy_by_source"].fn(spark, sf_dir))


def test_ewma_fold_collapses_to_day_grain_first(spark, sf_dir):
    """The fold input must be the day-grain aggregate (2 exchanges: day
    agg + key collect), never row-grain collect_list."""
    assert count_exchanges(Q["events_ewma_daily"].fn(spark, sf_dir)) <= 2


def test_sorted_neighborhood_no_cartesian(spark, sf_dir):
    """SNM pairing is an equi-join on rank offsets; token arrays rejoin by
    doc_id. Nothing here may plan as CartesianProduct/BroadcastNestedLoop
    over the corpus."""
    plan = explain_str(Q["dedup_sorted_neighborhood"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_q9_analog_broadcasts_nation(spark, sf_dir):
    assert has_broadcast_join(Q["join_q9_product_profit"].fn(spark, sf_dir))


def test_unpivot_adds_no_shuffle(spark, sf_dir):
    """stack() is a generator projection — the only exchanges are the day
    aggregate's (2: COUNT DISTINCT user_id expands to a two-phase agg)."""
    assert count_exchanges(Q["events_unpivot"].fn(spark, sf_dir)) <= 2


def test_mmr_greedy_stays_jvm_single_exchange(spark, sf_dir):
    """The MMR fold must stay a JVM higher-order expression: no Python
    stage, no CartesianProduct (the only cross join is the broadcast-query
    scoring pass), and the shortlist window + vector join + per-query
    collect share one exchange."""
    df = Q["knn_mmr_diverse"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    assert count_exchanges(df) <= 2


def test_bottomk_sample_plans_as_group_limit(spark, sf_dir):
    """The bottom-256-by-hash sample must plan as WindowGroupLimit (partial
    per-partition bottom-k before the shuffle) — a full per-group sort
    would defeat the sketch's point at scale."""
    assert has_window_group_limit(Q["agg_bottomk_quantile_sketch"].fn(spark, sf_dir))


def test_multitouch_joins_never_cartesian(spark, sf_dir):
    """Attribution pairs conversions with touches via an equi-join on
    user_id (range lookback as post-filter) — a cartesian or nested-loop
    here would be quadratic in the event log."""
    plan = explain_str(Q["events_multitouch_attribution"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_temperature_mix_broadcasts_thresholds(spark, sf_dir):
    """Per-language thresholds (|langs| rows) must broadcast into the
    per-doc keep filter; shuffling the corpus by lang to join 5 rows would
    be the classic small-dim mistake."""
    assert has_broadcast_join(Q["curation_temperature_mix"].fn(spark, sf_dir))


def test_kanonymity_two_exchange_rollup(spark, sf_dir):
    """rows -> QI classes -> one audit row: the second aggregate's input is
    |distinct QI combos| rows, so the whole audit is two exchanges."""
    assert count_exchanges(Q["stats_kanonymity_audit"].fn(spark, sf_dir)) <= 2


def test_association_rules_joins_on_basket_key(spark, sf_dir):
    """Pair generation must self-join on the (user, day) basket key —
    a cartesian would be baskets^2; the only cross join allowed is the
    broadcast of the 1-row basket-count aggregate."""
    df = Q["events_association_rules"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert has_broadcast_join(df)


def test_snapshot_diff_single_full_outer_join(spark, sf_dir):
    """Reconciliation is ONE full-outer equi-join plus a 4-group rollup —
    no nested loop, no second pass over either snapshot."""
    plan = explain_str(Q["pipeline_snapshot_diff"].fn(spark, sf_dir))
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_histogram_broadcasts_bounds(spark, sf_dir):
    """The 1-row min/max/count aggregate must broadcast into the binning
    projection; shuffling the fact side to meet one row is the classic
    scalar-subquery mistake."""
    df = Q["stats_histogram_profile"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 3


def test_fk_integrity_parents_collapse_before_join(spark, sf_dir):
    """Every FK edge joins the child against the parent's DISTINCT key
    projection — small parents must broadcast, and no edge may plan a
    cartesian or nested loop."""
    df = Q["pipeline_fk_integrity"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert has_broadcast_join(df)


def test_budget_apportion_broadcasts_scalars(spark, sf_dir):
    """Grand total and leftover are 1-row frames that must broadcast into
    the source-grain quota math."""
    assert has_broadcast_join(Q["curation_budget_apportion"].fn(spark, sf_dir))


@pytest.mark.slow
def test_survivorship_works_at_cluster_grain(spark, sf_dir):
    """Survivorship must never plan a cartesian; mode windows rank
    (cluster, value) count rows, not raw members."""
    plan = explain_str(Q["dedup_survivorship"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_ab_experiment_broadcasts_control_row(spark, sf_dir):
    """The control-variant row is a 1-row frame that must broadcast into
    the per-variant lift projection."""
    df = Q["events_ab_experiment"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in explain_str(df)


def test_langid_confusion_reuses_broadcast_scoring(spark, sf_dir):
    """The confusion matrix rides the same broadcast-profile scoring
    subplan as text_langid; the label join is doc-grain, the matrix
    aggregates are |langs|-grain."""
    plan = explain_str(Q["text_langid_confusion"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bm25_plans_posting_list_and_group_limit(spark, sf_dir):
    """BM25: term stream filtered to query terms (matched volume, not
    corpus volume), df/stats broadcast, rank<=10 as WindowGroupLimit."""
    df = Q["text_bm25_topk"].fn(spark, sf_dir)
    assert has_window_group_limit(df)
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in explain_str(df)


def test_cms_fold_is_constant_width_shuffle(spark, sf_dir):
    """The Count-Min fold groups on (row, bucket) — the shuffle is the
    constant-size counter grid, and the probe side joins it broadcast."""
    df = Q["agg_cms_heavy_hitters"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in explain_str(df)


def test_overlap_matrix_joins_on_gram_digest(spark, sf_dir):
    """The source-overlap pair join must ride the gram-hash inverted index
    (8-byte digests), never a cartesian of sources or docs."""
    plan = explain_str(Q["dedup_overlap_matrix"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_contrastive_pairs_single_knn_pass(spark, sf_dir):
    """Positive and negative picks must share ONE broadcast-anchor kNN
    shortlist (WindowGroupLimit), not two scoring passes."""
    import re

    df = Q["curation_contrastive_pairs"].fn(spark, sf_dir)
    assert has_window_group_limit(df)
    plan = explain_str(df)
    # exactly one scoring pass: the broadcast-anchor cross join node
    # appears once, not once per pick (formatted explain names each node
    # twice — tree + details — so count the numbered detail entries)
    nodes = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    assert nodes.count("BroadcastNestedLoopJoin") == 1, nodes


def test_feature_store_pit_three_user_keyed_passes(spark, sf_dir):
    """Two as-of features + the prior-count rank = three user-keyed window
    passes and nothing else: no cartesian, no per-feature fact re-join
    blowup, exchange budget 3."""
    df = Q["join_feature_store_pit"].fn(spark, sf_dir)
    assert "CartesianProduct" not in explain_str(df)
    assert count_exchanges(df) <= 3


def test_audio_decode_is_scan_stage(spark, sf_dir):
    """WAV build + header parse is ONE projection: no exchange, no Python
    stage — the audio twin of the quality-filter zero-shuffle stance."""
    df = Q["multimodal_audio_stats"].fn(spark, sf_dir)
    assert count_exchanges(df) == 0
    assert "Python" not in explain_str(df)


def test_video_frame_census_is_scan_stage(spark, sf_dir):
    """MJPEG build + marker-count parse is one projection: no exchange,
    no Python stage."""
    df = Q["multimodal_video_frames"].fn(spark, sf_dir)
    assert count_exchanges(df) == 0
    assert "Python" not in explain_str(df)


def test_markov_eval_broadcasts_model(spark, sf_dir):
    """The |states|^2 argmax model must broadcast onto the transition
    stream; the lead window is the only user-keyed pass."""
    assert has_broadcast_join(Q["events_markov_eval"].fn(spark, sf_dir))


def test_zipf_top1000_is_take_ordered(spark, sf_dir):
    """The vocabulary cut must plan as TakeOrderedAndProject — a full
    vocab sort before a LIMIT would be the classic global-sort trap."""
    plan = explain_str(Q["text_zipf_slope"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_anomaly_zscore_day_grain_window(spark, sf_dir):
    """Day-grain collapse must happen BEFORE the trailing window: the
    window input is |days| rows, so the plan has exactly the rollup
    exchange plus the (bounded) window's single-partition sort."""
    df = Q["events_anomaly_zscore"].fn(spark, sf_dir)
    assert count_exchanges(df) <= 2, explain_str(df)


def test_dataset_card_two_linear_passes(spark, sf_dir):
    """The card is one corpus scan + one digest-grain dup aggregate, the
    1-row legs joined by broadcast — no extra passes."""
    df = Q["curation_dataset_card"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in explain_str(df).replace("BroadcastNestedLoopJoin", "")


def test_perplexity_profile_cap_drops_broadcast(spark, sf_dir):
    """The self-trained LM profile's broadcast hint must be CODE-guarded:
    above ``profile_max_rows`` the hint is dropped and the (lang,word)
    equi-join plans as a shuffle join. Verified differentially with
    autoBroadcastJoinThreshold disabled so only the explicit hint can
    produce a BroadcastHashJoin."""
    from vmhub_data_pipeline_spark.queries.text import text_perplexity_filter

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        over_cap = explain_str(text_perplexity_filter(spark, sf_dir, profile_max_rows=1))
        assert "SortMergeJoin" in over_cap or "ShuffledHashJoin" in over_cap, (
            "profile over the cap must take the shuffle-join path"
        )
        under_cap = explain_str(
            text_perplexity_filter(spark, sf_dir, profile_max_rows=10_000_000)
        )
        assert "BroadcastHashJoin" in under_cap, (
            "profile under the cap must keep the broadcast hint"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_jaccard_capped_df_filter_is_broadcast(spark, sf_dir):
    """The production capped config's rare-token filter must be a BROADCAST
    semi-shape join (token-df table is |vocab| rows, never fact-sized), and
    the candidate self-join must be an equi-join on token — no cartesian
    anywhere. This is the configuration whose scaling exponent the bench
    probe holds at ~0; the plan shape is what makes that hold at 100x."""
    plan = explain_str(Q["dedup_jaccard_pairs_capped"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_audio_energy_is_scan_stage(spark, sf_dir):
    """PCM windowed-energy analysis (r5) is one projection per row: the hex
    extraction + nested higher-order folds must stay JVM-side in the scan
    stage — no exchange, no Python worker."""
    df = Q["multimodal_audio_energy"].fn(spark, sf_dir)
    assert count_exchanges(df) == 0
    assert "Python" not in explain_str(df)


def test_exact_substring_no_cartesian_and_digest_shuffles(spark, sf_dir):
    """The passage audit detects duplication by digest-grain COUNT, never a
    self-join: no cartesian/BNLJ anywhere, and the shuffles carry md5
    digests, not passage text (window text never appears as an exchange
    attribute)."""
    df = Q["dedup_exact_substring"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lorenz_broadcasts_grand_total(spark, sf_dir):
    """The 1-row grand total must broadcast; the only data-sized shuffle is
    the user-grain aggregate."""
    assert has_broadcast_join(Q["events_lorenz_curve"].fn(spark, sf_dir))


def test_drift_report_no_join(spark, sf_dir):
    """The drift monitor is aggregation-only (posexplode -> three
    aggregates): any join/cartesian in the plan means the model-grain
    design regressed."""
    plan = explain_str(Q["vector_drift_report"].fn(spark, sf_dir))
    assert "Join" not in plan and "CartesianProduct" not in plan


@pytest.mark.slow
def test_cluster_split_assignment_is_projection(spark, sf_dir):
    """The split CASE itself must not add a shuffle on top of the CC +
    cluster-size machinery: the plan's exchange count equals the composed
    pair-stage/CC/size budget with zero extra for the md5 assignment."""
    from vmhub_data_pipeline_spark.operators.dedup import jaccard_similarity_pairs
    from vmhub_data_pipeline_spark.operators.graph import connected_components

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = jaccard_similarity_pairs(
        docs, "doc_id", "text", threshold=0.9, group_col="lang", max_token_doc_freq=None
    )
    cc = connected_components(pairs, "doc_a", "doc_b")
    clustered = docs.select("doc_id").join(
        cc.select(F.col("v").alias("doc_id"), "component"), "doc_id", "left"
    ).select("doc_id", F.coalesce("component", F.col("doc_id")).alias("cluster_id"))
    sizes = clustered.groupBy("cluster_id").count()
    base = count_exchanges(clustered.join(sizes, "cluster_id"))
    full = count_exchanges(Q["curation_cluster_split"].fn(spark, sf_dir))
    assert full == base


def test_bloom_bits_broadcast_to_probe(spark, sf_dir):
    """The Bloom bit table is m-bounded and must BROADCAST to the probe
    side — if it ever plans as a shuffle join the runtime-filter economics
    are gone."""
    assert has_broadcast_join(Q["pipeline_bloom_prefilter"].fn(spark, sf_dir))


def test_kmv_intersection_sketch_state_is_bounded(spark, sf_dir):
    """The register build must plan as WindowGroupLimit (k hashes per
    group forwarded from each map task) — the property that keeps sketch
    state constant at any corpus size."""
    assert has_window_group_limit(Q["agg_kmv_intersection"].fn(spark, sf_dir))


# Queries allowed to keep a Window fed by Exchange SinglePartition, each at
# a BOUNDED post-aggregate grain (never data grain). A new query that adds
# one must be consciously added here with its grain argument — that is the
# gate. (VERDICT r5 task 1: events_rfm_segmentation / events_lorenz_curve
# ranked users through a single-partition NTILE; both now rank via
# operators.sampling.distributed_ntile instead.)
SINGLE_PARTITION_WINDOW_ALLOWLIST = {
    "events_lorenz_curve": "cumulative share over exactly 10 decile rows",
    "window_period_over_period": "lag over post-rollup day grain (|days|)",
    "window_moving_avg": "frame over post-rollup day grain (|days|)",
    "window_cumulative_distinct": "running sum over post-agg day grain",
    "join_q15_top_supplier": "global max over supplier-grain revenue agg",
    "curation_budget_apportion": "largest-remainder rank over |sources| rows",
    "events_anomaly_zscore": "z-score frame over post-rollup day grain",
}


@pytest.mark.slow
def test_no_data_grain_single_partition_windows(spark, sf_dir):
    """Catalog-wide: no query may plan a Window fed by Exchange
    SinglePartition unless pinned (with a bounded-grain justification) in
    the allowlist above. This is the gate that keeps the 100 TB posture:
    a global OVER (ORDER BY ...) at data grain is a one-task sort of the
    whole key space."""
    from vmhub_data_pipeline_spark.plans import single_partition_window_count
    from vmhub_data_pipeline_spark.queries.streaming_queries import _landed_events

    _landed_events(spark, sf_dir)
    offenders = {}
    for name, q in Q.items():
        n = single_partition_window_count(q.fn(spark, sf_dir))
        if n and name not in SINGLE_PARTITION_WINDOW_ALLOWLIST:
            offenders[name] = n
    assert not offenders, (
        f"data-grain single-partition windows (add a distributed rank or an "
        f"explicit allowlist entry): {offenders}"
    )
    # the two r6 rewrites stay fixed at their intended shapes
    assert single_partition_window_count(Q["events_rfm_segmentation"].fn(spark, sf_dir)) == 0
    assert single_partition_window_count(Q["events_lorenz_curve"].fn(spark, sf_dir)) == 1


def test_q2_broadcasts_dims_and_takeordered(spark, sf_dir):
    """Q2 analog: the region-qualified supplier dim must broadcast into the
    offer stream, the top-100 must plan as TakeOrderedAndProject, and the
    correlated min must be a p_partkey-partitioned window (never global)."""
    from vmhub_data_pipeline_spark.plans import single_partition_window_count

    df = Q["join_q2_min_cost_supplier"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert single_partition_window_count(df) == 0


def test_q20_broadcasts_supplier_dim_no_cartesian(spark, sf_dir):
    """Q20 analog: the region-qualified supplier dim broadcasts, the
    bridge x shipped join is an equi-join (no cartesian product), and no
    global window appears anywhere."""
    from vmhub_data_pipeline_spark.plans import single_partition_window_count

    df = Q["join_q20_potential_promotion"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert single_partition_window_count(df) == 0


def test_ivfpq_probe_joins_on_cells_not_scan(spark, sf_dir):
    """The composed IVF-PQ probe (r7, retires the flat-PQ full scan): the
    code-table access must be a bucket EQUI-join (BroadcastHashJoin on the
    probed cell ids — at scale this is the inverted-list prune), never a
    nested-loop over every code row; shortlist/rerank windows stay
    query-grain (no single-partition window)."""
    from vmhub_data_pipeline_spark.plans import single_partition_window_count

    df = Q["ann_ivfpq_topk"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the scoring side must NOT fall back to a nested-loop join against
    # the code table (that would be the flat scan this operator retires)
    assert plan.count("BroadcastNestedLoopJoin") == 0
    assert single_partition_window_count(df) == 0


def test_opq_probe_stays_jvm_and_query_grain(spark, sf_dir):
    """ann_opq_topk (r9): the OPQ transform and probe are pure JVM
    expressions — no Python UDF anywhere (the rotation is a staged dot
    + dim FMAs, the permutation a literal re-index), and
    shortlist/rerank windows stay query-grain like the flat-PQ probe."""
    from vmhub_data_pipeline_spark.plans import single_partition_window_count

    df = Q["ann_opq_topk"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert single_partition_window_count(df) == 0


def test_ivfpq_residual_probe_joins_on_cells_not_scan(spark, sf_dir):
    """Residual IVF-PQ probe (r7): same scale contract as the
    vector-coded variant — code-table access is a bucket EQUI-join
    (inverted-list prune), never a nested loop over every code row; all
    windows stay query-grain."""
    from vmhub_data_pipeline_spark.plans import single_partition_window_count

    df = Q["ann_ivfpq_residual_topk"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 0
    assert single_partition_window_count(df) == 0


def test_bpe_encode_is_pure_scan(spark, sf_dir):
    """curation_bpe_encode (r7): applying the merge table is a tokenizer
    pass — the plan must be a single scan-stage projection (merges are
    inlined literals), with NO shuffle exchange and no Python UDF."""
    df = Q["curation_bpe_encode"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivfpq_add_batch_is_pure_scan_no_lloyd(spark, sf_dir):
    """ann_ivfpq_add_batch (r8): the FAISS add contract — assignment +
    encode against the FROZEN model must be a single scan-stage
    projection of the batch. The frozen centroids/codebooks arrive as
    inlined literals, so the plan has NO shuffle exchange, no join, no
    aggregate, and no Python UDF; in particular no Lloyd iteration can
    hide anywhere (an iteration would need an aggregate + exchange)."""
    df = Q["ann_ivfpq_add_batch"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "Exchange" not in plan, plan
    assert "HashAggregate" not in plan and "SortAggregate" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivfpq_filtered_probe_filters_before_adc(spark, sf_dir):
    """ann_ivfpq_filtered_topk (r8b): the attribute predicate must run as
    a scan-side Filter on the RESIDENT index (label is stored in the
    inverted-list rows) under the probe-cell join, before any ADC work —
    so filtered search costs ~selectivity x the unfiltered probe with
    zero re-encode (the first cut of this query rebuilt codes in-plan
    and cost 17 s at sf0.1 vs the resident probe's 1.8 s). The label
    predicate must appear as a Filter, and the probe keeps the
    composed-index contract (bucket equi-join, no nested loop,
    query-grain windows)."""
    from vmhub_data_pipeline_spark.plans import single_partition_window_count

    df = Q["ann_ivfpq_filtered_topk"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "% 3) = 0" in plan, plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 0
    assert single_partition_window_count(df) == 0


def test_ivf_delete_is_broadcast_anti_join(spark, sf_dir):
    """ann_ivf_delete (r8b): the tombstone set is orders of magnitude
    smaller than the corpus, so the surviving lists must come from a
    BROADCAST left-anti hash join against the checkpointed index — never
    a sort-merge join (that would shuffle the whole index on id at 100
    TB) and never a nested loop; rollups and their join run at cell
    grain."""
    df = Q["ann_ivf_delete"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 0


def test_persist_probe_joins_on_cells_not_scan(spark, sf_dir):
    """ann_ivfpq_persist_probe (r8b): probing from the reloaded parquet
    artifact must keep the composed-index contract — the code-table
    access is a bucket EQUI-join over the probed cells (at scale: read
    O(nprobe/n_cells) of the lists parquet), never a nested loop or a
    full-scan fallback; windows stay query-grain."""
    from vmhub_data_pipeline_spark.plans import single_partition_window_count

    df = Q["ann_ivfpq_persist_probe"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 0
    assert single_partition_window_count(df) == 0


def test_passage_rebuild_shuffle_budget(spark, sf_dir):
    """text_passage_dedup_rebuild (r8): the keep decision rides
    digest/position shuffles; document TEXT crosses exactly one doc-grain
    exchange (the rebuild floor). Budget: the window's digest shuffle,
    the per-doc excised-start rollup, and the doc-grain rebuild join —
    AQE may add reuse nodes but no data-grain single-partition window
    may appear."""
    from vmhub_data_pipeline_spark.plans import single_partition_window_count

    df = Q["text_passage_dedup_rebuild"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert single_partition_window_count(df) == 0
    # digest-grain window shuffle + per-doc excised-start rollup + the
    # broadcast that attaches starts to docs: the document TEXT side is
    # a pure scan (it never shuffles — better than the one-exchange
    # rebuild floor, because only integer start lists move)
    assert count_exchanges(df) <= 3, plan


def test_incremental_lsh_asymmetric_never_cartesian(spark, sf_dir):
    """dedup_incremental_lsh (r8): the new-batch probe joins the frozen
    band index on (band_id, band_hash) — an equi-join, never a cartesian
    or nested loop — and verification/best-match windows run at candidate
    grain (no data-grain single-partition window)."""
    from vmhub_data_pipeline_spark.plans import single_partition_window_count

    df = Q["dedup_incremental_lsh"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert single_partition_window_count(df) == 0


def test_lsh_append_audit_is_asymmetric(spark, sf_dir):
    """dedup_lsh_index_append (r9; rewritten r10, VERDICT r9 task 6):
    EVERY audit branch consumes the checkpointed grown index
    (ExistingRDD scans only) — the batch's signatures were computed
    exactly once, inside lsh_index_appended's build (itself a
    pushed-filter batch scan), so the audit plan contains ZERO document
    scans and ZERO signature expressions (the r9 shape re-derived
    minhash_banded once per audit branch, three times total)."""
    df = Q["dedup_lsh_index_append"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "ExistingRDD" in plan, plan
    simple = explain_str(df, "simple")
    doc_scans = [
        ln
        for ln in simple.splitlines()
        if "parquet" in ln and "documents" in ln
    ]
    assert not doc_scans, doc_scans
    # no signature recompute anywhere in the audit: the minhash chain's
    # shingling/hash expressions never appear
    for sig_expr in ("md5(", "posexplode", "slice("):
        assert sig_expr not in plan, sig_expr
    assert "CartesianProduct" not in plan


def test_lsh_persist_probe_reads_reloaded_parquet_with_pushdown(spark, sf_dir):
    """dedup_lsh_persist_probe (r10): the probe must run ENTIRELY from
    the reloaded artifact — every index scan is a parquet scan of the
    persisted dirs (zero ExistingRDD: touching the resident checkpoint
    would void the round-trip claim), both probe legs carry the batch
    cutoff pushed into the reader, and no signature expression appears
    anywhere (signatures live in the artifact)."""
    from vmhub_data_pipeline_spark.plans import single_partition_window_count

    df = Q["dedup_lsh_persist_probe"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "ExistingRDD" not in plan, plan
    assert has_pushed_filters(df, "GreaterThanOrEqual(id"), plan
    assert has_pushed_filters(df, "LessThan(id"), plan
    for sig_expr in ("md5(", "posexplode"):
        assert sig_expr not in plan, sig_expr
    assert "CartesianProduct" not in plan
    assert single_partition_window_count(df) == 0


def test_lsh_delete_is_broadcast_anti_join(spark, sf_dir):
    """dedup_lsh_index_delete (r10): the tombstone retraction must ride
    BROADCAST left-anti hash joins over the checkpointed index rows —
    never a sort-merge shuffle of the index, never a nested loop — and
    no signature work appears (deleting rows never re-signs anything),
    the ann_ivf_delete posture."""
    df = Q["dedup_lsh_index_delete"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin LeftAnti" in plan, plan
    assert "SortMergeJoin LeftAnti" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for sig_expr in ("md5(", "posexplode"):
        assert sig_expr not in plan, sig_expr


def test_streamed_lsh_growth_probe_is_asymmetric_reloaded(spark, sf_dir):
    """streaming_lsh_index_growth (r10): the post-growth probe reads the
    RELOADED grown parquets (no ExistingRDD — the resident index is not
    consulted), joins at band grain (equi-join, never cartesian), and
    its windows stay candidate/query grain."""
    from vmhub_data_pipeline_spark.plans import single_partition_window_count

    df = Q["streaming_lsh_index_growth"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "ExistingRDD" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert single_partition_window_count(df) == 0


def test_ivfopq_probe_joins_on_cells_not_scan(spark, sf_dir):
    """ann_ivfopq_topk (r10): the composed rotated-space probe must keep
    the exact celled contract its IVF-PQ parent pins — code-table access
    is a bucket equi-join over the probed cells, windows stay
    query-grain, and no Python evaluator appears (the transform is pure
    JVM expressions)."""
    from vmhub_data_pipeline_spark.plans import single_partition_window_count

    df = Q["ann_ivfopq_topk"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert single_partition_window_count(df) == 0


def test_streamed_growth_probe_joins_on_cells_not_scan(spark, sf_dir):
    """streaming_index_growth (r9): the post-growth probe reads the
    RELOADED lists parquet through the composed-index contract — bucket
    equi-join over the probed cells, never a nested loop or full-scan
    fallback; windows stay query-grain."""
    from vmhub_data_pipeline_spark.plans import single_partition_window_count

    df = Q["streaming_index_growth"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 0
    assert single_partition_window_count(df) == 0


def test_cell_stats_single_index_scan_via_reused_exchange(spark, sf_dir):
    """ann_ivf_cell_stats (r8): the audit must read the resident inverted
    lists ONCE — the corpus total hangs off the per-cell counts' shuffle
    (AQE ReusedExchange), not a second scan of the index. At 100 TB the
    index scan IS the audit's cost; pinning the reuse keeps it halved."""
    df = Q["ann_ivf_cell_stats"].fn(spark, sf_dir)
    df.collect()  # AQE reuse materializes at runtime
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, final


def test_ivf_rebalance_emission_is_pushed_scan(spark, sf_dir):
    """ann_ivf_rebalance (r8): the reassignment emission must be a pure
    scan over the hot cell — bucket filter pushed against the resident
    index, sub-centroids inlined as literals, no shuffle exchange (the
    only distributed aggregation lives inside the k=2 sub-fit's jobs,
    not this plan)."""
    df = Q["ann_ivf_rebalance"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lsh_bucket_stats_reads_resident_index_only(spark, sf_dir):
    """dedup_lsh_bucket_stats (r10): the audit reads the checkpointed
    resident index (ExistingRDD — zero signature recompute) through one
    bucket-grain groupBy and one band-grain rollup; no document scan, no
    signature expression, no join at all."""
    df = Q["dedup_lsh_bucket_stats"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "ExistingRDD" in plan, plan
    simple = explain_str(df, "simple")
    assert not [
        ln for ln in simple.splitlines() if "parquet" in ln and "documents" in ln
    ]
    for sig_expr in ("md5(", "posexplode", "Join"):
        assert sig_expr not in plan, sig_expr


def test_lsh_batch_signing_scan_is_pushed(spark, sf_dir):
    """lsh_batch_signed (r10): the append path's ONE signing surface — the
    batch-cutoff literal must reach the parquet reader of BOTH legs
    (banded signatures and hashed shingle sets), so appending stays
    O(batch x signature), never O(corpus). Restores the pushdown gate the
    audit rewrite retired along with the audit's own document scans."""
    from vmhub_data_pipeline_spark.queries.dedup import (
        _lsh_batch_cut,
        lsh_batch_signed,
    )

    cut = _lsh_batch_cut(spark, sf_dir)
    banded, toks = lsh_batch_signed(spark, sf_dir, cut)
    assert has_pushed_filters(banded, "GreaterThanOrEqual(doc_id"), explain_str(banded)
    assert has_pushed_filters(toks, "GreaterThanOrEqual(doc_id"), explain_str(toks)
