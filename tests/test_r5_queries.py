"""Behavioral pins for the round-5 query additions — properties the oracle
parity check can't express: leak-freedom of the cluster-aware split, hand
computed expectations on crafted corpora, and shape invariants.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from vmhub_data_pipeline_spark import queries as catalog

catalog._load_all()
Q = {n: q.fn for n, q in catalog.REGISTRY.items()}


@pytest.mark.slow
def test_cluster_split_is_leak_free(spark, sf_dir):
    """No near-dup pair may straddle a split boundary (the property the
    query exists for) — while the naive per-doc hash split DOES leak on
    this fixture (the failure mode being fixed, deterministic under md5)."""
    from vmhub_data_pipeline_spark.operators.dedup import jaccard_similarity_pairs
    from vmhub_data_pipeline_spark.operators.sampling import assign_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = jaccard_similarity_pairs(
        docs, "doc_id", "text", threshold=0.9, group_col="lang", max_token_doc_freq=None
    )
    n_pairs = pairs.count()
    assert n_pairs > 0, "fixture must contain near-dup pairs for this test to bite"

    split = Q["curation_cluster_split"](spark, sf_dir).select("doc_id", "split")
    leaked = (
        pairs.join(split.withColumnsRenamed({"doc_id": "doc_a", "split": "sa"}), "doc_a")
        .join(split.withColumnsRenamed({"doc_id": "doc_b", "split": "sb"}), "doc_b")
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    assert leaked == 0

    naive = assign_split(docs.select("doc_id"), "doc_id").select("doc_id", "split")
    naive_leaked = (
        pairs.join(naive.withColumnsRenamed({"doc_id": "doc_a", "split": "sa"}), "doc_a")
        .join(naive.withColumnsRenamed({"doc_id": "doc_b", "split": "sb"}), "doc_b")
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    assert naive_leaked > 0, "per-doc split should leak on this near-dup-rich fixture"


@pytest.mark.slow
def test_cluster_split_covers_every_doc(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = Q["curation_cluster_split"](spark, sf_dir)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_exact_substring_hand_corpus(spark, tmp_path):
    """Crafted corpus: doc 2 is a verbatim 10-token passage of doc 1; doc 3
    is unique; doc 4 is too short to audit."""
    w = [f"w{i}" for i in range(1, 13)]
    rows = [
        (1, " ".join(w)),              # 12 tokens -> 3 windows, 1 duplicated
        (2, " ".join(w[:10])),         # the shared passage itself -> 1/1 dup
        (3, " ".join(f"u{i}" for i in range(10))),  # unique -> 0 dup
        (4, "a b c d e"),              # < 10 tokens -> excluded
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in Q["dedup_exact_substring"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["n_windows"] == 3 and out[1]["n_dup_windows"] == 1
    assert out[1]["keep"] is True
    assert out[2]["n_windows"] == 1 and out[2]["n_dup_windows"] == 1
    assert out[2]["dup_frac"] == 1.0 and out[2]["keep"] is False
    assert out[3]["n_dup_windows"] == 0 and out[3]["keep"] is True


def test_audio_energy_hand_computed(spark, tmp_path):
    """One 32-byte clip -> two 16-sample windows with energies computed by
    hand from the construction rule (PCM stand-in = text bytes)."""
    text = "z" * 16 + " " * 16  # window 1: near-midpoint bytes; window 2: spaces
    spark.createDataFrame([(7, text)], "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    [r] = Q["multimodal_audio_energy"](spark, str(tmp_path)).collect()
    e1 = sum((ord(c) - 128) ** 2 for c in text[:16])
    e2 = sum((ord(c) - 128) ** 2 for c in text[16:])
    assert r["n_windows"] == 2
    assert r["total_energy"] == e1 + e2
    assert r["max_window_energy"] == max(e1, e2)
    # 'z' (122) is near the u8 midpoint (silent); space (32) is far (loud)
    assert e1 == 16 * 36 and e2 == 16 * 96 * 96
    assert e1 < 8000 <= e2
    assert r["n_silent"] == 1 and r["silence_bp"] == 5000


def test_lorenz_curve_shape(spark, sf_dir):
    rows = Q["events_lorenz_curve"](spark, sf_dir).orderBy("decile").collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # NTILE ascending by per-user revenue: decile MEANS are nondecreasing
    # (sums need not be — earlier tiles absorb the +1-sized remainder rows)
    means = [r["revenue_cents"] / r["n_users"] for r in rows]
    assert means == sorted(means)
    # cumulative curve is the running sum of shares and ends <= 10000
    cum = 0
    for r in rows:
        cum += r["share_bp"]
        assert r["cum_share_bp"] == cum
    assert cum <= 10000


def test_bigram_lm_ranks_scrambled_text_as_disfluent(spark, tmp_path):
    """Same unigram multiset, broken word order -> higher bigram
    cross-entropy. A unigram LM cannot make this distinction."""
    fluent = "the cat sat on the mat"
    scrambled = "mat the on sat cat the"
    rows = [(i, fluent) for i in range(10)] + [(99, scrambled)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in Q["text_bigram_lm_score"](spark, str(tmp_path)).collect()}
    assert out[0]["mean_xent_q"] < out[99]["mean_xent_q"]


def test_drift_report_identical_batches_have_cosine_one(spark, tmp_path):
    v = [0.25, -0.5, 0.125, 1.0]
    rows = [(i, v, 3) for i in range(4)]  # both parities see the same vector
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    [r] = Q["vector_drift_report"](spark, str(tmp_path)).collect()
    assert r["label"] == 3 and r["n_a"] == 2 and r["n_b"] == 2
    assert r["centroid_cosine"] == 1.0


def test_rfm_scores_are_quintiles(spark, sf_dir):
    rows = Q["events_rfm_segmentation"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_score"] <= 5 and 1 <= r["f_score"] <= 5 and 1 <= r["m_score"] <= 5
        assert r["segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"
    # quintile sizes differ by at most 1
    from collections import Counter

    for dim in ("r_score", "f_score", "m_score"):
        sizes = Counter(r[dim] for r in rows).values()
        assert max(sizes) - min(sizes) <= 1


def test_benford_covers_digits_and_shares_sum(spark, sf_dir):
    rows = {r["digit"]: r for r in Q["stats_benford_audit"](spark, sf_dir).collect()}
    assert set(rows) <= set(range(1, 10))
    assert sum(r["n_rows"] for r in rows.values()) > 0
    # Benford expectation is fixed: digit 1 ~ 3010 bp, digit 9 ~ 458 bp
    assert rows[1]["benford_bp"] == 3010
    for r in rows.values():
        assert r["delta_bp"] == r["share_bp"] - r["benford_bp"]


def test_ngram_novelty_first_doc_is_fully_novel(spark, sf_dir):
    out = Q["text_ngram_novelty"](spark, sf_dir)
    first = out.orderBy("doc_id").first()
    # the earliest document can only contain first-occurrence n-grams
    assert first["novelty_bp"] == 10000 and first["n_novel"] == first["n_distinct_ngrams"]


@pytest.mark.slow
def test_shard_manifest_is_balanced(spark, sf_dir):
    rows = Q["curation_shard_manifest"](spark, sf_dir).collect()
    assert len(rows) == 16 and {r["shard"] for r in rows} == set(range(16))
    totals = [r["total_tokens"] for r in rows]
    # round-robin over the size-desc rank keeps shards within one max-doc
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import pyspark.sql.functions as F2

    max_doc = docs.select(F2.max(F2.size(F2.split("text", " ")))).first()[0]
    assert max(totals) - min(totals) <= max_doc
    # share metric: ideal is 10000 per shard (16 shards x sum = 160000)
    assert all(abs(r["share_permyriad16"] - 10000) < 1000 for r in rows)


@pytest.mark.slow
def test_dbscan_grid_labels_partition_points(spark, sf_dir):
    rows = Q["dedup_dbscan_grid"](spark, sf_dir).collect()
    emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == emb_n
    core = [r for r in rows if r["is_core"]]
    noise = [r for r in rows if not r["is_core"]]
    # fixture-tuned scale must produce BOTH dense structure and noise
    assert core and noise
    for r in core:
        assert r["cluster_id"] is not None
    for r in noise:
        assert r["cluster_id"] is None
    # cluster ids are canonical min cell keys: every cluster id must be the
    # key of one of its own member cells
    from vmhub_data_pipeline_spark.queries.dedup import (
        _DBSCAN_KEY_OFF,
        _DBSCAN_KEY_SHIFT,
    )

    keys = {
        (r["cx"] + _DBSCAN_KEY_OFF) * _DBSCAN_KEY_SHIFT + (r["cy"] + _DBSCAN_KEY_OFF)
        for r in core
    }
    assert {r["cluster_id"] for r in core} <= keys


def test_bloom_prefilter_never_false_negative(spark, sf_dir):
    rows = Q["pipeline_bloom_prefilter"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every true member passes (Bloom invariant), so passes partition
        # exactly into members + false positives
        assert r["n_bloom_pass"] == r["n_members"] + r["n_false_pos"]
        assert 0 <= r["fpr_bp"] <= 10000
        assert r["n_probed"] >= r["n_bloom_pass"]


def test_kmv_intersection_estimates_track_exact(spark, sf_dir):
    rows = Q["agg_kmv_intersection"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_common"] <= 64
        assert r["est_intersection"] >= 0.0
    # aggregate accuracy: summed estimates within 50% of summed exacts
    # (k=64 registers -> ~12.5% per-pair std error; the sum tightens it)
    tot_exact = sum(r["n_exact"] for r in rows)
    tot_est = sum(r["est_intersection"] for r in rows)
    assert tot_exact > 0
    assert abs(tot_est - tot_exact) / tot_exact < 0.5
