"""Behavioral pins for the round-5 query additions — properties the oracle
parity check can't express: leak-freedom of the cluster-aware split, hand
computed expectations on crafted corpora, and shape invariants.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from vmhub_data_pipeline_spark import queries as catalog

catalog._load_all()
Q = {n: q.fn for n, q in catalog.REGISTRY.items()}


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
