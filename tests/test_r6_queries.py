"""Behavioral pins for the round-6 query additions — properties the oracle
parity check can't express: PSI decile balance, theta-sketch estimate
accuracy and algebraic identities, DSIR target separation, and the Q2/Q11
correlated-threshold semantics.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from vmhub_data_pipeline_spark import queries as catalog

catalog._load_all()
Q = {n: q.fn for n, q in catalog.REGISTRY.items()}


def test_psi_bins_balanced_and_shares_sum(spark, sf_dir):
    """Baseline bin counts must equal the exact value-binning ground truth
    recomputed in pure Python from the cents multiset (ADVICE r6: a fixed
    ±1 bound breaks when decile-boundary TIES pile rows into one bin even
    though Spark/oracle parity holds — so mirror the tie semantics
    instead), shares must sum to ~10000 bp, and a degenerate drift (bins
    empty on one side) must not produce NULL/inf terms."""
    rows = Q["stats_psi_drift"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert sorted(r["bin"] for r in rows) == list(range(1, 11))

    # ground truth: NTILE(10) over (cents, o_orderkey), boundaries = max
    # cents of tiles 1..9, bin = 1 + |{b : cents > b}| — value-binning,
    # so boundary ties all land left of the boundary by design
    base = sorted(
        (int(round(r["o_totalprice"] * 100.0)), r["o_orderkey"])
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where("o_orderdate < timestamp'1998-01-01'")
        .select("o_totalprice", "o_orderkey")
        .collect()
    )
    n = len(base)
    sizes = [n // 10 + (1 if i < n % 10 else 0) for i in range(10)]
    bounds, pos = [], 0
    for s in sizes[:9]:
        pos += s
        bounds.append(base[pos - 1][0])
    expect = [0] * 10
    for cents, _ in base:
        expect[sum(1 for b in bounds if cents > b)] += 1
    got = {r["bin"]: r["n_base"] for r in rows}
    assert [got[i + 1] for i in range(10)] == expect
    for r in rows:
        assert r["psi_term_micro"] is not None
    assert abs(sum(r["base_bp"] for r in rows) - 10000) <= 10
    assert abs(sum(r["cur_bp"] for r in rows) - 10000) <= 10


@pytest.mark.slow
def test_theta_difference_identities_and_accuracy(spark, sf_dir):
    """Exact columns obey set algebra (|A u B| = |A| + |B| - |A n B| >=
    max side; A-not-B <= |A|); sketch estimates land within the k=64 KMV
    error envelope (generous 50% bound) of the exact values."""
    diff = {
        (r["grp_a"], r["grp_b"]): r
        for r in Q["agg_theta_difference"](spark, sf_dir).collect()
    }
    inter = {
        (r["grp_a"], r["grp_b"]): r
        for r in Q["agg_kmv_intersection"](spark, sf_dir).collect()
    }
    assert set(diff) == set(inter)
    for key, r in diff.items():
        n_int = inter[key]["n_common"]
        assert r["n_exact_union"] >= r["n_exact_anotb"]
        assert r["n_union_reg"] >= r["n_anotb_reg"]
        # union registers = a-below + b-below - common == anotb + b-below
        assert r["n_union_reg"] - r["n_anotb_reg"] >= n_int >= 0
        if r["n_exact_union"] > 0:
            assert abs(r["est_union"] - r["n_exact_union"]) <= 0.5 * r["n_exact_union"]


@pytest.mark.slow
def test_dsir_separates_target_language(spark, sf_dir):
    """The importance score exists to pull target-domain docs upward: the
    mean score of 'en' documents must exceed the mean of the rest, and
    per-doc token counts must match the tokenizer."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = (
        Q["curation_dsir_weights"](spark, sf_dir)
        .join(docs.select("doc_id", "lang", "text"), "doc_id")
    )
    m = {
        r["is_en"]: r["m"]
        for r in scored.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("dsir_score_micro").alias("m"))
        .collect()
    }
    assert m[True] > m[False]
    bad = scored.where(
        F.size(F.split("text", " ")) != F.col("n_tokens")
    ).count()
    assert bad == 0


@pytest.mark.slow
def test_q2_costs_are_group_minima_in_europe(spark, sf_dir):
    """Every emitted offer must carry its part's minimum cost, and every
    emitted supplier must be region-qualified."""
    rows = Q["join_q2_min_cost_supplier"](spark, sf_dir).collect()
    assert rows
    by_part: dict[int, set[int]] = {}
    for r in rows:
        by_part.setdefault(r["p_partkey"], set()).add(r["cost_cents"])
    for part, costs in by_part.items():
        assert len(costs) == 1, f"part {part} emitted non-minimal ties {costs}"
    eu_names = {
        r["s_name"]
        for r in spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/nation.parquet"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            spark.read.parquet(f"{sf_dir}/region.parquet"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .where(F.col("r_name") == "EUROPE")
        .collect()
    }
    assert {r["s_name"] for r in rows} <= eu_names


@pytest.mark.slow
def test_q11_threshold_and_q16_bounds(spark, sf_dir):
    """Q11: every kept part exceeds the 0.1% concentration threshold
    against the total implied by the full stock rollup; Q16: supplier
    variety is positive and bounded by the qualified supplier pool."""
    q11 = Q["join_q11_important_stock"](spark, sf_dir)
    rows = q11.collect()
    assert rows
    # recompute the grand total from the same pseudo-partsupp pipeline
    from vmhub_data_pipeline_spark.queries.joins import _pseudo_partsupp

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    eu = (
        supplier.join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey")
    )
    total = (
        _pseudo_partsupp(part, supplier)
        .join(eu, F.col("s_suppkey") == F.col("ps_suppkey"))
        .agg(F.sum(F.col("ps_cost_cents") * F.col("ps_availqty")).alias("t"))
        .collect()[0]["t"]
    )
    for r in rows:
        assert r["value_cents"] * 1000 > total

    n_ok = supplier.where(F.col("s_acctbal") >= 0).count()
    for r in Q["join_q16_supplier_variety"](spark, sf_dir).collect():
        assert 1 <= r["supplier_cnt"] <= min(n_ok, 4 * 10**9)


def test_audio_energy_uses_bytes_not_chars(spark):
    """ADVICE r5: the energy path must parse UTF-8 BYTES. On non-ASCII text
    (2-byte chars) the window count must follow the OCTET length, and the
    per-sample values must be the encoded bytes — computed here in pure
    Python as the ground truth."""
    from vmhub_data_pipeline_spark.operators.multimodal import (
        attach_wav_payload,
        pcm_window_energy,
    )

    text = "héllo wörld ünïcode pâyload " * 3  # multi-byte chars throughout
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = pcm_window_energy(attach_wav_payload(docs, "doc_id", "text")).collect()[0]
    raw = text.encode("utf-8")
    n_win = len(raw) // 16
    assert row["n_windows"] == n_win
    expect_total = sum(
        sum((b - 128) ** 2 for b in raw[w * 16 : (w + 1) * 16]) for w in range(n_win)
    )
    assert row["total_energy"] == expect_total
