"""Property-based tests (SURVEY §5.4): idempotency, dedup invariance,
watermark monotonicity, exact-aggregation correctness.

Pure-function properties run at full hypothesis strength; Spark-backed
properties cap examples (session round-trips are ~100ms each).
"""

from __future__ import annotations

import pytest

from datetime import date, timedelta
from decimal import Decimal

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vmhub_data_pipeline_spark.functions import dsum
from vmhub_data_pipeline_spark.operators.dedup import keep_latest
from vmhub_data_pipeline_spark.pipeline.watermark import daily_ranges, resume_start

dates = st.dates(min_value=date(2000, 1, 1), max_value=date(2030, 1, 1))


@given(start=dates, extra=st.integers(min_value=0, max_value=400))
def test_daily_ranges_cover_exactly(start, extra):
    end = start + timedelta(days=extra)
    r = daily_ranges(start, end)
    assert len(r) == extra + 1
    assert r[0][0] == start and r[-1][1] == end
    # contiguous, closed, non-overlapping day slices
    for (a0, a1), (b0, b1) in zip(r, r[1:]):
        assert a0 == a1 and b0 == b1
        assert b0 - a0 == timedelta(days=1)


@given(wm=st.one_of(st.none(), dates), today=dates)
def test_resume_start_monotone_and_bounded(wm, today):
    s = resume_start(wm, today)
    if wm is None:
        assert (today - s).days == 730  # cold start window (reference src/main.py:204)
    else:
        assert s == wm + timedelta(days=1)
        # a later watermark never resumes earlier (monotonicity)
        assert resume_start(wm + timedelta(days=1), today) > s


_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key (collisions likely)
        st.integers(min_value=0, max_value=50),  # version
        st.text(alphabet="abc", min_size=1, max_size=3),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=_rows)
@pytest.mark.slow
def test_keep_latest_invariant_under_duplication(spark, rows):
    """keep_latest(df ∪ df) == keep_latest(df), and the winner per key is
    the max (version, payload) under the dedup ordering."""
    df = spark.createDataFrame(rows, "k long, v long, payload string")
    once = {tuple(r) for r in keep_latest(df, ["k"], ["v", "payload"]).collect()}
    doubled = {
        tuple(r)
        for r in keep_latest(df.unionAll(df), ["k"], ["v", "payload"]).collect()
    }
    assert once == doubled
    want = {}
    for k, v, p in rows:
        if k not in want or (v, p) > want[k]:
            want[k] = (v, p)
    assert once == {(k, v, p) for k, (v, p) in want.items()}


_money = st.lists(
    st.integers(min_value=-10_000_00, max_value=10_000_00),  # exact cents
    min_size=1,
    max_size=30,
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(cents=_money)
@pytest.mark.slow
def test_exact_dsum_matches_decimal_sum(spark, cents):
    """dsum over 2-dp doubles equals the exact Decimal sum, independent of
    partitioning (the whole point of integer quantization)."""
    vals = [(c / 100.0,) for c in cents]
    df = spark.createDataFrame(vals, "x double").repartition(4)
    got = df.agg(dsum("x", 2).alias("s")).first()["s"]
    want = float(sum(Decimal(c) for c in cents) / 100)
    assert got == want


# ---- dataset-assembly properties (operators/sampling.py) ----

_pack_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # shard
        st.integers(min_value=1, max_value=300),  # token count
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=_pack_rows, budget=st.integers(min_value=50, max_value=200))
@pytest.mark.slow
def test_pack_sequences_properties(spark, rows, budget):
    """Invariants: bins within a shard are contiguous from 0; a bin's
    tokens_before values all fall in [bin*budget, (bin+1)*budget); every
    doc's bin equals floor(exclusive-cumsum / budget)."""
    from vmhub_data_pipeline_spark.operators.sampling import pack_sequences

    data = [(s, i, t) for i, (s, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "shard int, seq long, n_tokens long")
    out = pack_sequences(df, "shard", "seq", "n_tokens", budget=budget).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["seq"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        cum = 0
        bins = []
        for r in shard_rows:
            assert r["tokens_before"] == cum
            assert r["bin_id"] == cum // budget
            cum += r["n_tokens"]
            bins.append(r["bin_id"])
        # bins start at 0 and never decrease (contiguity up to oversized docs)
        assert bins[0] == 0
        assert all(a <= b for a, b in zip(bins, bins[1:]))


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40, unique=True),
    n=st.integers(min_value=1, max_value=5),
)
@pytest.mark.slow
def test_stratified_sample_is_deterministic_subset(spark, ids, n):
    from vmhub_data_pipeline_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame([(i, i % 3) for i in ids], "k long, g int")
    a = {(r["k"], r["sample_rank"]) for r in stratified_sample(df, ["g"], n, "k").collect()}
    b = {(r["k"], r["sample_rank"]) for r in stratified_sample(df, ["g"], n, "k").collect()}
    assert a == b  # deterministic
    kept = {k for k, _ in a}
    assert kept <= set(ids)  # subset
    from collections import Counter

    per = Counter(k % 3 for k in kept)
    for g in set(i % 3 for i in ids):
        assert per[g] == min(n, sum(1 for i in ids if i % 3 == g))  # exactly-min(n,|stratum|)


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            min_size=4, max_size=4,
        ),
        min_size=1, max_size=12,
    )
)
@pytest.mark.slow
def test_int8_quantization_error_bound(spark, vecs):
    """Symmetric nearest-rounding int8 quantization: reconstruction error is
    at most half a quantization step, scale_d / 254, per dimension."""
    from vmhub_data_pipeline_spark.queries.vector import vector_quantize_int8

    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ])
    df = spark.createDataFrame([(i, v, 0) for i, v in enumerate(vecs)], schema)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/embeddings.parquet")
        out = vector_quantize_int8(spark, d).collect()
    per_dim_max = [max(abs(v[j]) for v in vecs) for j in range(4)]
    bound = max(m / 254.0 for m in per_dim_max) + 1e-9
    for r in out:
        codes = [int(x) for x in r["codes"].split(",")]  # r4: codes serialized via concat_ws
        assert all(abs(c) <= 127 for c in codes)  # range by construction
        assert r["max_abs_err"] <= round(bound + 5e-7, 6)


def test_scd2_ranges_partition_the_timeline(spark, sf_dir):
    """Per user: versions are dense from 1, ranges chain exactly
    (valid_to == next valid_from), exactly one open current row, and
    consecutive statuses always differ (runs were collapsed)."""
    from vmhub_data_pipeline_spark.queries.events import events_scd2_history

    rows = events_scd2_history(spark, sf_dir).collect()
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    assert by_user
    for user, hist in by_user.items():
        hist.sort(key=lambda r: r["version"])
        assert [r["version"] for r in hist] == list(range(1, len(hist) + 1))
        assert sum(1 for r in hist if r["is_current"]) == 1
        assert hist[-1]["is_current"] and hist[-1]["valid_to"] is None
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["status"] != b["status"]


def test_chunk_windows_cover_every_token(spark, sf_dir):
    """Chunking invariants at fixture scale: chunk token-counts per doc sum
    to len + (n_chunks-1)*overlap (every token covered, overlap exactly 16
    between neighbors), and only the final chunk may be short."""
    from vmhub_data_pipeline_spark.queries.sampling import curation_chunk_windows

    (docs,) = spark.read.parquet(f"{sf_dir}/documents.parquet"),
    lens = {r["doc_id"]: len(r["text"].split(" ")) for r in docs.collect()}
    from collections import defaultdict

    chunks = defaultdict(list)
    for r in curation_chunk_windows(spark, sf_dir).collect():
        chunks[r["doc_id"]].append(r)
    assert set(chunks) == set(lens)
    for doc, cs in chunks.items():
        cs.sort(key=lambda r: r["chunk_no"])
        n = lens[doc]
        covered = max(r["start_token"] + r["n_tokens"] - 1 for r in cs)
        assert covered == n  # last token reached, no phantom tail
        for c in cs[:-1]:
            assert c["n_tokens"] == 64  # only the tail chunk may be short


def test_kmv_merge_identity_pure():
    """Sketch-merge algebra (no Spark needed): the k smallest hashes of a
    union equal the k smallest of the union of per-group k-smallest sets —
    the property agg_kmv_merge relies on, checked over random partitions."""
    import hashlib
    import random

    rng = random.Random(7)
    k = 32
    values = list(range(1000))

    def h(v):
        return int(hashlib.md5(f"kmv-v1:{v}".encode()).hexdigest()[:13], 16)

    for _ in range(20):
        groups = [[] for _ in range(rng.randint(2, 6))]
        for v in values:
            groups[rng.randrange(len(groups))].append(v)
        direct = sorted({h(v) for v in values})[:k]
        per_group = [sorted({h(v) for v in g})[:k] for g in groups if g]
        merged = sorted(set().union(*map(set, per_group)))[:k]
        assert merged == direct


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    counts=st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=12),
    budget=st.integers(min_value=1, max_value=10**6),
)
@pytest.mark.slow
def test_largest_remainder_apportionment_properties(spark, counts, budget):
    """For ANY group counts and budget: quotas sum to exactly B, every
    quota is within 1 of exact proportionality, and quotas are monotone
    in count (a strictly larger group never gets a smaller quota) — the
    Hare-quota guarantees, checked on the same integer math the catalog
    query uses."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(f"s{i:02d}", c) for i, c in enumerate(counts)], "source string, n_total long"
    )
    t = df.agg(F.sum("n_total").cast("long").alias("grand"))
    q = df.crossJoin(F.broadcast(t)).select(
        "source",
        "n_total",
        F.expr(f"CAST({budget} * n_total div grand AS BIGINT)").alias("base_quota"),
        F.expr(f"CAST({budget} * n_total % grand AS BIGINT)").alias("remainder"),
        "grand",
    )
    lo = q.agg((F.lit(budget).cast("long") - F.sum("base_quota")).alias("leftover"))
    w = Window.orderBy(F.col("remainder").desc(), F.col("source").asc())
    out = (
        q.crossJoin(F.broadcast(lo))
        .withColumn("rk", F.row_number().over(w))
        .select(
            "source",
            "n_total",
            "grand",
            (
                F.col("base_quota")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            ).alias("final_quota"),
        )
    ).collect()
    assert sum(r["final_quota"] for r in out) == budget
    grand = out[0]["grand"]
    by_count = {}
    for r in out:
        assert abs(r["final_quota"] - budget * r["n_total"] / grand) < 1.0
        by_count.setdefault(r["n_total"], []).append(r["final_quota"])
    ordered = sorted((n, max(qs)) for n, qs in by_count.items())
    for (n1, q1), (n2, q2) in zip(ordered, ordered[1:]):
        if n2 > n1:
            assert q2 >= min(by_count[n1])


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    channels=st.integers(min_value=1, max_value=8),
    rate=st.sampled_from([8000, 11025, 16000, 22050, 44100, 48000, 96000]),
    bits=st.sampled_from([8, 16, 24, 32]),
    data=st.binary(min_size=0, max_size=64),
)
@pytest.mark.slow
def test_wav_build_parse_roundtrip_any_params(spark, channels, rate, bits, data):
    """decode_wav_header must invert a canonical PCM header for ANY valid
    parameter combination — not just the fixture adapter's three rates and
    two depths."""
    import struct

    from vmhub_data_pipeline_spark.operators.multimodal import decode_wav_header

    block = max(1, channels * bits // 8)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, bits)
        + b"data" + struct.pack("<I", len(data))
    )
    df = spark.createDataFrame(
        [(1, bytearray(hdr + data))], "doc_id long, payload binary"
    )
    row = decode_wav_header(df).collect()[0]
    assert (row["format"], row["channels"], row["sample_rate"], row["bits_per_sample"]) == (
        "wav", channels, rate, bits
    )
    assert row["data_bytes"] == len(data)
    assert row["duration_ms"] == len(data) * 8 * 1000 // (rate * channels * bits)
