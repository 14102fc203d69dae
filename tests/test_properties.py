"""Property-based tests (SURVEY §5.4): idempotency, dedup invariance,
watermark monotonicity, exact-aggregation correctness.

Pure-function properties run at full hypothesis strength; Spark-backed
properties cap examples (session round-trips are ~100ms each).
"""

from __future__ import annotations

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
def test_exact_dsum_matches_decimal_sum(spark, cents):
    """dsum over 2-dp doubles equals the exact Decimal sum, independent of
    partitioning (the whole point of integer quantization)."""
    vals = [(c / 100.0,) for c in cents]
    df = spark.createDataFrame(vals, "x double").repartition(4)
    got = df.agg(dsum("x", 2).alias("s")).first()["s"]
    want = float(sum(Decimal(c) for c in cents) / 100)
    assert got == want
