"""Endpoint fan-out orchestration + applyInPandasWithState operator."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vmhub_data_pipeline_spark.pipeline import run_endpoints
from vmhub_data_pipeline_spark.streaming.events import (
    TS_FORMAT,
    events_file_stream,
    start_to_memory,
)
from vmhub_data_pipeline_spark.streaming.stateful import stream_user_profiles
from vmhub_data_pipeline_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_run_endpoints_isolates_failures():
    calls = []

    def ok_job():
        calls.append("ok")
        return 42

    def bad_job():
        raise RuntimeError("endpoint exploded")

    results = run_endpoints({"clientes": ok_job, "vendas": bad_job}, max_workers=2)
    by_name = {r.endpoint: r for r in results}
    assert by_name["clientes"].ok and by_name["clientes"].rows == 42
    assert not by_name["vendas"].ok
    assert "endpoint exploded" in by_name["vendas"].error
    # one failure never blocks the other endpoint (reference src/main.py:344-352)
    assert calls == ["ok"]


class _FakeGroupState:
    """Minimal GroupState double for exercising the timeout path directly
    (a real ProcessingTimeTimeout needs multi-micro-batch wall-clock waits)."""

    def __init__(self, existing=None, timed_out=False):
        self._state = existing
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._state is not None

    @property
    def get(self):
        return self._state

    def update(self, v):
        self._state = v

    def remove(self):
        self._state, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_stateful_timeout_removes_state_and_emits_nothing():
    from vmhub_data_pipeline_spark.streaming.stateful import _update_user_profile

    state = _FakeGroupState(existing=(5, 1200, 1_000_000), timed_out=True)
    out = list(_update_user_profile((7,), iter([]), state))
    assert out == []  # no spurious row on timeout
    assert state.removed  # idle-key state dropped
    assert state.timeout_set is None  # not re-registered


def test_stateful_data_path_updates_and_extends_timeout():
    import pandas as pd

    from vmhub_data_pipeline_spark.streaming.stateful import _update_user_profile

    pdf = pd.DataFrame(
        {"value": [1.25, 2.50], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"])}
    )
    state = _FakeGroupState()
    out = list(_update_user_profile((7,), iter([pdf]), state))
    assert len(out) == 1 and out[0]["n_events"].iloc[0] == 2
    assert state.get == (2, 375, int(pd.Timestamp("2024-01-02").value) // 1000)
    assert state.timeout_set == 24 * 3600 * 1000


@pytest.mark.slow
def test_stateful_user_profiles_match_batch(spark, tmp_path):
    import pyspark.sql.functions as F0

    # subset of users: applyInPandasWithState pays per-(group, micro-batch)
    # Python overhead; 30 users x 2 files covers the semantics at ~4x less
    # wall time than the full fixture
    ev = table(spark, SF, "events").filter(F0.col("user_id") < 30)
    path = str(tmp_path / "events")
    ev.repartition(2).write.mode("overwrite").option("timestampFormat", TS_FORMAT).json(path)

    q = start_to_memory(
        stream_user_profiles(events_file_stream(spark, path)),
        "t_profiles",
        output_mode="update",
    )
    q.awaitTermination(120)
    # update mode may emit a row per (user, micro-batch); the LAST emission
    # per user carries the final state
    out = spark.table("t_profiles")
    final = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 2))
        for r in out.orderBy("n_events").collect()  # ascending: later overwrite wins
    }
    want = {
        r["user_id"]: (r["n"], round(r["tv"], 2))
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("tv"),
        )
        .collect()
    }
    assert final == want


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState state-server protocol needs the protobuf "
    "package (absent from this container); the applyInPandasWithState twin "
    "carries executed coverage",
)
def test_transform_with_state_profiles_match_batch(spark, tmp_path):
    """Spark 4 transformWithState runtime: same per-user profile contract,
    state as a TTL'd ValueState instead of the manual timeout dance."""
    import pyspark.sql.functions as F0

    from vmhub_data_pipeline_spark.streaming.stateful import stream_user_profiles_tws

    ev = table(spark, SF, "events").filter(F0.col("user_id") < 30)
    path = str(tmp_path / "events_tws")
    ev.repartition(2).write.mode("overwrite").option("timestampFormat", TS_FORMAT).json(path)

    q = start_to_memory(
        stream_user_profiles_tws(events_file_stream(spark, path)),
        "t_profiles_tws",
        output_mode="update",
    )
    q.awaitTermination(120)
    out = spark.table("t_profiles_tws")
    final = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 2))
        for r in out.orderBy("n_events").collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["tv"], 2))
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("tv"),
        )
        .collect()
    }
    assert final == want


def test_transform_with_state_processor_logic_directly():
    """The StatefulProcessor's per-batch math, exercised against a fake
    ValueState (the streaming protocol itself is gated on protobuf above):
    accumulation across calls, integer-cents exactness, last-seen max."""
    import pandas as pd

    from vmhub_data_pipeline_spark.streaming.stateful import UserProfileProcessor

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema, ttlDurationMs=None):
            self.ttl = ttlDurationMs
            return self.states.setdefault(name, FakeValueState())

    proc = UserProfileProcessor()
    handle = FakeHandle()
    proc.init(handle)
    assert handle.ttl == UserProfileProcessor.TTL_MS

    pdf1 = pd.DataFrame(
        {"value": [1.25, 2.50], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"])}
    )
    (out1,) = list(proc.handleInputRows((7,), iter([pdf1]), None))
    assert out1["n_events"].iloc[0] == 2
    assert out1["total_value"].iloc[0] == 3.75

    pdf2 = pd.DataFrame({"value": [0.01], "ts": pd.to_datetime(["2024-01-03"])})
    (out2,) = list(proc.handleInputRows((7,), iter([pdf2]), None))
    assert out2["n_events"].iloc[0] == 3
    assert out2["total_value"].iloc[0] == 3.76  # exact cents, no fp drift
    assert out2["last_seen"].iloc[0] == pd.Timestamp("2024-01-03")


def test_stateful_null_value_does_not_kill_the_stream():
    """EVENTS_SCHEMA allows null value; NaN -> astype('int64') raises, which
    would fail the task identically on every retry (stream permanently
    dead). The update function must treat null value as 0 cents."""
    import numpy as np
    import pandas as pd

    from vmhub_data_pipeline_spark.streaming.stateful import _update_user_profile

    state = _FakeGroupState()
    pdf = pd.DataFrame(
        {"value": [1.25, np.nan], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"])}
    )
    out = list(_update_user_profile((7,), iter([pdf]), state))
    assert len(out) == 1
    assert state.get == (2, 125, int(pd.Timestamp("2024-01-02").value) // 1000)
