"""Custom stateful streaming operator via applyInPandasWithState (T6: the
"custom stateful operators" tier beyond built-in windows/dedup).

Example operator: per-user running profile — cumulative event count, total
value, and last-seen timestamp, emitted once per micro-batch per active
user. State is one small tuple per user, bounded by a processing-time
timeout (state for idle users is dropped — the property that keeps state
size proportional to ACTIVE keys, not all-time keys, at 100 TB).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def _update_user_profile(key, pdfs: Iterable, state: GroupState):
    import pandas as pd

    if state.hasTimedOut:
        # Timeout invocation: no new data for this key within the timeout
        # window. Drop the state and emit nothing — this is what bounds
        # state size to ACTIVE keys. (Re-registering a timeout here would
        # keep idle-key state alive forever.)
        state.remove()
        return

    (user_id,) = key
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # integer-cents accumulation: state survives arbitrarily many
        # micro-batches without fp drift. fillna BEFORE the int cast — the
        # schema allows null values, and astype('int64') on NaN raises,
        # which would kill the stream permanently (same failed task on
        # every retry)
        cents += int((pdf["value"].fillna(0.0) * 100).round().astype("int64").sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max()) // 1000)
    state.update((n, cents, last_us))
    state.setTimeoutDuration(24 * 3600 * 1000)  # drop idle-user state
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [cents / 100.0],
            "last_seen": [pd.Timestamp(last_us * 1000)],
        }
    )


def stream_user_profiles(events: DataFrame) -> DataFrame:
    """Stateful per-user profile stream. Works on a streaming DataFrame
    (update output mode); grouping keys shuffle once, then state lives with
    its partition across micro-batches."""
    from ..functions.pickling import ship_module_by_value

    ship_module_by_value(__name__)
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


class UserProfileProcessor(StatefulProcessor):
    """The same per-user profile as `_update_user_profile`, on Spark 4's
    `transformWithState` API (StatefulProcessor) — the successor to
    applyInPandasWithState with FIRST-CLASS state primitives instead of a
    single tuple: named value/list/map states, per-state TTL, and timers.

    State here is one ValueState with a TTL — the runtime evicts idle-user
    state by itself (the bounded-state property the old API needed the
    manual hasTimedOut dance for). Declared lazily in init() against the
    handle, so the same class instance is serialization-safe.

    Runtime requirement: the transformWithState state-server protocol
    speaks protobuf from the Python side — executing it needs the
    ``protobuf`` package (absent from this container, so the equivalence
    test skips; the applyInPandasWithState twin above carries the executed
    coverage). The implementation itself is plain public API.
    """

    TTL_MS = 24 * 3600 * 1000

    def init(self, handle) -> None:  # StatefulProcessorHandle
        self._profile = handle.getValueState(
            "profile",
            "n_events long, total_value_cents long, last_seen_us long",
            ttlDurationMs=self.TTL_MS,
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        (user_id,) = key
        n, cents, last_us = (
            tuple(self._profile.get()) if self._profile.exists() else (0, 0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            # fillna before the int cast: NaN -> astype('int64') raises and
            # would permanently fail the stream (see _update_user_profile)
            cents += int((pdf["value"].fillna(0.0) * 100).round().astype("int64").sum())
            if len(pdf):
                last_us = max(last_us, int(pdf["ts"].astype("int64").max()) // 1000)
        self._profile.update((n, cents, last_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [cents / 100.0],
                "last_seen": [pd.Timestamp(last_us * 1000)],
            }
        )

    def close(self) -> None:
        pass


def stream_user_profiles_tws(events: DataFrame) -> DataFrame:
    """stream_user_profiles on the transformWithState runtime (update mode,
    processing-time TTL eviction). Output contract is identical — tests pin
    both implementations to the same batch aggregate."""
    from ..functions.pickling import ship_module_by_value

    ship_module_by_value(__name__)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="ProcessingTime",
    )
