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
        # micro-batches without fp drift
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
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
