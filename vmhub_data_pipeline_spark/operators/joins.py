"""Join algorithms Spark lacks natively.

asof_join: the campaign-attribution join shape the reference's
message_history table implies (sent_at vs purchase time, reference
src/utils/bigquery_helper.py:63,67,68) generalized to any (left, right,
key, time) — single-pass union+window, no O(n*m) per-key expansion.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_time <= left_time (direction='backward') or the earliest with
    right_time >= left_time ('forward'), matching on ``on``.

    Implementation: tag and union both sides, sort within ``on`` by time
    (right rows before left at equal times for '<=' semantics), then carry
    the last non-null right payload forward with a running window. One
    shuffle on ``on``, linear per-row work — the 100 TB-safe form of the
    naive join+filter+rank. For 'forward', time order is reversed.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    # The whole right payload rides in ONE struct so last(ignorenulls=True)
    # picks an entire right row atomically. Carrying each column separately
    # would back-fill a NULL payload column from an OLDER right row, mixing
    # payloads across rows.
    payload_type = right.select(
        F.struct(*[F.col(c).alias(c) for c in right_value_cols]).alias("p")
    ).schema["p"].dataType
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c).alias(c) for c in right_value_cols]).alias("__r_payload"),
        *[F.lit(None).cast(t.dataType).alias(f"__l_{t.name}") for t in left.schema.fields],
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(payload_type).alias("__r_payload"),
        *[F.col(f.name).alias(f"__l_{f.name}") for f in left.schema.fields],
    )
    order = [F.col("__t"), F.col("__is_left")]
    if direction == "forward":
        order = [F.col("__t").desc(), F.col("__is_left")]
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "*",
        F.last("__r_payload", ignorenulls=True).over(w).alias("__rv"),
    )
    out_cols = [F.col(f"__l_{f.name}").alias(f.name) for f in left.schema.fields]
    out_cols += [F.col("__rv")[c].alias(c) for c in right_value_cols]
    return carried.filter(F.col("__is_left") == 1).select(*out_cols)


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Point-in-interval range join at scale: bucketize so it becomes an
    equi-join + residual filter.

    The naive non-equi join (lo <= p < hi) plans as a broadcast nested loop
    — fine for a literal band table (queries/joins.py join_range_banded),
    quadratic when both sides are large. Here each interval explodes into
    the buckets it overlaps, each point maps to one bucket, and the join is
    an equi-join on bucket id followed by the exact residual predicate.
    Cost: O(points + intervals * avg_span/bucket_width + matches); pick
    bucket_width near the median interval length.
    """
    b = float(bucket_width)
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / b))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b),
                F.floor((F.col(hi_col) - F.lit(1e-9)) / b),
            )
        ),
    )
    joined = p.join(iv, "__bucket").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("__bucket")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
) -> DataFrame:
    """Skew-resistant inner equi-join: left rows get a random-ish salt in
    [0, salt) (deterministic from row content via hash, for reproducibility)
    and the right side replicates ``salt`` ways, so one hot key spreads over
    ``salt`` shuffle partitions instead of one straggler task.

    AQE's skewJoin handles moderate skew automatically at runtime; explicit
    salting is for pathological keys (one key = 30% of rows) where even a
    split partition overwhelms a task. Trade-off: right side is replicated
    ``salt`` times — use for large-left/small-right joins on skewed keys.
    """
    lhs = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    rhs = right.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return lhs.join(rhs, [on, "__salt"]).drop("__salt")
