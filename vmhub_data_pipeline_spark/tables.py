"""Fixture-table loading for the driver's synthetic star schema.

Tables (per /root/repo/TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file per table
under ``{sf_dir}/``.

All loads go through ``spark.read.parquet`` so Catalyst gets real parquet
scans: column pruning and predicate pushdown reach the file
(``PushedFilters``/``ReadSchema`` in ``.explain``), and at cluster scale a
directory of part-files partitions automatically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import tune

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region and
# nation are fixed-size; supplier/part/customer grow with sf but stay far
# below executor memory at the tested sfs — at true 100 TB scale the planner's
# size-based broadcast threshold takes over, which is why joins below use
# explicit broadcast() only for the fixed-size dims).
FIXED_SIZE_DIMS = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown fixture table {name!r}; valid: {TABLE_NAMES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # ts is parquet TIMESTAMP(NANOS), read as ns-since-epoch long via
            # spark.sql.legacy.parquet.nanosAsLong. Integer `div` floors to µs,
            # matching DuckDB's ns->µs truncation exactly.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Parquet timestamp[us] without tz reads as TIMESTAMP_NTZ under
            # Spark 4's inferTimestampNTZ. Session tz is pinned to UTC, so the
            # cast is a pure reinterpretation (same wall clock, same micros);
            # downstream µs arithmetic (unix_micros) needs the LTZ type.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load tables by name; applies runtime tuning (UTC tz, AQE) first."""
    tune(spark)
    return [table(spark, sf_dir, n) for n in names]
