"""Local differential harness mirroring the driver's correctness gate.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet fixture dir, then compares row count, column names, and values
order-insensitively. Used by tests/ so every registered query is verified
locally before the driver ever sees it.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
from pyspark.sql import SparkSession

from .tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 vs 0.0 and any sub-rounding fp noise far below the
        # catalog's explicit ROUND() quanta
        return round(v + 0.0, 9)
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def compare(
    spark: SparkSession, fn, oracle: str, sf_dir: str
) -> tuple[bool, str]:
    """Return (ok, detail). Mirrors the driver: count + columns + values."""
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(oracle, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row-count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    sn = _norm_rows(s_cols, s_rows)
    on = _norm_rows(o_cols, o_rows)
    if sn != on:
        diffs = [(a, b) for a, b in zip(sn, on) if a != b][:3]
        return False, f"value mismatch, first diffs (spark, oracle): {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
