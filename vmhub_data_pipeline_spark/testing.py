"""Local differential harness mirroring the driver's correctness gate.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet fixture dir, then compares row count, column names, column TYPE
CLASSES, and values order-insensitively. Used by tests/ so every registered
query is verified locally before the driver ever sees it.

The type-class check exists because the driver's value hash is type-sensitive
while DuckDB's ``fetchall()`` coerces everything to Python scalars: a DuckDB
``SUM(BIGINT)`` silently returns HUGEINT (int128) whose *values* equal Spark's
LongType output, so a value-only mirror passes while the driver fails (this is
exactly how the round-2 ``text_langid`` failure slipped through). HUGEINT /
UHUGEINT oracle columns are therefore forbidden outright, and every other
column must land in the same coarse type class (int / float / string / bool /
date / timestamp / decimal) on both engines.

Array/struct/map-typed output columns are likewise forbidden on BOTH sides
for any oracle-backed query: the driver's pandas canonicalizer sorts the
result frame before hashing and dies on unhashable list cells
(``TypeError: unhashable type: 'list'`` — round 3's one driver failure,
``vector_quantize_int8``). The repo convention is to serialize arrays with
``concat_ws`` / ``array_to_string`` before returning them.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
from pyspark.sql import SparkSession

from .tables import TABLE_NAMES

_FORBIDDEN_DUCK = ("HUGEINT", "UHUGEINT")


def _duck_type_class(t: str) -> str:
    t = t.upper()
    if t in _FORBIDDEN_DUCK:
        return "int128"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t in ("VARCHAR", "STRING", "TEXT"):
        return "string"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.endswith("[]") or t.startswith(("STRUCT", "MAP", "LIST", "ARRAY")):
        return "nested"
    return "other"


def _spark_type_class(t: str) -> str:
    t = t.lower()
    if t.startswith("decimal"):
        return "decimal"
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t in ("double", "float"):
        return "float"
    if t == "string":
        return "string"
    if t == "boolean":
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith(("array", "struct", "map")):
        return "nested"
    return "other"


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[str], list[tuple]]:
    """Execute oracle SQL on DuckDB views over the fixture dir.

    Returns (column_names, column_type_strings, rows).
    """
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        rel = con.sql(sql)
        cols = list(rel.columns)
        types = [str(t) for t in rel.types]
        rows = rel.fetchall()
        return cols, types, rows
    finally:
        con.close()


def oracle_type_violations(
    o_cols: list[str], o_types: list[str],
    s_cols: list[str], s_types: list[str],
) -> list[str]:
    """Type-class mismatches between a DuckDB result and a Spark result.

    Returns human-readable violation strings; empty list == type-clean.
    """
    out = []
    s_class = {c: _spark_type_class(t) for c, t in zip(s_cols, s_types)}
    for c, st in s_class.items():
        if st == "nested":
            out.append(
                f"column {c!r}: spark nested type is forbidden in oracle-checked "
                f"output — serialize with concat_ws(',', ...) (driver canonicalizer "
                f"cannot sort list cells)"
            )
    for c, t in zip(o_cols, o_types):
        oc = _duck_type_class(t)
        if oc == "int128":
            out.append(
                f"column {c!r}: oracle type {t} (int128) is forbidden — "
                f"wrap the aggregate in CAST(... AS BIGINT)"
            )
            continue
        if oc == "nested":
            out.append(
                f"column {c!r}: oracle type {t} (nested) is forbidden — "
                f"serialize with array_to_string(...)"
            )
            continue
        sc = s_class.get(c)
        if sc is None:
            continue  # column-name mismatch reported separately
        if oc != "other" and sc != "other" and oc != sc:
            out.append(f"column {c!r}: oracle class {oc} ({t}) != spark class {sc}")
    return out


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
    """Return (ok, detail). Mirrors the driver: count + columns + types + values."""
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_types = [t for _, t in sdf.dtypes]
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_types, o_rows = run_oracle(oracle, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    violations = oracle_type_violations(o_cols, o_types, s_cols, s_types)
    if violations:
        return False, "type mismatch: " + "; ".join(violations)
    if len(s_rows) != len(o_rows):
        return False, f"row-count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    sn = _norm_rows(s_cols, s_rows)
    on = _norm_rows(o_cols, o_rows)
    if sn != on:
        diffs = [(a, b) for a, b in zip(sn, on) if a != b][:3]
        return False, f"value mismatch, first diffs (spark, oracle): {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
