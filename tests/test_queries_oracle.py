"""Differential gate: every catalog query with an oracle must match DuckDB.

This mirrors the driver's CORRECTNESS check (row-count + columns +
order-insensitive values) at sf0.001 for fast iteration; the driver runs the
same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from vmhub_data_pipeline_spark import queries as catalog
from vmhub_data_pipeline_spark.testing import compare

catalog._load_all()
CASES = [(n, q) for n, q in sorted(catalog.REGISTRY.items()) if q.oracle is not None]
NO_ORACLE = [(n, q) for n, q in sorted(catalog.REGISTRY.items()) if q.oracle is None]

# r14 (VERDICT r13 task 2): the full 247-oracle mirror outgrew the external
# verify budget (r13's driver pytest run was cut at ~48%). The default run
# keeps the driver's own 50-entry PRIORITY_WINDOW (the entries the external
# CORRECTNESS harness re-checks at sf0.01 — a window regression would fail
# BOTH gates) and marks the rest `slow`; the full catalog mirror still runs
# with `-m ""` / `-m slow` and before any registry/window change.
_WINDOW = set(catalog.PRIORITY_WINDOW)
_PARAMS = [
    (n, q) if n in _WINDOW else pytest.param(n, q, marks=pytest.mark.slow)
    for n, q in CASES
]


@pytest.mark.parametrize("name,q", _PARAMS, ids=[n for n, _ in CASES])
def test_oracle_parity(spark, sf_dir, name, q):
    ok, detail = compare(spark, q.fn, q.oracle, sf_dir)
    assert ok, f"{name}: {detail}"
    # a 0=0 "match" verifies nothing — every oracle query must return rows
    assert "(0 rows)" not in detail, f"{name}: oracle query returned no rows — vacuous check"


def test_mirror_is_type_aware(spark, sf_dir):
    """A value-identical but HUGEINT-typed oracle must FAIL the mirror.

    Regression for the round-2 ``text_langid`` driver failure: DuckDB's
    ``SUM(BIGINT)`` returns HUGEINT, the driver's type-sensitive hash
    diverges from Spark's LongType, but ``fetchall()`` coerces to Python int
    so a value-only mirror passed. The mirror now checks result types.
    """
    import pyspark.sql.functions as F

    def spark_sum(s, d):
        df = s.read.parquet(f"{d}/documents.parquet")
        return df.agg(F.sum(F.length("text")).cast("long").alias("total_chars"))

    uncast = "SELECT SUM(LENGTH(text)) AS total_chars FROM documents"
    ok, detail = compare(spark, spark_sum, uncast, sf_dir)
    assert not ok and "int128" in detail, f"uncast SUM must fail the mirror: {detail}"

    cast = "SELECT CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars FROM documents"
    ok, detail = compare(spark, spark_sum, cast, sf_dir)
    assert ok, f"cast SUM must pass: {detail}"


def test_mirror_rejects_array_columns(spark, sf_dir):
    """An array-typed output column must FAIL the mirror on BOTH sides even
    when the values are identical.

    Regression for the round-3 ``vector_quantize_int8`` driver failure: the
    driver's pandas canonicalizer sorts the frame before hashing and throws
    ``TypeError: unhashable type: 'list'`` on list cells, while the local
    mirror canonicalized lists via ``repr`` and passed. Arrays must be
    serialized (``concat_ws`` / ``array_to_string``) before returning.
    """
    import pyspark.sql.functions as F

    def spark_array(s, d):
        df = s.read.parquet(f"{d}/documents.parquet")
        return df.groupBy("source").agg(
            F.array_sort(F.collect_set("lang")).alias("langs")
        )

    array_sql = (
        "SELECT source, list_sort(list(DISTINCT lang)) AS langs "
        "FROM documents GROUP BY source"
    )
    ok, detail = compare(spark, spark_array, array_sql, sf_dir)
    assert not ok and "nested" in detail, f"array output must fail the mirror: {detail}"

    def spark_str(s, d):
        df = s.read.parquet(f"{d}/documents.parquet")
        return df.groupBy("source").agg(
            F.concat_ws(",", F.array_sort(F.collect_set("lang"))).alias("langs")
        )

    str_sql = (
        "SELECT source, array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs "
        "FROM documents GROUP BY source"
    )
    ok, detail = compare(spark, spark_str, str_sql, sf_dir)
    assert ok, f"serialized form must pass: {detail}"


def test_mirror_flags_class_mismatch(spark, sf_dir):
    """An int-vs-float class drift between engines must fail even when the
    values would normalize equal (e.g. 1 vs 1.0)."""
    import pyspark.sql.functions as F

    def spark_int(s, d):
        df = s.read.parquet(f"{d}/documents.parquet")
        return df.agg(F.count(F.lit(1)).cast("long").alias("n"))

    as_double = "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents"
    ok, detail = compare(spark, spark_int, as_double, sf_dir)
    assert not ok and "class" in detail, f"class drift must fail the mirror: {detail}"


if NO_ORACLE:

    @pytest.mark.parametrize("name,q", NO_ORACLE, ids=[n for n, _ in NO_ORACLE])
    def test_rows_only(spark, sf_dir, name, q):
        df = q.fn(spark, sf_dir)
        assert df.count() >= 0
        assert len(df.columns) > 0
