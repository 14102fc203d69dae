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


@pytest.mark.parametrize("name,q", CASES, ids=[n for n, _ in CASES])
def test_oracle_parity(spark, sf_dir, name, q):
    ok, detail = compare(spark, q.fn, q.oracle, sf_dir)
    assert ok, f"{name}: {detail}"
    # a 0=0 "match" verifies nothing — every oracle query must return rows
    assert "(0 rows)" not in detail, f"{name}: oracle query returned no rows — vacuous check"


if NO_ORACLE:

    @pytest.mark.parametrize("name,q", NO_ORACLE, ids=[n for n, _ in NO_ORACLE])
    def test_rows_only(spark, sf_dir, name, q):
        df = q.fn(spark, sf_dir)
        assert df.count() >= 0
        assert len(df.columns) > 0
