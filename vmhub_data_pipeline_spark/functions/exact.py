"""Exact decimal aggregation: tie-free, order-independent, engine-portable.

The fixture money columns are exact short decimals (2 dp; derived products
are 4-6 dp). Summing them as raw doubles makes the result depend on fp
summation order, and rounding the result hits exact ``.xx5`` ties where
engines disagree (Java BigDecimal HALF_UP vs C-library rounding). Both
problems disappear if each row is quantized to an integer at a scale >= its
exact decimal length BEFORE aggregation:

* the quantization never sees a tie (the scaled value is within ~1e-9 of an
  integer, never near ``x.5``);
* the integer SUM is exact and associative — order-independent on any
  cluster topology, no fp drift at 100 TB row counts;
* dividing the integer back by ``10^scale`` is one double op on identical
  operands in both engines -> bit-identical output.

This is the same reason production engines aggregate money as DECIMAL; here
we keep doubles at the edges for parquet-schema parity and do the exactness
in the middle.

``dsum``/``davg`` build the Spark expression; ``sql_dsum``/``sql_davg`` emit
the structurally identical DuckDB SQL so the driver's value-hash matches.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def quant(col: Column | str, scale: int) -> Column:
    """Row-level integer quantization at ``scale`` decimal places."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(float(10**scale))).cast("long")


def dsum(col: Column | str, scale: int) -> Column:
    """Exact SUM of a ``scale``-dp decimal column, returned as double."""
    return F.sum(quant(col, scale)).cast("double") / F.lit(float(10**scale))


def davg(col: Column | str, scale: int) -> Column:
    """Exact-numerator AVG of a ``scale``-dp decimal column as double.

    Shaped as ((sum / count) / 10^scale) so the oracle SQL evaluates the
    identical double expression tree.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(quant(c, scale)).cast("double") / F.count(c).cast("double")
    ) / F.lit(float(10**scale))


def sql_dsum(expr: str, scale: int, alias: str) -> str:
    m = 10**scale
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {m}.0) AS BIGINT)) AS DOUBLE) / {m}.0 AS {alias}"
    )


def sql_davg(expr: str, scale: int, alias: str) -> str:
    m = 10**scale
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {m}.0) AS BIGINT)) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE) / {m}.0 AS {alias}"
    )
