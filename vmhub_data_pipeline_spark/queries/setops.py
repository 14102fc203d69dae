"""Set operations, distinct, global sort/top-k — SURVEY.md §2.6 (O1-O4).

The reference's only ordering ops are max-of-list (gcs_helper.py:220) and
ordered daily iteration (endpoints.py:24-34); the full set-op/top-k surface
is the driver-mandated [X] tier.

Scale notes: INTERSECT/EXCEPT plan as aggregate + shuffle on the projected
key (not row-by-row comparison); global top-k plans as
TakeOrderedAndProject — per-partition heap of k, only k rows per partition
reach the driver-side merge, no global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..tables import load
from . import register

_INTERSECT_ORACLE = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
"""


@register("set_intersect", oracle=_INTERSECT_ORACLE, tags=("setop",))
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers who bought in both 1996 and 1997."""
    (orders,) = load(spark, sf_dir, "orders")
    y96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.intersect(y97)


_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
"""


@register("set_except", oracle=_EXCEPT_ORACLE, tags=("setop",))
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customer keys minus big-order buyer keys."""
    cust, orders = load(spark, sf_dir, "customer", "orders")
    buyers = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return cust.select("c_custkey").exceptAll(buyers).distinct()


_UNION_ORACLE = """
SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity >= 45
UNION
SELECT p_partkey AS partkey FROM part WHERE p_retailprice > 1800
"""


@register("set_union_distinct", oracle=_UNION_ORACLE, tags=("setop",))
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key projections — the multi-URI union-load
    shape of the reference (all page files into one table, reference
    src/utils/bigquery_helper.py:124-128) plus dedup."""
    li, part = load(spark, sf_dir, "lineitem", "part")
    a = li.filter(F.col("l_quantity") >= 45).select(F.col("l_partkey").alias("partkey"))
    b = part.filter(F.col("p_retailprice") > 1800).select(F.col("p_partkey").alias("partkey"))
    return a.unionByName(b).distinct()


_DISTINCT_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


@register("set_distinct", oracle=_DISTINCT_ORACLE, tags=("setop", "distinct"))
def set_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT over two columns (hash aggregate, no payload)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register("topk_orders", oracle=_TOPK_ORACLE, tags=("sort", "topk"))
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price (TakeOrderedAndProject: per-partition heaps,
    k rows per partition to the driver merge — no global sort at any sf).
    o_orderkey tiebreak makes the cut deterministic across engines."""
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )
