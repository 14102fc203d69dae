"""Aggregation suite — SURVEY.md §2.3 (A5/A6) and the flagship daily rollup.

The reference delegates all analytics to BigQuery (it builds day-partitioned,
clustered tables expressly for these group-bys — reference
src/utils/bigquery_helper.py:88-92); here they are native Spark plans.

Scale notes: every query below is a scan -> partial hash agg -> shuffle on
the group keys -> final hash agg. Spark does map-side combine automatically;
low-cardinality group keys (returnflag x linestatus = 6 groups) mean the
shuffle moves only partial aggregates, not rows — this is the plan shape
that survives 100 TB. Filters are expressed on scan columns so they push
into the parquet reader (PushedFilters). Money aggregation uses the exact
integer-quantized scheme from functions.exact (order-independent, no fp
drift across cluster topologies).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import davg, dsum, sql_davg, sql_dsum
from ..tables import load
from . import register

# disc_price is a product of 2-dp decimals -> exact at 4 dp; charge at 6 dp.
_DISC_PRICE = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity', 0, 'sum_qty')},
  {sql_dsum('l_extendedprice', 2, 'sum_base_price')},
  {sql_dsum(_DISC_PRICE, 4, 'sum_disc_price')},
  {sql_dsum(_CHARGE, 6, 'sum_charge')},
  {sql_davg('l_quantity', 0, 'avg_qty')},
  {sql_davg('l_extendedprice', 2, 'avg_price')},
  {sql_davg('l_discount', 2, 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, tags=("agg",))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: grouped sums/avgs/count over filtered lineitem."""
    (li,) = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 0).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity", 0).alias("avg_qty"),
            davg("l_extendedprice", 2).alias("avg_price"),
            davg("l_discount", 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q6_ORACLE = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 4, 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE, tags=("agg", "filter"))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: tight multi-predicate filter + single global sum.

    All four predicates sit on scan columns -> parquet PushedFilters; the
    aggregate is a single partial+final sum (one scalar crosses the wire per
    partition).
    """
    (li,) = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))


_DAILY_ORACLE = f"""
SELECT
  CAST(l_shipdate AS DATE) AS ds,
  l_returnflag,
  {sql_dsum(_DISC_PRICE, 4, 'revenue')},
  COUNT(*) AS n_items
FROM lineitem
GROUP BY ds, l_returnflag
"""


@register("daily_revenue", oracle=_DAILY_ORACLE, tags=("agg", "time"))
def daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: tumbling-day revenue rollup — the Spark analog of the
    reference's day-partitioned ``vendas`` pipeline (daily slices at
    reference src/config/endpoints.py:19-34; day-partitioned warehouse table
    at src/utils/bigquery_helper.py:88-91).

    Day truncation via ``to_date`` keeps the group key a 4-byte date —
    a narrow shuffle key at any scale.
    """
    (li,) = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy(F.to_date("l_shipdate").alias("ds"), "l_returnflag").agg(
        dsum(disc_price, 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_SEGMENT_ORACLE = f"""
SELECT
  c_mktsegment,
  COUNT(*) AS n_customers,
  CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
  {sql_dsum('c_acctbal', 2, 'sum_bal')},
  {sql_davg('c_acctbal', 2, 'avg_bal')},
  MIN(c_acctbal) AS min_bal,
  MAX(c_acctbal) AS max_bal
FROM customer
GROUP BY c_mktsegment
"""


@register("agg_stats_by_segment", oracle=_SEGMENT_ORACLE, tags=("agg",))
def agg_stats_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scalar-agg suite incl. exact COUNT DISTINCT. MIN/MAX pass raw
    column values through untouched (no arithmetic -> no fp concerns)."""
    (cust,) = load(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        dsum("c_acctbal", 2).alias("sum_bal"),
        davg("c_acctbal", 2).alias("avg_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


_ROLLUP_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  COUNT(*) AS n,
  {sql_dsum('l_quantity', 0, 'sum_qty')}
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("agg_rollup", oracle=_ROLLUP_ORACLE, tags=("agg", "rollup"))
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (Expand operator -> one shuffle, all levels)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity", 0).alias("sum_qty"),
    )


_CUBE_ORACLE = f"""
SELECT
  o_orderstatus,
  o_orderpriority,
  COUNT(*) AS n,
  {sql_dsum('o_totalprice', 2, 'sum_price')}
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("agg_cube", oracle=_CUBE_ORACLE, tags=("agg", "cube"))
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two keys — all 2^2 grouping combinations in one pass."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice", 2).alias("sum_price"),
    )


_GSETS_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


@register("agg_grouping_sets", oracle=_GSETS_ORACLE, tags=("agg",))
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same Expand plan as rollup)."""
    (li,) = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


_GROUPINGID_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(GROUPING(l_returnflag) AS BIGINT)  AS g_flag,
  CAST(GROUPING(l_linestatus) AS BIGINT)  AS g_status,
  COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("agg_grouping_id", oracle=_GROUPINGID_ORACLE, tags=("agg", "rollup"))
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicator columns distinguishing real NULL group keys from
    rollup subtotal rows."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
    )


_HAVING_ORACLE = f"""
SELECT
  l_suppkey,
  COUNT(*) AS n_items,
  {sql_dsum('l_quantity', 0, 'sum_qty')}
FROM lineitem
GROUP BY l_suppkey
HAVING COUNT(*) > 50
"""


@register("agg_having", oracle=_HAVING_ORACLE, tags=("agg", "filter"))
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation HAVING filter."""
    (li,) = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity", 0).alias("sum_qty"),
        )
        .filter(F.col("n_items") > 50)
    )


_CONDAGG_ORACLE = f"""
SELECT
  l_returnflag,
  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_high_disc,
  {sql_dsum('CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0 END', 2, 'taxed_price')},
  {sql_davg('CASE WHEN l_quantity >= 25 THEN l_extendedprice END', 2, 'avg_bulk_price')}
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_conditional", oracle=_CONDAGG_ORACLE, tags=("agg",))
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER / CASE WHEN inside agg) — the funnel
    pattern the reference's message_history table exists for (delivery/read
    rates per campaign, reference src/utils/bigquery_helper.py:61-83)."""
    (li,) = load(spark, sf_dir, "lineitem")
    taxed = F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(F.lit(0.0))
    bulk = F.when(F.col("l_quantity") >= 25, F.col("l_extendedprice"))
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_high_disc"),
        dsum(taxed, 2).alias("taxed_price"),
        davg(bulk, 2).alias("avg_bulk_price"),
    )


_DISTINCT_ORACLE = """
SELECT
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT)  AS n_parts,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)  AS n_supps,
  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
"""


@register("agg_count_distinct", oracle=_DISTINCT_ORACLE, tags=("agg", "distinct"))
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact COUNT DISTINCTs in one aggregate (Expand-based)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


# Count-Min sketch (Cormode-Muthukrishnan) with DETERMINISTIC md5-derived
# row hashes — same stance as the KMV/HLL entries: the sketch fold and the
# point estimates are pure functions of the data, so DuckDB reproduces the
# counters and estimates bit-for-bit.
_CMS_DEPTH = 4
_CMS_WIDTH = 64

_CMS_ORACLE = f"""
WITH ev AS (SELECT event_type FROM events),
fold AS (
  SELECT r.r AS r,
    CAST(CAST(concat('0x', substr(md5(concat('cms', CAST(r.r AS VARCHAR), ':', ev.event_type)), 1, 13)) AS BIGINT) % {_CMS_WIDTH} AS BIGINT) AS bucket,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ev CROSS JOIN (SELECT UNNEST(range({_CMS_DEPTH})) AS r) r
  GROUP BY 1, 2
),
keys AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_n FROM ev GROUP BY event_type
),
probes AS (
  SELECT k.event_type, k.exact_n, r.r AS r,
    CAST(CAST(concat('0x', substr(md5(concat('cms', CAST(r.r AS VARCHAR), ':', k.event_type)), 1, 13)) AS BIGINT) % {_CMS_WIDTH} AS BIGINT) AS bucket
  FROM keys k CROSS JOIN (SELECT UNNEST(range({_CMS_DEPTH})) AS r) r
)
SELECT p.event_type, p.exact_n,
  CAST(MIN(f.cnt) AS BIGINT) AS cms_n,
  CAST(10000 * (CAST(MIN(f.cnt) AS BIGINT) - p.exact_n) // p.exact_n AS BIGINT) AS overestimate_bp
FROM probes p JOIN fold f ON p.r = f.r AND p.bucket = f.bucket
GROUP BY p.event_type, p.exact_n
"""


@register("agg_cms_heavy_hitters", oracle=_CMS_ORACLE, tags=("agg", "sketch"))
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation: fold the raw event stream
    into a {_CMS_DEPTH}x{_CMS_WIDTH} counter grid (md5-derived row hashes,
    deterministic like the KMV/HLL entries), then point-estimate each
    candidate key as the MIN over its {_CMS_DEPTH} counters, reported next
    to the exact count with the overestimate in basis points.

    Scale shape: the fold never keys on the item — each event contributes
    {_CMS_DEPTH} (row, bucket) increments that partial-aggregate map-side
    into at most {_CMS_DEPTH}x{_CMS_WIDTH} = {_CMS_DEPTH * _CMS_WIDTH}
    counters, so the shuffle is CONSTANT-width at any stream volume (the
    property that makes CM the right heavy-hitter structure when exact
    per-key counts can't fit); probes join the tiny counter grid. The
    exact side here exists only to report estimation error."""
    (ev,) = load(spark, sf_dir, "events")
    d, wdt = _CMS_DEPTH, _CMS_WIDTH

    def bucket(r: F.Column, key: F.Column) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("cms"), r.cast("string"), F.lit(":"), key)),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % wdt
        )

    folded = (
        ev.select("event_type")
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            bucket(F.lit(r), F.col("event_type")).alias("bucket"),
                        )
                        for r in range(d)
                    ]
                )
            ).alias("rb")
        )
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    keys = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
    probes = keys.select(
        "event_type",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        bucket(F.lit(r), F.col("event_type")).alias("bucket"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("rb"),
    ).select("event_type", "exact_n", F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(folded), ["r", "bucket"])
        .groupBy("event_type", "exact_n")
        .agg(F.min("cnt").cast("long").alias("cms_n"))
        .select(
            "event_type",
            "exact_n",
            "cms_n",
            F.expr("CAST(10000 * (cms_n - exact_n) div exact_n AS BIGINT)").alias(
                "overestimate_bp"
            ),
        )
    )
