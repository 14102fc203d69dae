"""Window-function suite — SURVEY.md §2.5 (W1-W3).

W1 (latest-per-key dedup rank) lives in events.py/dedup.py; here are the
ranking, frame, and sequencing operators. Every ORDER BY inside a window
carries a unique tiebreak key so ranks are deterministic across engines.
Rank-family outputs are cast to long (DuckDB window functions yield BIGINT).

Scale notes: a window over partitionBy(K) is one shuffle on K; all frames
here are bounded or running (no whole-partition re-sort beyond the shuffle
sort). Skew risk concentrates on hot keys — at 100 TB the mitigation is
salting the partition key or pre-aggregating before the window; group
cardinalities here (customer, nation) are uniform by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import quant
from ..tables import load
from . import register

_RANK_ORACLE = """
SELECT
  c_custkey,
  c_nationkey,
  c_acctbal,
  CAST(RANK()       OVER w AS BIGINT) AS bal_rank,
  CAST(DENSE_RANK() OVER w AS BIGINT) AS bal_dense_rank,
  CAST(ROW_NUMBER() OVER w AS BIGINT) AS bal_row_number
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
"""


@register("window_rank", oracle=_RANK_ORACLE, tags=("window",))
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number per nation by account balance."""
    (cust,) = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        F.row_number().over(w).cast("long").alias("bal_row_number"),
    )


_NTILE_ORACLE = """
SELECT
  c_custkey,
  c_mktsegment,
  CAST(NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT)
    AS bal_quartile
FROM customer
"""


@register("window_ntile", oracle=_NTILE_ORACLE, tags=("window",))
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartiles of balance within market segment."""
    (cust,) = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
    )


_RUNNING_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  o_orderdate,
  CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
    AS running_spend
FROM orders
"""


@register("window_running_sum", oracle=_RUNNING_ORACLE, tags=("window",))
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running customer spend over order history (exact integer cents, so the
    running sum is order-exact on any engine)."""
    (orders,) = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(quant("o_totalprice", 2)).over(w).cast("double") / F.lit(100.0)).alias(
            "running_spend"
        ),
    )


_LAG_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  o_orderdate,
  CAST(DATE_DIFF('day',
       LAG(o_orderdate) OVER w,
       o_orderdate) AS BIGINT)                     AS days_since_prev,
  LEAD(o_orderkey) OVER w                          AS next_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("window_lag_lead", oracle=_LAG_ORACLE, tags=("window",))
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-to-previous-order and next-order lookahead per customer — the
    reference's retry/message sequencing shape (message_history retry_count /
    sent_at per user, reference src/utils/bigquery_helper.py:63,68,73)."""
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w)))
        .cast("long")
        .alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


_MOVAVG_ORACLE = """
WITH daily AS (
  SELECT
    CAST(l_shipdate AS DATE) AS ds,
    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) AS rev_q
  FROM lineitem
  GROUP BY ds
)
SELECT
  ds,
  CAST(rev_q AS DOUBLE) / 10000.0 AS revenue,
  CAST(SUM(rev_q) OVER w AS DOUBLE)
    / CAST(COUNT(*) OVER w AS DOUBLE) / 10000.0 AS revenue_7d_avg
FROM daily
WINDOW w AS (ORDER BY ds ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register("window_moving_avg", oracle=_MOVAVG_ORACLE, tags=("window", "time"))
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily revenue: agg-then-window. The global
    (unpartitioned) window runs over the tiny daily rollup, never the raw
    fact table — the pre-aggregation is what makes this shape scale."""
    (li,) = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    daily = li.groupBy(F.to_date("l_shipdate").alias("ds")).agg(
        F.sum(quant(disc_price, 4)).alias("rev_q")
    )
    w = Window.orderBy("ds").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "ds",
        (F.col("rev_q").cast("double") / F.lit(10000.0)).alias("revenue"),
        (
            F.sum("rev_q").over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
            / F.lit(10000.0)
        ).alias("revenue_7d_avg"),
    )


_TOPK_GROUP_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT
    o_custkey, o_orderkey, o_totalprice,
    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("window_topk_per_group", oracle=_TOPK_GROUP_ORACLE, tags=("window", "topk"))
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (rank-and-filter). Catalyst rewrites the
    rn<=3 filter into a per-partition top-k (WindowGroupLimit) — no full sort
    of each partition at scale."""
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


_RANGE_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  o_orderdate,
  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
    AS orders_last_30d
FROM orders
"""


@register("window_range_interval", oracle=_RANGE_ORACLE, tags=("window", "time"))
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a time column: orders in the trailing 30 days.
    Expressed in Spark SQL (interval range frames are SQL-only surface)."""
    (orders,) = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT
          o_custkey,
          o_orderkey,
          o_orderdate,
          COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                         RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
            AS orders_last_30d
        FROM orders
        """
    )


_PCTRANK_ORACLE = """
SELECT
  c_custkey,
  c_mktsegment,
  ROUND(PERCENT_RANK() OVER w, 6) AS bal_pct_rank,
  ROUND(CUME_DIST()    OVER w, 6) AS bal_cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


@register("window_percent_rank", oracle=_PCTRANK_ORACLE, tags=("window",))
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist: rational (rank-1)/(n-1) and rank/n values —
    identical integer-derived doubles on both engines; unique tiebreak keys
    make the ranks themselves deterministic."""
    (cust,) = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    )


_FIRSTLAST_ORACLE = """
SELECT
  c_custkey,
  c_nationkey,
  c_acctbal,
  FIRST_VALUE(c_acctbal) OVER w AS nation_top_bal,
  FIRST_VALUE(c_custkey) OVER w AS nation_top_cust
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register("window_first_value", oracle=_FIRSTLAST_ORACLE, tags=("window",))
def window_first_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value with an explicit full-partition frame."""
    (cust,) = load(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.first("c_acctbal").over(w).alias("nation_top_bal"),
        F.first("c_custkey").over(w).alias("nation_top_cust"),
    )


# Cumulative distinct count — the DAU-accretion curve ("how many unique
# users have we EVER seen, by day"). COUNT(DISTINCT) OVER a running frame
# is unsupported on both engines; the scalable identity is: flag each
# user's FIRST day (rank over user), daily-sum the flags, running-sum the
# days. Two shuffles (user grain, then day grain) regardless of history
# length — no quadratic re-scan of ever-growing windows.
_CUMDIST_ORACLE = """
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS first_day
  FROM events GROUP BY user_id
),
daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n_events
  FROM events GROUP BY day
),
new_users AS (
  SELECT first_day AS day, COUNT(*) AS n_new FROM firsts GROUP BY first_day
)
SELECT
  daily.day,
  CAST(daily.n_events AS BIGINT) AS n_events,
  CAST(COALESCE(new_users.n_new, 0) AS BIGINT) AS n_new_users,
  CAST(SUM(COALESCE(new_users.n_new, 0))
         OVER (ORDER BY daily.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS BIGINT) AS cum_distinct_users
FROM daily LEFT JOIN new_users ON daily.day = new_users.day
"""


@register("window_cumulative_distinct", oracle=_CUMDIST_ORACLE, tags=("window", "events"))
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cumulative distinct-user curve via the first-seen-flag
    identity: per-user first day -> new users per day -> running sum.

    Scale shape: turns an unsupported (and inherently quadratic)
    COUNT(DISTINCT) OVER running frame into two ordinary aggregations plus
    a running sum over |days| rows. The final running sum is a
    single-partition window over day-grain rows — thousands of rows for
    years of history, a deliberate post-aggregation driver-scale step."""
    (events,) = load(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    new_users = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.join(new_users, "day", "left")
        .select(
            "day",
            "n_events",
            F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new_users"),
        )
        .withColumn(
            "cum_distinct_users", F.sum("n_new_users").over(w).cast("long")
        )
    )
