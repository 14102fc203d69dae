"""Join suite — SURVEY.md §2.4 (J1-J4).

The reference executes no joins itself but lands dimension + fact endpoints
into one dataset expressly for joint analysis (reference src/main.py:324,
328-341), and its message_history table exists for campaign-attribution
joins against customers (reference src/utils/bigquery_helper.py:63,67,68).

Scale notes per query are inline; the global stance: fixed-size dims
(region, nation) are force-broadcast (J1's credential lookup-join shape),
growing-with-sf tables stay on size-based planner choice + AQE, as-of joins
avoid the naive join-then-filter-then-rank shuffle blowup by using a single
union+window pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import dsum, sql_dsum
from ..operators.joins import salted_join
from ..tables import load
from . import register

_Q3_ORACLE = f"""
SELECT
  l_orderkey,
  o_orderdate,
  o_orderpriority,
  {sql_dsum('l_extendedprice * (1 - l_discount)', 4, 'revenue')}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
"""


@register("join_q3_shipping", oracle=_Q3_ORACLE, tags=("join", "agg"))
def join_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: filtered 3-table star join + grouped revenue.

    Filters are applied before the joins (Catalyst pushes them below the
    join anyway; writing them early keeps the intent explicit). customer and
    orders shrink through their filters, lineitem joins on the shuffle key
    l_orderkey = o_orderkey; AQE picks broadcast for the filtered customer
    side when it fits.
    """
    cust, orders, li = load(spark, sf_dir, "customer", "orders", "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(disc_price, 4).alias("revenue"))
    )


_Q5_ORACLE = f"""
SELECT
  n_name,
  {sql_dsum('l_extendedprice * (1 - l_discount)', 4, 'revenue')}
FROM customer
JOIN orders   ON c_custkey   = o_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN supplier ON l_suppkey   = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@register("join_q5_region_revenue", oracle=_Q5_ORACLE, tags=("join", "agg"))
def join_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: 6-table star join with a local-supplier constraint.

    region/nation are fixed-size -> explicit broadcast() so the big fact
    path never shuffles for them regardless of planner statistics; the
    c_nationkey = s_nationkey constraint rides the supplier equi-join.
    """
    cust, orders, li, supp, nation, region = load(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # r13 (guide §3.2): the ASIA restriction used to land only at the LAST
    # broadcast join, so the whole cust->orders->lineitem->supplier chain
    # carried every region's rows (~5x the surviving volume). The inner-join
    # conjunction c_nationkey = s_nationkey = n_nationkey (+ r_name filter)
    # lets the region constraint commute to the leaves: broadcast-semi-join
    # customer AND supplier on the ASIA nation keys FIRST (a ~25-row
    # broadcast), so every downstream shuffle moves only rows that can
    # survive. Pure pre-filter — the retained join chain is unchanged, so
    # the result is identical.
    asia_keys = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    cust_asia = cust.join(
        F.broadcast(asia_keys), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    supp_asia = supp.join(
        F.broadcast(asia_keys), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    return (
        cust_asia.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp_asia,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(disc_price, 4).alias("revenue"))
    )


_BCAST_ORACLE = f"""
SELECT
  r_name,
  n_name,
  COUNT(*) AS n_customers,
  {sql_dsum('c_acctbal', 2, 'sum_bal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


@register("join_broadcast_dim", oracle=_BCAST_ORACLE, tags=("join", "broadcast"))
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny-dim lookup join, force-broadcast — the Spark form of the
    reference's per-tenant config fan-out (Firestore doc joined against all
    fetched data, reference src/utils/firestore_helper.py:8-28 +
    src/main.py:306-310). Zero shuffle on the fact side."""
    cust, nation, region = load(spark, sf_dir, "customer", "nation", "region")
    dim = nation.join(region, F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        cust.join(F.broadcast(dim), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", 2).alias("sum_bal"),
        )
    )


_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


@register("join_semi", oracle=_SEMI_ORACLE, tags=("join", "semi"))
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers having at least one big order. Semi joins
    ship only the join key of the right side — no payload shuffle."""
    cust, orders = load(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 400000)
    return cust.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


@register("join_anti", oracle=_ANTI_ORACLE, tags=("join", "anti"))
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no large order — the "customers never
    messaged" query shape implied by the reference's campaign tables
    (SURVEY §2.4 J4). The >300k threshold keeps the anti set non-empty at
    every fixture sf so the oracle check exercises real rows."""
    cust, orders = load(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 300000)
    return cust.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


_OUTER_ORACLE = f"""
SELECT
  c_custkey,
  c_mktsegment,
  COUNT(o_orderkey) AS n_orders,
  {sql_dsum('COALESCE(o_totalprice, 0)', 2, 'total_spend')}
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


@register("join_left_outer_agg", oracle=_OUTER_ORACLE, tags=("join", "outer"))
def join_left_outer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + per-customer aggregate keeping zero-order rows."""
    cust, orders = load(spark, sf_dir, "customer", "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


_FULL_ORACLE = """
WITH clicks AS (
  SELECT CAST(ts AS DATE) AS ds, COUNT(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY ds
),
purchases AS (
  SELECT CAST(ts AS DATE) AS ds, COUNT(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY ds
)
SELECT
  COALESCE(clicks.ds, purchases.ds) AS ds,
  COALESCE(n_clicks, 0)             AS n_clicks,
  COALESCE(n_purchases, 0)          AS n_purchases
FROM clicks
FULL OUTER JOIN purchases ON clicks.ds = purchases.ds
"""


@register("join_full_outer", oracle=_FULL_ORACLE, tags=("join", "outer"))
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two daily aggregates (click vs purchase days)."""
    (events,) = load(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy(F.to_date("ts").alias("c_ds"))
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purch = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("p_ds"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return (
        clicks.join(purch, F.col("c_ds") == F.col("p_ds"), "full_outer")
        .select(
            F.coalesce(F.col("c_ds"), F.col("p_ds")).alias("ds"),
            F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
            F.coalesce(F.col("n_purchases"), F.lit(0)).alias("n_purchases"),
        )
    )


_ASOF_ORACLE = """
SELECT
  p.event_id  AS purchase_id,
  p.user_id   AS user_id,
  p.ts        AS purchase_ts,
  v.event_id  AS view_id,
  v.ts        AS view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


@register("join_asof_attribution", oracle=_ASOF_ORACLE, tags=("join", "asof"))
def join_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: attribute each purchase to the latest view at-or-before it
    by the same user — the campaign-attribution join implied by the
    reference's message_history (sent_at vs purchase time, reference
    src/utils/bigquery_helper.py:63,67,68).

    Spark has no native as-of join; the naive form (equi-join on user +
    range filter + rank) explodes to O(views x purchases) per user. This
    implementation is the scalable single-pass form: union both sides,
    one window sorted by (user, ts), carry the last non-null view forward.
    One shuffle on user_id, linear work per row — survives 100 TB.
    """
    (events,) = load(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts"),
        F.lit(0).alias("is_purchase"),
        F.col("event_id"),
        F.col("event_id").alias("v_id"),
        F.col("ts").alias("v_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.lit(1).alias("is_purchase"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("v_id"),
        F.lit(None).cast("timestamp").alias("v_ts"),
    )
    # views sort before purchases at equal ts (is_purchase asc) => "<=" semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = views.unionByName(purchases).select(
        "user_id",
        "ts",
        "is_purchase",
        "event_id",
        F.last("v_id", ignorenulls=True).over(w).alias("view_id"),
        F.last("v_ts", ignorenulls=True).over(w).alias("view_ts"),
    )
    return merged.filter(F.col("is_purchase") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "view_id",
        "view_ts",
    )


_Q7_ORACLE = f"""
SELECT
  cn.n_name AS cust_nation,
  sn.n_name AS supp_nation,
  CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
  {sql_dsum('l_extendedprice * (1 - l_discount)', 4, 'volume')}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name IN ('NATION_3', 'NATION_7')
  AND sn.n_name IN ('NATION_3', 'NATION_7')
  AND cn.n_name <> sn.n_name
GROUP BY cust_nation, supp_nation, ship_year
"""


@register("join_q7_nation_volume", oracle=_Q7_ORACLE, tags=("join", "agg"))
def join_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: cross-nation trade volume by year (fixture nations
    NATION_3/NATION_7 standing in for the FRANCE/GERMANY pair) — the nation dim
    joins TWICE under different roles (self-aliased broadcast), plus year
    extraction as a derived group key."""
    li, orders, cust, supp, nation = load(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    pair = ["NATION_3", "NATION_7"]
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(pair))
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(pair))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(dsum(disc_price, 4).alias("volume"))
    )


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("join_q4_priority", oracle=_Q4_ORACLE, tags=("join", "semi", "agg"))
def join_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: order counts by priority where some lineitem shipped
    after the order date (EXISTS -> left-semi with a non-equi residual)."""
    orders, li = load(spark, sf_dir, "orders", "lineitem")
    window = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    return (
        window.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q10_ORACLE = f"""
SELECT c_custkey, c_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 4, 'revenue')}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("join_q10_returned", oracle=_Q10_ORACLE, tags=("join", "agg", "topk"))
def join_q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: top-20 customers by returned-item revenue.
    ORDER BY on the exact-quantized revenue (deterministic double both
    engines) with custkey tiebreak -> the LIMIT cut is stable."""
    cust, orders, li = load(spark, sf_dir, "customer", "orders", "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .groupBy("c_custkey", "c_name")
        .agg(dsum(disc_price, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q12_ORACLE = """
SELECT
  l_linestatus,
  COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
  COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""


@register("join_q12_priority_class", oracle=_Q12_ORACLE, tags=("join", "agg"))
def join_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog: join + conditional counts bucketing order priority
    into high/low classes."""
    orders, li = load(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


_Q14_ORACLE = """
WITH j AS (
  SELECT
    p_type,
    CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT) AS rev_q
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
)
SELECT
  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_q ELSE 0 END) AS DOUBLE)
    / CAST(SUM(rev_q) AS DOUBLE) * 100.0 AS promo_revenue_pct,
  CAST(SUM(rev_q) AS DOUBLE) / 10000.0   AS total_revenue
FROM j
"""


@register("join_q14_promo_share", oracle=_Q14_ORACLE, tags=("join", "agg"))
def join_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: promo revenue share — a ratio of two exact integer
    sums (one division of identical operands on both engines, bit-exact)."""
    li, part = load(spark, sf_dir, "lineitem", "part")
    rev_q = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000.0
    ).cast("long")
    j = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("p_type", rev_q.alias("rev_q"))
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_q")).otherwise(F.lit(0)))
    total = F.sum("rev_q")
    return j.agg(
        (promo.cast("double") / total.cast("double") * F.lit(100.0)).alias(
            "promo_revenue_pct"
        ),
        (total.cast("double") / F.lit(10000.0)).alias("total_revenue"),
    )


_Q19_ORACLE = """
SELECT COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 30)
"""


@register("join_q19_disjunctive", oracle=_Q19_ORACLE, tags=("join", "filter"))
def join_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog: disjunctive multi-attribute predicates across both
    join sides — the OR-of-ANDs shape that exercises Catalyst's predicate
    normalization (common join-key conjunct extraction)."""
    li, part = load(spark, sf_dir, "lineitem", "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 10)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(10, 30)
            & (F.col("l_quantity") >= 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(20, 50)
            & (F.col("l_quantity") >= 30)
        )
    )
    rev_q = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000.0
    ).cast("long")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(rev_q).cast("double") / F.lit(10000.0)).alias("revenue"),
        )
    )


_BANDED_ORACLE = """
WITH bands(band, lo, hi) AS (
  VALUES ('small', 0, 15), ('medium', 15, 35), ('large', 35, 1000000)
)
SELECT
  band,
  COUNT(*) AS n_parts,
  CAST(SUM(CAST(ROUND(p_retailprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
FROM part
JOIN bands ON p_size >= lo AND p_size < hi
GROUP BY band
"""


@register("join_range_banded", oracle=_BANDED_ORACLE, tags=("join", "range"))
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/interval) join: parts into size bands. The band table
    is a literal -> broadcast nested-loop join with a trivially small inner
    side; the general range-join-at-scale path (bucketize the range key so
    it becomes equi + residual) is operators/joins.py:range_join_bucketed."""
    (part,) = load(spark, sf_dir, "part")
    bands = part.sparkSession.createDataFrame(
        [("small", 0, 15), ("medium", 15, 35), ("large", 35, 1_000_000)],
        "band string, lo int, hi int",
    )
    return (
        part.join(
            F.broadcast(bands),
            (F.col("p_size") >= F.col("lo")) & (F.col("p_size") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice", 2).alias("sum_price"),
        )
    )


_Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@register("join_q13_order_distribution", oracle=_Q13_ORACLE, tags=("join", "agg"))
def join_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog: customer order-count distribution through a LEFT
    join with a residual predicate ON the join (not a WHERE — customers
    with only urgent orders must survive with count 0), then a second
    aggregation over the counts. Two shuffles, both unavoidable (custkey,
    then c_count); the second one is tiny (distinct counts)."""
    cust, orders = load(spark, sf_dir, "customer", "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q17_ORACLE = f"""
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4'),
li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN bp ON p_partkey = l_partkey
),
st AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM li GROUP BY l_partkey
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_small_lines,
  {sql_dsum('li.l_extendedprice', 2, 'revenue')}
FROM li JOIN st ON li.l_partkey = st.l_partkey
WHERE 2 * CAST(li.l_quantity AS BIGINT) * st.cnt < st.sum_q
"""


@register("join_q17_small_quantity", oracle=_Q17_ORACLE, tags=("join", "subquery"))
def join_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog: lines whose quantity is below half the part's own
    average — the correlated-aggregate join shape. The brand filter reduces
    part to a broadcastable key set FIRST, so the per-part average is only
    computed over the brand's lineitems (semantically identical: the
    correlated subquery is per-part). The threshold l_quantity < 0.5*avg is
    evaluated as 2*q*cnt < sum over exact integers, so the cut cannot flip
    on engine-specific float summation order."""
    li, part = load(spark, sf_dir, "lineitem", "part")
    bp = part.filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    lib = li.join(F.broadcast(bp), F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    st = lib.groupBy(F.col("l_partkey").alias("s_partkey")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_q"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        lib.join(F.broadcast(st), F.col("l_partkey") == F.col("s_partkey"))
        .filter(2 * F.col("l_quantity").cast("long") * F.col("cnt") < F.col("sum_q"))
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            dsum(F.col("l_extendedprice"), 2).alias("revenue"),
        )
    )


_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
)
SELECT c_name, o_orderkey, o_orderdate, {sql_dsum('o_totalprice', 2, 'totalprice')}, sum_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
GROUP BY c_name, o_orderkey, o_orderdate, sum_qty
"""


@register("join_q18_large_orders", oracle=_Q18_ORACLE, tags=("join", "agg"))
def join_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: orders whose total quantity exceeds 300. The
    HAVING prunes lineitem to a handful of orderkeys BEFORE touching
    orders/customer, so the expensive table collapses first and AQE can
    broadcast the survivor set into both dimension joins."""
    li, orders, cust = load(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "sum_qty")
        .agg(dsum(F.col("o_totalprice"), 2).alias("totalprice"))
        .select("c_name", "o_orderkey", "o_orderdate", "totalprice", "sum_qty")
    )


_Q22_ORACLE = f"""
WITH thresh AS (
  SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer WHERE c_acctbal > 0
)
SELECT
  c_nationkey,
  CAST(COUNT(*) AS BIGINT) AS n_custs,
  {sql_dsum('c_acctbal', 2, 'total_acctbal')}
FROM customer, thresh
WHERE CAST(ROUND(c_acctbal * 100.0) AS BIGINT) * thresh.cnt > thresh.sum_cents
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
"""


@register("join_q22_dormant_customers", oracle=_Q22_ORACLE, tags=("join", "subquery"))
def join_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: above-average-balance customers who never placed
    an urgent order — scalar subquery threshold + LEFT ANTI join, grouped
    by nation. The global average rides in as a broadcast 1-row frame; the
    comparison is cents*count > sum_cents over exact integers (no fp
    boundary). The anti join shuffles on custkey only after the balance
    filter has cut the customer side."""
    cust, orders = load(spark, sf_dir, "customer", "orders")
    cents = F.round(F.col("c_acctbal") * 100.0).cast("long")
    thresh = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("sum_cents"), F.count(F.lit(1)).alias("cnt")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(cents * F.col("cnt") > F.col("sum_cents"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum(F.col("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


_Q8_ORACLE = """
WITH j AS (
  SELECT
    year(o_orderdate) AS o_year,
    CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT) AS rev_q,
    n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT
  CAST(o_year AS BIGINT) AS o_year,
  CAST(SUM(CASE WHEN supp_nation = 'NATION_12' THEN rev_q ELSE 0 END) AS DOUBLE)
    / CAST(SUM(rev_q) AS DOUBLE) AS mkt_share
FROM j
GROUP BY o_year
"""


@register("join_q8_market_share", oracle=_Q8_ORACLE, tags=("join", "agg"))
def join_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: national market share — an 8-way star join with the
    nation dimension joined TWICE under different roles (customer's nation
    gates the market region, supplier's nation labels the revenue).

    Both nation legs and region are fixed-size -> broadcast; the part
    filter collapses that side before its fact join. The share is a ratio
    of two exact integer sums (one double division of identical operands on
    both engines). Reference parity: the multi-endpoint joint dataset the
    reference lands for exactly this kind of cross-entity share analysis
    (reference src/main.py:324-341).
    """
    li, part, supp, orders, cust, nation, region = load(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "customer",
        "nation", "region",
    )
    rev_q = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000.0
    ).cast("long")
    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(
            part.filter(F.col("p_type") == "ECONOMY").select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            rev_q.alias("rev_q"),
            "supp_nation",
        )
    )
    target = F.sum(
        F.when(F.col("supp_nation") == "NATION_12", F.col("rev_q")).otherwise(F.lit(0))
    )
    return j.groupBy("o_year").agg(
        (target.cast("double") / F.sum("rev_q").cast("double")).alias("mkt_share")
    )


_Q15_ORACLE = """
WITH revenue AS (
  SELECT
    l_suppkey AS supplier_no,
    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) AS total_q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_q AS DOUBLE) / 10000.0 AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_q = (SELECT MAX(total_q) FROM revenue)
"""


@register("join_q15_top_supplier", oracle=_Q15_ORACLE, tags=("join", "subquery"))
def join_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analog: supplier(s) achieving the quarter's maximum
    revenue — an aggregate reused against its own scalar max (the view +
    scalar-subquery shape).

    The revenue aggregate is computed ONCE: the scalar max comes from a
    global window over the already-aggregated per-supplier rows, not a
    separate agg branch — a second branch re-instantiates the subtree with
    fresh exprIds, which defeats exchange reuse and scans lineitem twice
    (measured on the executed plan: two ShuffleQueryStages over the fact
    table). The deliberate single-partition window moves only |suppliers|
    aggregated rows, not fact data. The surviving (usually single-row) top
    set is the broadcast side of the supplier join, so the supplier table
    is never shuffled. Exact integer comparison for the max-equality (no
    fp boundary tie risk).
    """
    li, supp = load(spark, sf_dir, "lineitem", "supplier")
    rev_q = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000.0
    ).cast("long")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev_q).alias("total_q"))
    )
    top = (
        revenue.withColumn("mx", F.max("total_q").over(Window.partitionBy()))
        .filter(F.col("total_q") == F.col("mx"))
        .select("supplier_no", "total_q")
    )
    return (
        supp.join(F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_q").cast("double") / F.lit(10000.0)).alias("total_revenue"),
        )
    )


_Q21_ORACLE = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders    ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1
    FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
"""


@register("join_q21_waiting_supplier", oracle=_Q21_ORACLE, tags=("join", "semi", "anti"))
def join_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog (reshaped: the fixture lacks commit/receipt dates,
    so "late" is l_shipdate > o_orderdate + 60 days): suppliers who were
    the SOLE late supplier on a finished multi-supplier order.

    The interesting shape is the same self-join pair as real Q21: an
    EXISTS (left-semi on the order with a different-supplier residual) and
    a NOT EXISTS (left-anti against the LATE subset with the same
    residual). The late set is computed ONCE and reused for both the probe
    side and the anti side; all three joins shuffle on the one natural key
    l_orderkey, so AQE coalesces them into the same exchange layout.
    """
    li, orders, supp = load(spark, sf_dir, "lineitem", "orders", "supplier")
    late = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    sole_late = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        sole_late.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


_SALTED_ORACLE = f"""
SELECT
  n_name,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  {sql_dsum('o_totalprice', 2, 'total_value')}
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@register("join_salted_skew", oracle=_SALTED_ORACLE, tags=("join", "skew"))
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join, driver-checked for semantic transparency:
    orders salted 8 ways against an 8x-replicated customer side, then the
    usual nation rollup — the result must be EXACTLY the plain join's (the
    oracle is the unsalted SQL), because salting only changes the shuffle
    layout, never the pairs.

    customer keys in orders are zipf-ish, so this is the shape you reach
    for when one hot customer floods a single shuffle partition and even
    AQE's split partitions overwhelm tasks. Cost model in
    operators/joins.py:salted_join."""
    orders, cust, nation = load(spark, sf_dir, "orders", "customer", "nation")
    joined = salted_join(
        orders.select("o_custkey", "o_totalprice"),
        cust.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey"),
        on="o_custkey",
        salt=8,
    )
    return (
        joined.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 analog (product-type profit by nation/year). The classic Q9 prices
# supply cost from partsupp, which the fixture set does not ship; the analog
# derives a pseudo supply cost as 80% of the part's retail price — same join
# topology (fact x part-filter x supplier x nation), same group grain.
# ---------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT
  n.n_name AS nation,
  CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS o_year,
  {sql_dsum('l.l_extendedprice * (1 - l.l_discount) - 0.8 * p.p_retailprice * l.l_quantity', 4, 'profit')}
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%bolt%'
GROUP BY n.n_name, CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT)
"""


@register("join_q9_product_profit", oracle=_Q9_ORACLE, tags=("join", "tpch"))
def join_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: per-nation, per-year profit on a part-name-filtered slice.
    The part filter prunes the fact via the join (AQE/bloom at scale);
    nation is force-broadcast (fixed size), part/supplier stay on the
    planner's size-based choice. One agg shuffle at (nation, year) grain.
    Profit terms are exact at 4 dp (price 2 dp x discount 2 dp; 0.8 x
    retail 2 dp x integral quantity), so the integer-quantized sum is
    order-independent."""
    li, part, supp, nation = load(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.8) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part.filter(F.col("p_name").like("%bolt%")), F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").cast("long").alias("o_year"))
        .agg(dsum(profit, 4).alias("profit"))
    )


_FEATURE_STORE_ORACLE = """
WITH spine AS (
  SELECT event_id AS spine_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
c AS (SELECT user_id, ts AS c_ts, value AS c_value FROM events WHERE event_type = 'click'),
v AS (SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'),
f1 AS (
  SELECT s.spine_id, s.user_id, s.ts, c.c_ts, c.c_value
  FROM spine s ASOF LEFT JOIN c ON s.user_id = c.user_id AND c.c_ts <= s.ts
),
f2 AS (
  SELECT f1.*, v.v_ts
  FROM f1 ASOF LEFT JOIN v ON f1.user_id = v.user_id AND v.v_ts <= f1.ts
)
SELECT
  spine_id,
  user_id,
  c_value AS last_click_value,
  CAST((epoch_us(ts) - epoch_us(c_ts)) // 1000000 AS BIGINT) AS click_age_s,
  CAST((epoch_us(ts) - epoch_us(v_ts)) // 1000000 AS BIGINT) AS view_age_s,
  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, spine_id) - 1 AS BIGINT)
    AS prior_purchases
FROM f2
"""


@register("join_feature_store_pit", oracle=_FEATURE_STORE_ORACLE, tags=("join", "asof", "curation"))
def join_feature_store_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store point-in-time assembly: for every label row (purchase
    spine), attach features AS OF the label timestamp with zero leakage —
    last click value + its staleness, last view staleness, and the user's
    strictly-prior purchase count. This is THE training-set construction
    join: every feature value is provably computable at prediction time.

    Scale shape: each as-of feature rides the audited union+window
    ``asof_join`` (one shuffle on user_id, linear carry — never the
    O(events x labels) join+rank form), composed twice; the prior-count is
    a rank window sharing the same user partitioning; staleness math is
    integer microseconds div to seconds, identical in both engines. The
    whole assembly is three user-keyed window passes, no fact-table
    re-scan per feature."""
    from ..operators.joins import asof_join

    (ev,) = load(spark, sf_dir, "events")
    spine = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("spine_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("ts").alias("v_ts")
    )
    f1 = asof_join(
        spine, clicks, on="user_id", left_time="ts", right_time="ts",
        right_value_cols=["c_ts", "c_value"],
    )
    f2 = asof_join(
        f1, views, on="user_id", left_time="ts", right_time="ts",
        right_value_cols=["v_ts"],
    )
    w = Window.partitionBy("user_id").orderBy("ts", "spine_id")
    return f2.select(
        "spine_id",
        "user_id",
        F.col("c_value").alias("last_click_value"),
        F.expr("CAST((unix_micros(ts) - unix_micros(c_ts)) div 1000000 AS BIGINT)").alias("click_age_s"),
        F.expr("CAST((unix_micros(ts) - unix_micros(v_ts)) div 1000000 AS BIGINT)").alias("view_age_s"),
        (F.row_number().over(w) - 1).cast("long").alias("prior_purchases"),
    )


# TPC-H Q2 shape (r6; VERDICT r5 task 7): min-cost-supplier — the classic
# correlated-scalar-min star join — over a SYNTHESIZED partsupp, since the
# fixture ships none. The pseudo-partsupp follows dbgen's own association
# rule (each part offered by 4 suppliers at keys
# ((p_partkey + i*(S/4 + (p_partkey-1)/S)) % S) + 1, i in 0..3 — the
# public TPC-H spec's partsupp generator), with a deterministic integer
# supply cost (p_partkey*7 + s_suppkey*13) % 100000 + 100 cents — the Q9
# pseudo-cost precedent. Everything is a pure function of (part, supplier
# count), so both engines derive the identical table.
_Q2_ORACLE = """
WITH sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM supplier),
ps AS (
  SELECT p.p_partkey, p.p_brand,
    ((p.p_partkey + i * (sc.s // 4 + (p.p_partkey - 1) // sc.s)) % sc.s) + 1
      AS ps_suppkey
  FROM part p CROSS JOIN sc CROSS JOIN UNNEST(RANGE(0, 4)) AS t(i)
  WHERE p.p_type = 'ECONOMY' AND p.p_size <= 10
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
offers AS (
  SELECT ps.p_partkey, ps.p_brand, eu.s_name, eu.s_acctbal, eu.n_name,
    CAST((ps.p_partkey * 7 + ps.ps_suppkey * 13) % 100000 + 100 AS BIGINT)
      AS cost_cents
  FROM ps JOIN eu ON eu.s_suppkey = ps.ps_suppkey
),
best AS (
  SELECT *, MIN(cost_cents) OVER (PARTITION BY p_partkey) AS min_cost
  FROM offers
)
SELECT p_partkey, p_brand, n_name, s_name,
  ROUND(s_acctbal, 2) AS s_acctbal_r, cost_cents
FROM best WHERE cost_cents = min_cost
ORDER BY s_acctbal_r DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register("join_q2_min_cost_supplier", oracle=_Q2_ORACLE, tags=("join", "tpch"))
def join_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog: for the ECONOMY small parts, the EUROPE supplier(s)
    offering the minimum supply cost — the correlated-min star-schema shape
    (the one classic TPC-H join family previously absent: the min is per
    part over only the region-qualified offers, then the offer must equal
    it). partsupp is synthesized in-query by dbgen's public association
    rule + a deterministic integer cost (see _Q2_ORACLE note), so the
    query is a pure function of the fixture.

    Scale shape: part is filtered before the 4-way offer explode (linear);
    the region-qualified supplier dim is dim-sized and BROADCASTS into the
    offer stream; the correlated min is a frame-less window over
    p_partkey partitions (one hash shuffle, no sort — never a global
    window); the final top-100 plans as TakeOrderedAndProject. At 100 TB
    the only data-sized exchange is the p_partkey hash — exactly the
    textbook Q2 plan."""
    part, supplier, nation, region = load(spark, sf_dir, "part", "supplier", "nation", "region")
    s_count = supplier.agg(F.count(F.lit(1)).cast("long").alias("s"))
    ps = (
        part.where((F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 10))
        .crossJoin(F.broadcast(s_count))
        .select(
            "p_partkey",
            "p_brand",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
            "s",
        )
        .select(
            "p_partkey",
            "p_brand",
            F.expr(
                "((p_partkey + i * (s div 4 + (p_partkey - 1) div s)) % s) + 1"
            ).alias("ps_suppkey"),
        )
    )
    eu = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = ps.join(
        F.broadcast(eu), F.col("s_suppkey") == F.col("ps_suppkey")
    ).select(
        "p_partkey",
        "p_brand",
        "s_name",
        "s_acctbal",
        "n_name",
        F.expr(
            "CAST((p_partkey * 7 + ps_suppkey * 13) % 100000 + 100 AS BIGINT)"
        ).alias("cost_cents"),
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("min_cost", F.min("cost_cents").over(w))
        .where(F.col("cost_cents") == F.col("min_cost"))
        .select(
            "p_partkey",
            "p_brand",
            "n_name",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal_r"),
            "cost_cents",
        )
        .orderBy(F.desc("s_acctbal_r"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def _pseudo_partsupp(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """The synthesized partsupp bridge shared by the Q2/Q11/Q16 analogs:
    dbgen's public association rule (4 suppliers per part at
    ((p_partkey + i*(S/4 + (p_partkey-1)/S)) % S) + 1), a deterministic
    integer supply cost ((p_partkey*7 + suppkey*13) % 100000 + 100 cents)
    and availability ((p_partkey*11 + suppkey*17) % 9999 + 1) — a pure
    function of (part, |supplier|), so the DuckDB oracles derive the
    identical table from the same CTE (``_PS_SQL``)."""
    s_count = supplier.agg(F.count(F.lit(1)).cast("long").alias("s"))
    return (
        part.crossJoin(F.broadcast(s_count))
        .select(
            "p_partkey", "p_brand", "p_type", "p_size",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"), "s",
        )
        .select(
            "p_partkey", "p_brand", "p_type", "p_size",
            F.expr(
                "((p_partkey + i * (s div 4 + (p_partkey - 1) div s)) % s) + 1"
            ).alias("ps_suppkey"),
        )
        .select(
            "*",
            F.expr(
                "CAST((p_partkey * 7 + ps_suppkey * 13) % 100000 + 100 AS BIGINT)"
            ).alias("ps_cost_cents"),
            F.expr(
                "CAST((p_partkey * 11 + ps_suppkey * 17) % 9999 + 1 AS BIGINT)"
            ).alias("ps_availqty"),
        )
    )


_PS_SQL = """
sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM supplier),
pseudo_ps AS (
  SELECT p.p_partkey, p.p_brand, p.p_type, p.p_size,
    ((p.p_partkey + i * (sc.s // 4 + (p.p_partkey - 1) // sc.s)) % sc.s) + 1
      AS ps_suppkey,
    CAST((p.p_partkey * 7
          + (((p.p_partkey + i * (sc.s // 4 + (p.p_partkey - 1) // sc.s)) % sc.s) + 1) * 13
         ) % 100000 + 100 AS BIGINT) AS ps_cost_cents,
    CAST((p.p_partkey * 11
          + (((p.p_partkey + i * (sc.s // 4 + (p.p_partkey - 1) // sc.s)) % sc.s) + 1) * 17
         ) % 9999 + 1 AS BIGINT) AS ps_availqty
  FROM part p CROSS JOIN sc CROSS JOIN UNNEST(RANGE(0, 4)) AS t(i)
)
"""


_Q16_ORACLE = f"""
WITH {_PS_SQL.strip()},
ok_supp AS (
  SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0
)
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
  CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
FROM pseudo_ps ps
JOIN ok_supp s ON s.s_suppkey = ps.ps_suppkey
WHERE ps.p_type <> 'ECONOMY' AND ps.p_size <= 8
GROUP BY p_brand, p_type, p_size
"""


@register("join_q16_supplier_variety", oracle=_Q16_ORACLE, tags=("join", "tpch"))
def join_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many DISTINCT qualified suppliers can source
    each (brand, type, size) part family — supplier-diversity sourcing
    analytics. The classic pieces: a bridge-table distinct-count rollup
    plus an exclusion anti-join (here: suppliers in deficit, the fixture's
    analog of dbgen's 'Customer Complaints' comment filter), over the
    synthesized partsupp (``_pseudo_partsupp``).

    Scale shape: part filters apply before the 4-way offer explode; the
    exclusion list is dim-sized and broadcast (semi-join form); the only
    data-sized exchange is the (brand, type, size, suppkey) distinct-agg
    hash — Spark plans partial distinct map-side. No window, no sort."""
    part, supplier = load(spark, sf_dir, "part", "supplier")
    ps = _pseudo_partsupp(
        part.where((F.col("p_type") != "ECONOMY") & (F.col("p_size") <= 8)),
        supplier,
    )
    ok = supplier.where(F.col("s_acctbal") >= 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(ok), F.col("s_suppkey") == F.col("ps_suppkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
    )


_Q11_ORACLE = f"""
WITH {_PS_SQL.strip()},
eu AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
stock AS (
  SELECT ps.p_partkey,
    CAST(SUM(ps.ps_cost_cents * ps.ps_availqty) AS BIGINT) AS value_cents
  FROM pseudo_ps ps JOIN eu ON eu.s_suppkey = ps.ps_suppkey
  GROUP BY ps.p_partkey
),
tot AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total FROM stock)
SELECT p_partkey, value_cents
FROM stock CROSS JOIN tot
WHERE value_cents * 1000 > total
"""


@register("join_q11_important_stock", oracle=_Q11_ORACLE, tags=("join", "tpch"))
def join_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose EUROPE-held inventory value exceeds
    0.1% of the total — the correlated-scalar HAVING over a grouped
    bridge-table rollup (the 'important stock' concentration screen).
    Inventory value is exact integer cents x integral quantity from the
    synthesized partsupp, and the threshold compare is integer
    (value * 1000 > total), so the result is hash-exact.

    Scale shape: the region-qualified supplier list broadcasts; the only
    data-sized exchange is the p_partkey value rollup (map-side
    combinable); the grand total is a 1-row broadcast back into the
    part-grain stream — never a second scan."""
    part, supplier, nation, region = load(spark, sf_dir, "part", "supplier", "nation", "region")
    eu = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey")
    )
    stock = (
        _pseudo_partsupp(part, supplier)
        .join(F.broadcast(eu), F.col("s_suppkey") == F.col("ps_suppkey"))
        .groupBy("p_partkey")
        .agg(F.sum(F.col("ps_cost_cents") * F.col("ps_availqty")).cast("long").alias("value_cents"))
    )
    tot = stock.agg(F.sum("value_cents").cast("long").alias("total"))
    return (
        stock.crossJoin(F.broadcast(tot))
        .where(F.col("value_cents") * 1000 > F.col("total"))
        .select("p_partkey", "value_cents")
    )


_Q20_ORACLE = f"""
WITH {_PS_SQL.strip()},
shipped AS (
  SELECT l_partkey, l_suppkey,
    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s_suppkey, s_name, n_name FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT eu.s_suppkey, eu.s_name, eu.n_name,
  CAST(COUNT(DISTINCT ps.p_partkey) AS BIGINT) AS n_parts
FROM pseudo_ps ps
JOIN shipped sh ON sh.l_partkey = ps.p_partkey AND sh.l_suppkey = ps.ps_suppkey
JOIN eu ON eu.s_suppkey = ps.ps_suppkey
WHERE ps.p_type = 'PROMO' AND 2 * ps.ps_availqty > sh.qty
GROUP BY eu.s_suppkey, eu.s_name, eu.n_name
"""


@register("join_q20_potential_promotion", oracle=_Q20_ORACLE, tags=("join", "tpch"))
def join_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (the last number in the 22-query analog family):
    EUROPE suppliers holding EXCESS stock of promotion-type parts — the
    supplier qualifies through a nested semi-join where the bridge row's
    availability must exceed half the quantity that (part, supplier)
    actually shipped in 1997 (Q20's correlated scalar subquery, expressed
    as a pre-aggregated equi-join; pairs with no 1997 shipments drop out,
    matching the NULL-comparison semantics of the original). Stock depth
    per supplier rides along as the distinct qualifying-part count.

    Scale shape: part is filtered to PROMO before the 4-way bridge
    explode (linear); the 1997 shipment rollup is the one data-sized
    shuffle (map-side combinable sum on (partkey, suppkey)); the bridge
    x shipped join is an equi-join on that same composite key; the
    region-qualified supplier dim BROADCASTS; quantities compare as
    integers (2 * availqty > qty) so the screen is hash-exact."""
    part, supplier, nation, region, lineitem = load(
        spark, sf_dir, "part", "supplier", "nation", "region", "lineitem"
    )
    ps = _pseudo_partsupp(part.where(F.col("p_type") == "PROMO"), supplier)
    shipped = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    )
    eu = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        ps.join(
            shipped,
            (F.col("p_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(2 * F.col("ps_availqty") > F.col("qty"))
        .join(F.broadcast(eu), F.col("s_suppkey") == F.col("ps_suppkey"))
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(F.countDistinct("p_partkey").cast("long").alias("n_parts"))
    )
