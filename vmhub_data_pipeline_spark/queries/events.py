"""Event-stream semantics, batch-expressed — SURVEY.md §2.7 (T1-T6) and the
funnel/sequencing queries the reference's message_history table implies
(A5/W2, reference src/utils/bigquery_helper.py:61-92).

Every query here has a Structured Streaming twin in streaming/events.py;
batch expression keeps them oracle-checkable. Watermark/incremental (T1) is
the reference's max-landed-date resume (src/utils/gcs_helper.py:203-241,
src/main.py:195-209); tumbling windows (T2) are its daily fetch slices
(src/config/endpoints.py:27-34) — half-open here, a deliberate, documented
deviation from the reference's closed [00:00, 23:59:59.999999] day (SURVEY
§7 decision 1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import davg, dsum, sql_davg, sql_dsum
from ..tables import load
from . import register

_FUNNEL_ORACLE = f"""
SELECT
  event_type,
  COUNT(*) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  {sql_dsum('value', 2, 'sum_value')},
  {sql_davg('value', 2, 'avg_value')}
FROM events
GROUP BY event_type
"""


@register("events_funnel", oracle=_FUNNEL_ORACLE, tags=("events", "agg"))
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage funnel counts — the delivery/read-rate rollup the
    reference's clustering [campaign_type,status] exists for (reference
    src/utils/bigquery_helper.py:92)."""
    (events,) = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value", 2).alias("sum_value"),
        davg("value", 2).alias("avg_value"),
    )


_TUMBLING_ORACLE = f"""
SELECT
  CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
  COUNT(*) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  {sql_dsum('value', 2, 'sum_value')}
FROM events
GROUP BY window_start
"""


@register("events_tumbling_day", oracle=_TUMBLING_ORACLE, tags=("events", "time"))
def events_tumbling_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windows via Spark's native window() operator (T2).
    window() is the same group-by-derived-key plan as date_trunc — the
    operator form carries over verbatim to readStream."""
    (events,) = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "n_users",
            "sum_value",
        )
    )


_SLIDING_ORACLE = """
WITH starts AS (
  SELECT UNNEST(generate_series(TIMESTAMP '2023-12-31 00:00:00',
                                TIMESTAMP '2024-02-01 00:00:00',
                                INTERVAL 1 HOUR)) AS window_start
)
SELECT
  window_start,
  COUNT(*) AS n_events
FROM starts
JOIN events ON ts >= window_start AND ts < window_start + INTERVAL 2 HOUR
GROUP BY window_start
"""


@register("events_sliding_2h", oracle=_SLIDING_ORACLE, tags=("events", "time"))
def events_sliding_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h length, 1h slide) — each event lands in 2
    windows; Spark's window() expands rows then hash-aggregates, emitting
    only non-empty windows (the oracle's inner range join reproduces that)."""
    (events,) = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


_SESSION_ORACLE = """
WITH seq AS (
  SELECT
    user_id, ts, event_id,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
           OR LAG(epoch_us(ts)) OVER w IS NULL
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT
    user_id, ts, event_id,
    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_seq
  FROM seq
)
SELECT
  user_id,
  session_seq,
  MIN(ts)  AS session_start,
  MAX(ts)  AS session_end,
  COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_seq
"""


@register("events_sessionize", oracle=_SESSION_ORACLE, tags=("events", "session"))
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap (T6): lag-gap-cumsum.

    One shuffle on user_id serves both windows and the final group-by (same
    partitioning, Catalyst reuses the exchange). The streaming twin uses
    session_window() + watermark; this batch form is the oracle-checkable
    equivalent on a closed dataset. Gap compare in integer µs — exact.
    """
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    return (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.sum(is_new).over(run).cast("long").alias("session_seq"),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_JSON_ORACLE = f"""
SELECT
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
  COUNT(*) AS n,
  {sql_davg('value', 2, 'avg_value')}
FROM events
GROUP BY k
"""


@register("events_json_extract", oracle=_JSON_ORACLE, tags=("events", "json"))
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (P12) — the reference's
    template_variables JSON column pattern (src/utils/bigquery_helper.py:76):
    Spark stores JSON as string + get_json_object at query time."""
    (events,) = load(spark, sf_dir, "events")
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("long").alias("k"), "value"
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), davg("value", 2).alias("avg_value"))
    )


_DEDUP_ORACLE = """
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


@register("events_dedup_latest", oracle=_DEDUP_ORACLE, tags=("events", "dedup"))
def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key dedup (A4/W1) — the key-level dedup the
    reference README promises ("Deduplication ... ensures data quality",
    reference README.md:12) whose code mechanism is truncate-reload;
    row_number-over-desc is the native Spark form, and Catalyst plans the
    rn=1 filter as a WindowGroupLimit (per-partition top-1, no full sort)."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


_PIVOT_ORACLE = """
SELECT
  user_id,
  COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
  COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
  COUNT(*) FILTER (WHERE event_type = 'error')    AS error
FROM events
GROUP BY user_id
"""


@register("events_pivot", oracle=_PIVOT_ORACLE, tags=("events", "pivot"))
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT event counts per user. Explicit value list — with it, pivot is
    a single-pass conditional aggregate (no extra distinct-values job)."""
    (events,) = load(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )


_WATERMARK_ORACLE = """
SELECT
  MAX(ts) AS high_watermark,
  COUNT(*) FILTER (WHERE ts > TIMESTAMP '2024-01-15 00:00:00') AS n_after_watermark
FROM events
"""


@register("events_watermark", oracle=_WATERMARK_ORACLE, tags=("events", "watermark"))
def events_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark resume (A1/T1): high-watermark scan + incremental count —
    the reference's max-landed-date resume (src/utils/gcs_helper.py:203-241
    max at :220; resume predicate src/main.py:195-209)."""
    (events,) = load(spark, sf_dir, "events")
    return events.agg(
        F.max("ts").alias("high_watermark"),
        F.count(F.when(F.col("ts") > F.lit("2024-01-15").cast("timestamp"), 1)).alias(
            "n_after_watermark"
        ),
    )


_RETENTION_ORACLE = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
  FROM events
)
SELECT
  f.cohort_week,
  CAST(datediff('day', f.cohort_week, a.active_week) / 7 AS BIGINT) AS week_offset,
  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM first_seen f
JOIN activity a ON f.user_id = a.user_id
GROUP BY f.cohort_week, week_offset
"""


@register("events_retention_cohort", oracle=_RETENTION_ORACLE, tags=("events", "agg"))
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, counted
    in each later active week — the (cohort, offset) retention matrix.

    Shape: per-user min (one shuffle on user_id) -> distinct (user, week)
    activity (same key, AQE reuses the exchange) -> equi-join on user_id ->
    count-distinct re-agg. Both week columns are date_trunc'd to Monday, so
    the offset is an exact integer day-diff / 7 (no boundary-crossing
    semantics to disagree on between engines)."""
    (events,) = load(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# SCD2 (type-2 slowly-changing dimension) construction — the warehouse op the
# reference's truncate-reload model papers over: turn an event stream into
# effective-dated status history. Consecutive same-status events collapse
# (gaps-and-islands), each surviving change opens a range closed by the next
# change; the open range is the current row.
_SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type AS status, ts, event_id,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_status
  FROM events
),
changes AS (
  SELECT user_id, status, ts, event_id FROM ordered
  WHERE prev_status IS NULL OR prev_status <> status
)
SELECT user_id, status,
  ts AS valid_from,
  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
  (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current,
  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
FROM changes
"""


@register("events_scd2_history", oracle=_SCD2_ORACLE, tags=("events", "window", "warehouse"))
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension history from the event stream: per-user status
    ranges [valid_from, valid_to) with version numbers and an is_current
    flag — the standard SCD2 build (status-change detection via lag, range
    closing via lead), which together with join_asof_attribution gives the
    full point-in-time-lookup toolchain.

    Scale shape: both windows partition by user_id — one shuffle on the
    natural key, no global ordering anywhere; the change filter collapses
    same-status runs BEFORE the second window, so the range/version pass
    runs on the (much smaller) change set. Ties on ts break by event_id in
    every window, keeping both engines' row numbering identical."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "user_id", F.col("event_type").alias("status"), "ts", "event_id"
    ).withColumn("prev_status", F.lag("status").over(w))
    changes = ordered.filter(
        F.col("prev_status").isNull() | (F.col("prev_status") != F.col("status"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "status",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


# Spark 4 VARIANT: parse the JSON props column ONCE into the binary
# variant encoding, then navigate with typed variant_get paths — the
# engine-native successor to per-access get_json_object string re-parsing
# (each get_json_object call re-tokenizes the JSON; a variant column is
# parsed once and shredded reads are O(field)). Semantics pinned against
# the same plain-SQL JSON extraction in DuckDB.
_VARIANT_ORACLE = """
SELECT
  CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_decade,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL THEN 1 ELSE 0 END)
       AS BIGINT) AS n_missing_path,
  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events
GROUP BY 1
"""


@register("events_variant_extract", oracle=_VARIANT_ORACLE, tags=("events", "json"))
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured navigation via the Spark 4 VARIANT type: props is
    parsed once with try_parse_json (malformed rows become NULL variants,
    the PERMISSIVE contract), fields read with typed try_variant_get paths
    — including a missing-path probe that must yield NULL, not an error.

    Scale shape: at 100 TB the variant parse happens once per row in the
    scan stage and every downstream field access is a binary offset read;
    the aggregate is an ordinary map-side-combine groupBy on the derived
    decade key. The oracle is plain JSON SQL: VARIANT is an encoding
    choice, not a semantics change, and the hash match proves it."""
    (events,) = load(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.missing", "bigint")
    return (
        events.select(k.alias("k"), missing.alias("missing"))
        .withColumn("k_decade", F.expr("k div 10"))
        .groupBy("k_decade")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_missing_path"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


# CDC apply: the change-log -> latest-snapshot MERGE. The event stream is
# read as a change log (signup/view/click/purchase = upsert, error =
# delete) and folded to final per-key state: last op in (ts, event_id)
# order wins; a key whose last op is a delete leaves the snapshot. This is
# the Delta/Iceberg MERGE INTO semantics expressed as pure DataFrame ops —
# at 100 TB the apply is one keep-latest shuffle on the key, identical to
# events_dedup_latest's plan, never a row-by-row upsert loop.
_CDC_ORACLE = """
WITH ops AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN event_type = 'error' THEN 'delete' ELSE event_type END AS op,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
    COUNT(*) OVER (PARTITION BY user_id) AS n_changes
  FROM events
)
SELECT
  user_id,
  op AS final_status,
  ROUND(value, 2) AS last_value,
  ts AS last_ts,
  CAST(n_changes AS BIGINT) AS n_changes
FROM ops
WHERE rn = 1 AND op <> 'delete'
"""


@register("events_cdc_apply", oracle=_CDC_ORACLE, tags=("events", "warehouse"))
def events_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a change log to produce the latest snapshot (MERGE INTO
    semantics): last operation per key wins, keys whose last operation is
    a delete drop out of the snapshot.

    Scale shape: ONE shuffle on the key serves both the keep-latest rank
    and the change count (same window partition) — applying a day of CDC
    against a 100 TB dimension costs one key-partitioned pass, not
    per-row point updates. (The rn=1 prune stays post-shuffle by design:
    n_changes needs every row of the partition.)"""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    ops = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.col("event_type"))
        .alias("op"),
    ).select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).cast("long").alias("n_changes"),
    )
    return ops.filter((F.col("rn") == 1) & (F.col("op") != "delete")).select(
        "user_id",
        F.col("op").alias("final_status"),
        F.round("value", 2).alias("last_value"),
        F.col("ts").alias("last_ts"),
        "n_changes",
    )


# Gap filling: the time-series completion every dashboard needs — generate
# the full hour spine between the corpus's min and max purchase hours and
# zero-fill the hours with no purchases, so downstream rolling windows and
# charts never silently skip empty periods.
_GAPFILL_ORACLE = """
WITH p AS (
  SELECT date_trunc('hour', ts) AS h, value FROM events WHERE event_type = 'purchase'
),
agg AS (
  SELECT h, COUNT(*) AS n, SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS cents
  FROM p GROUP BY h
),
bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM p),
spine AS (
  SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
)
SELECT
  spine.h AS hour_start,
  CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_purchases,
  ROUND(COALESCE(agg.cents, 0) / 100.0e0, 2) AS revenue
FROM spine LEFT JOIN agg ON spine.h = agg.h
"""


@register("events_gapfill_hourly", oracle=_GAPFILL_ORACLE, tags=("events", "window"))
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly purchase rollup with explicit zero rows for empty hours: the
    hour spine is generated from the data's own [min, max] bounds and
    left-joined against the aggregate.

    Scale shape: the spine derives from a single-row min/max aggregate and
    explodes driver-free into |hours| rows — thousands of rows per year,
    broadcastable to the fact side of the join; revenue aggregates in
    exact integer cents (order-independent), divided back only at the
    edge."""
    (events,) = load(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.date_trunc("hour", "ts").alias("h"), "value"
    )
    agg = p.groupBy("h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100.0).cast("long")).alias("cents"),
    )
    spine = (
        p.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            F.explode(
                F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
            ).alias("h")
        )
    )
    return spine.join(agg, "h", "left").select(
        F.col("h").alias("hour_start"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_purchases"),
        F.round(F.coalesce(F.col("cents"), F.lit(0)) / F.lit(100.0), 2).alias("revenue"),
    )


# Robust outlier detection: median/MAD z-scores (the robust alternative to
# mean/stddev — a handful of extreme values cannot drag the threshold).
# Both engines share the exact interpolated-percentile definition (pinned
# by agg_percentiles), so med/MAD — and therefore every score — are
# computed from identical doubles.
_MAD_ORACLE = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, med.med,
    quantile_cont(ABS(e.value - med.med), 0.5) AS mad
  FROM events e JOIN med ON e.event_type = med.event_type
  GROUP BY e.event_type, med.med
)
SELECT
  e.event_id,
  e.event_type,
  ROUND(e.value, 2) AS value,
  ROUND(ABS(e.value - mad.med) / (1.4826e0 * mad.mad), 4) AS robust_z
FROM events e
JOIN mad ON e.event_type = mad.event_type
WHERE ROUND(ABS(e.value - mad.med) / (1.4826e0 * mad.mad), 4) > 6.0e0
"""


@register("events_outliers_mad", oracle=_MAD_ORACLE, tags=("events", "stats"))
def events_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outliers: |x - median| / (1.4826 * MAD) > 6 — the
    anomaly screen a metrics pipeline runs where mean/stddev would let a
    few extreme points inflate their own threshold.

    Scale shape: two aggregate passes (median, then median absolute
    deviation) each collapse to |event_types| rows broadcast back onto the
    fact scan; the outlier filter is a scan-stage projection against the
    broadcast thresholds — no per-row shuffle anywhere. The threshold
    compares the ROUNDED score so the cut is deterministic cross-engine."""
    (events,) = load(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    scored = events.join(F.broadcast(mad), "event_type").withColumn(
        "robust_z",
        F.round(
            F.abs(F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad")), 4
        ),
    )
    return scored.filter(F.col("robust_z") > 6.0).select(
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
        "robust_z",
    )


# Ordered funnel: stage timestamps must occur IN ORDER per user (signup
# before first view before first purchase) — the conversion metric plain
# per-stage counts (events_funnel) cannot express, because a user who
# purchased before signing up is not a funnel conversion.
_ORDERED_FUNNEL_ORACLE = """
WITH stage AS (
  SELECT
    user_id,
    MIN(CASE WHEN event_type = 'signup' THEN ts END)   AS t_signup,
    MIN(CASE WHEN event_type = 'view' THEN ts END)     AS t_view,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_signup,
  CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
            THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_then_view,
  CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
             AND t_purchase > t_view THEN 1 ELSE 0 END) AS BIGINT)
    AS n_full_funnel
FROM stage
"""


@register("events_ordered_funnel", oracle=_ORDERED_FUNNEL_ORACLE, tags=("events", "agg"))
def events_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel: users whose first signup
    precedes their first view precedes their first purchase — per-stage
    first timestamps folded in one user-grain aggregate, then ordering
    predicates (NULL stage timestamps fail the comparison, correctly
    excluding users who skipped a stage).

    Scale shape: one conditional-MIN aggregate per user (map-side
    combined), then a single-row fold — no per-event window, no self-join
    per stage (the classic funnel anti-pattern joins events to events per
    transition, quadratic in activity)."""
    (events,) = load(spark, sf_dir, "events")
    stage = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return stage.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(F.col("t_signup").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_signup"),
        F.sum(
            F.when(
                F.col("t_signup").isNotNull() & (F.col("t_view") > F.col("t_signup")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_signup_then_view"),
        F.sum(
            F.when(
                F.col("t_signup").isNotNull()
                & (F.col("t_view") > F.col("t_signup"))
                & (F.col("t_purchase") > F.col("t_view")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_full_funnel"),
    )


# Event-sequence transition matrix (first-order Markov): P(next | current)
# per event-type pair over each user's time-ordered stream — the
# session-flow / next-action model behind funnel diagnostics and behavioral
# anomaly baselines.
_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS cur,
    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
pairs AS (
  SELECT cur, nxt, COUNT(*) AS n FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
),
tot AS (
  SELECT cur, SUM(n) AS n_out FROM pairs GROUP BY cur
)
SELECT
  pairs.cur, pairs.nxt,
  CAST(pairs.n AS BIGINT) AS n,
  ROUND(CAST(pairs.n AS DOUBLE) / CAST(tot.n_out AS DOUBLE), 6) AS p
FROM pairs JOIN tot ON pairs.cur = tot.cur
"""


@register("events_markov_transitions", oracle=_MARKOV_ORACLE, tags=("events", "window"))
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event sequences:
    (current, next) pair counts and conditional probabilities.

    Scale shape: one user-keyed shuffle for the lead window, then the pair
    rollup collapses to |types|^2 rows with map-side combine; the
    row-total join is a broadcast of |types| rows. Probabilities divide
    two exact counts, so they are identical doubles on both engines."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = pairs.groupBy("cur").agg(F.sum("n").alias("n_out"))
    return pairs.join(F.broadcast(tot), "cur").select(
        "cur",
        "nxt",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_out").cast("double"), 6).alias("p"),
    )


# Time-weighted average (TWAP shape): each observation holds until the
# next one, so its weight is its holding duration — the correct mean for
# irregularly-sampled series (a value held 10 hours counts 10x one held
# an hour; the naive row-mean treats them equally).
_TWA_ORACLE = """
WITH seq AS (
  SELECT user_id, value, ts,
    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_ts
  FROM events WHERE event_type = 'purchase'
),
seg AS (
  SELECT user_id, value,
    epoch_us(nxt_ts) - epoch_us(ts) AS dur_us
  FROM seq WHERE nxt_ts IS NOT NULL
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_segments,
  CAST(SUM(dur_us) AS BIGINT) AS total_us,
  ROUND(SUM(CAST(ROUND(value * 100.0) AS BIGINT) * dur_us) * 1.0e0
        / (SUM(dur_us) * 100.0e0), 4) AS time_weighted_avg
FROM seg
GROUP BY user_id
HAVING SUM(dur_us) > 0
"""


@register("events_time_weighted_avg", oracle=_TWA_ORACLE, tags=("events", "window"))
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average purchase value: lead window gives
    each observation's holding duration; the weighted sum accumulates in
    exact integers (cents x microseconds) so the aggregate is
    order-independent, dividing to a double only at the edge.

    Scale shape: one user-keyed shuffle shared by the lead window and the
    rollup; weights are integer microsecond durations — exact, no float
    accumulation drift at any partitioning."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "value", "ts", "event_id")
        .withColumn("nxt_ts", F.lead("ts").over(w))
        .filter(F.col("nxt_ts").isNotNull())
        .select(
            "user_id",
            (F.unix_micros("nxt_ts") - F.unix_micros("ts")).alias("dur_us"),
            F.round(F.col("value") * 100.0).cast("long").alias("cents"),
        )
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum("dur_us").cast("long").alias("total_us"),
            F.sum(F.col("cents") * F.col("dur_us")).alias("wsum"),
        )
        .filter(F.col("total_us") > 0)
        .select(
            "user_id",
            "n_segments",
            "total_us",
            F.round(
                F.col("wsum").cast("double")
                / (F.col("total_us").cast("double") * F.lit(100.0)),
                4,
            ).alias("time_weighted_avg"),
        )
    )


# Period-over-period deltas: daily revenue with previous-day comparison —
# the dashboard staple (absolute delta + percent change, NULL on the first
# day and on zero baselines rather than a division blowup).
_POP_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
    SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY day
),
seq AS (
  SELECT day, cents, LAG(cents) OVER (ORDER BY day) AS prev_cents FROM daily
)
SELECT day,
  ROUND(cents / 100.0e0, 2) AS revenue,
  ROUND((cents - prev_cents) / 100.0e0, 2) AS delta,
  CASE WHEN prev_cents > 0
       THEN ROUND((cents - prev_cents) * 100.0e0 / prev_cents, 2)
  END AS pct_change
FROM seq
"""


@register("window_period_over_period", oracle=_POP_ORACLE, tags=("window", "events"))
def window_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue deltas: exact-cents daily rollup, lag window
    for the previous period, percent change guarded against zero/missing
    baselines (NULL, never a division error or infinity).

    Scale shape: the lag runs over day-grain rows (|days|, driver-scale
    after aggregation) — the single-partition window is post-rollup by
    construction, the same deliberate trade as window_cumulative_distinct."""
    (events,) = load(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100.0).cast("long")).alias("cents"))
    )
    w = Window.orderBy("day")
    seq = daily.withColumn("prev_cents", F.lag("cents").over(w))
    return seq.select(
        "day",
        F.round(F.col("cents") / F.lit(100.0), 2).alias("revenue"),
        F.round((F.col("cents") - F.col("prev_cents")) / F.lit(100.0), 2).alias("delta"),
        F.when(
            F.col("prev_cents") > 0,
            F.round(
                (F.col("cents") - F.col("prev_cents"))
                * F.lit(100.0)
                / F.col("prev_cents"),
                2,
            ),
        ).alias("pct_change"),
    )


# ---------------------------------------------------------------------------
# Unpivot / melt (the inverse of events_pivot): wide daily metrics -> long
# (day, metric, value) triples — the shape metric stores and training-run
# dashboards ingest.
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT
    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
    CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
    CAST(COUNT(*) AS DOUBLE) AS n_events,
    CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users
  FROM events
  GROUP BY CAST(date_trunc('day', ts) AS TIMESTAMP)
)
SELECT day, 'revenue'  AS metric, revenue  AS value FROM wide
UNION ALL
SELECT day, 'n_events' AS metric, n_events AS value FROM wide
UNION ALL
SELECT day, 'n_users'  AS metric, n_users  AS value FROM wide
"""


@register("events_unpivot", oracle=_UNPIVOT_ORACLE, tags=("events", "reshape"))
def events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt a wide daily-metrics table into (day, metric, value) triples via
    ``stack`` — zero extra shuffle beyond the day-grain aggregate (unpivot
    is a generator projection, row count merely x3). Counts are cast to
    double at melt time because a long column can't share a value column
    with a money metric."""
    (ev,) = load(spark, sf_dir, "events")
    wide = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        (F.sum(F.round(F.col("value") * 100.0).cast("long")).cast("double") / F.lit(100.0)).alias(
            "revenue"
        ),
        F.count(F.lit(1)).cast("double").alias("n_events"),
        F.countDistinct("user_id").cast("double").alias("n_users"),
    )
    return wide.selectExpr(
        "day",
        "stack(3, 'revenue', revenue, 'n_events', n_events, 'n_users', n_users) AS (metric, value)",
    )


_MULTITOUCH_ORACLE = """
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS conv_ts
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT event_id AS touch_id, user_id, event_type AS channel, ts AS touch_ts
  FROM events WHERE event_type IN ('click', 'view')
),
joined AS (
  SELECT c.conv_id, t.channel, t.touch_id, t.touch_ts
  FROM conv c JOIN touch t
    ON c.user_id = t.user_id
   AND t.touch_ts < c.conv_ts
   AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY
),
credited AS (
  SELECT conv_id, channel,
    10000 // COUNT(*) OVER (PARTITION BY conv_id)
      + CASE WHEN ROW_NUMBER() OVER (
               PARTITION BY conv_id ORDER BY touch_ts DESC, touch_id DESC) = 1
             THEN 10000 % COUNT(*) OVER (PARTITION BY conv_id) ELSE 0 END
      AS credit_bp
  FROM joined
),
attributed AS (
  SELECT channel,
    CAST(SUM(credit_bp) AS BIGINT) AS total_credit_bp,
    CAST(COUNT(*) AS BIGINT) AS n_touches,
    CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_conversions
  FROM credited GROUP BY channel
),
direct AS (
  SELECT 'direct' AS channel,
    CAST(10000 * COUNT(*) AS BIGINT) AS total_credit_bp,
    CAST(0 AS BIGINT) AS n_touches,
    CAST(COUNT(*) AS BIGINT) AS n_conversions
  FROM conv
  WHERE conv_id NOT IN (SELECT conv_id FROM joined)
)
SELECT * FROM attributed
UNION ALL
SELECT * FROM direct WHERE n_conversions > 0
"""


@register("events_multitouch_attribution", oracle=_MULTITOUCH_ORACLE, tags=("events", "window", "join"))
def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase distributes exactly
    10,000 basis points of credit across the click/view touches that
    preceded it within a 7-day lookback; purchases with no eligible touch
    credit a synthetic ``direct`` channel. Credits are integer basis points
    (10000 div n, remainder to the most recent touch) so per-conversion
    credit sums to 10000 exactly and both engines agree bit-for-bit.

    Scale shape: the conversion-touch pairing is an equi-join on ``user_id``
    (high-cardinality in production — one shuffle each side) with the 7-day
    range as a post-join filter, so Spark plans a plain hash/sort-merge join,
    never a cartesian; the credit windows partition by ``conv_id`` (natural
    parallelism, no global ordering); the ``direct`` remainder is a
    left-anti on conv_id that AQE turns into a broadcast when the touched-id
    side is small. Nothing touches the driver.
    """
    (ev,) = load(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "user_id", F.col("ts").alias("conv_ts")
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("ts").alias("touch_ts"),
    )
    joined = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("touch_ts") < F.col("conv_ts"))
            & (F.col("touch_ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAYS"))
        )
        .select("conv_id", "channel", "touch_id", "touch_ts")
    )
    wn = Window.partitionBy("conv_id")
    wo = Window.partitionBy("conv_id").orderBy(
        F.col("touch_ts").desc(), F.col("touch_id").desc()
    )
    credited = (
        joined.withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("rn", F.row_number().over(wo))
        .withColumn(
            "credit_bp",
            F.expr("10000 div n + CASE WHEN rn = 1 THEN 10000 % n ELSE 0 END"),
        )
    )
    attributed = credited.groupBy("channel").agg(
        F.sum("credit_bp").cast("long").alias("total_credit_bp"),
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.countDistinct("conv_id").cast("long").alias("n_conversions"),
    )
    direct = (
        conv.join(joined.select("conv_id"), "conv_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("direct").alias("channel"),
            (F.col("n") * 10000).cast("long").alias("total_credit_bp"),
            F.lit(0).cast("long").alias("n_touches"),
            F.col("n").cast("long").alias("n_conversions"),
        )
        .filter(F.col("n_conversions") > 0)
    )
    return attributed.unionByName(direct)


_ASSOC_ORACLE = """
WITH baskets AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, event_type
  FROM events
),
nb AS (
  SELECT CAST(COUNT(DISTINCT (user_id, day)) AS BIGINT) AS n_baskets FROM baskets
),
item AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_item FROM baskets GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS item_a, b.event_type AS item_b, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM baskets a
  JOIN baskets b
    ON a.user_id = b.user_id AND a.day = b.day AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT
  p.item_a, p.item_b, p.n_pair,
  CAST(10000 * p.n_pair // nb.n_baskets AS BIGINT) AS support_bp,
  CAST(10000 * p.n_pair // ia.n_item AS BIGINT) AS confidence_bp,
  CAST(10000 * p.n_pair * nb.n_baskets // (ia.n_item * ib.n_item) AS BIGINT) AS lift_bp
FROM pairs p
JOIN item ia ON p.item_a = ia.event_type
JOIN item ib ON p.item_b = ib.event_type
CROSS JOIN nb
WHERE CAST(10000 * p.n_pair // nb.n_baskets AS BIGINT) >= 100
"""


@register("events_association_rules", oracle=_ASSOC_ORACLE, tags=("events", "agg", "join"))
def events_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over (user, day) baskets of event
    types: pair support, confidence (A=>B), and lift, all in integer basis
    points with a 1% minimum-support cut — the co-occurrence mining step
    behind recommendation and funnel-insight features.

    Scale shape: baskets deduplicate on the high-cardinality (user, day,
    item) key (one shuffle); pair generation self-joins ON THE BASKET KEY,
    so candidate volume is sum over baskets of |basket|^2 — bounded by the
    per-basket item-type cardinality (tiny), never corpus^2. Item totals
    and the basket count are |items|-row / 1-row aggregates that broadcast
    back into the pair frame; integer basis points (10000*n div d) keep
    both engines bit-identical.
    """
    (ev,) = load(spark, sf_dir, "events")
    baskets = ev.select(
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "event_type",
    ).distinct()
    n_baskets = baskets.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    item = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    a = baskets.select("user_id", "day", F.col("event_type").alias("item_a"))
    b = baskets.select("user_id", "day", F.col("event_type").alias("item_b"))
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
    )
    ia = item.select(F.col("event_type").alias("item_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("event_type").alias("item_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_pair",
            F.expr("CAST(10000 * n_pair div n_baskets AS BIGINT)").alias("support_bp"),
            F.expr("CAST(10000 * n_pair div n_a AS BIGINT)").alias("confidence_bp"),
            F.expr("CAST(10000 * n_pair * n_baskets div (n_a * n_b) AS BIGINT)").alias(
                "lift_bp"
            ),
        )
        .filter(F.col("support_bp") >= 100)
    )


_ABTEST_ORACLE = """
WITH assign AS (
  SELECT DISTINCT user_id,
    CASE WHEN substr(md5(concat('exp1:', CAST(user_id AS VARCHAR))), 1, 1) < '8'
         THEN 'A' ELSE 'B' END AS variant
  FROM events
),
conv AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT a.variant,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
  FROM assign a LEFT JOIN conv c ON a.user_id = c.user_id
  GROUP BY a.variant
),
vb AS (
  SELECT variant, n_users, n_converted,
         CAST(10000 * n_converted // n_users AS BIGINT) AS conversion_bp
  FROM v
),
ctrl AS (SELECT conversion_bp AS ctrl_bp FROM vb WHERE variant = 'A')
SELECT vb.variant, vb.n_users, vb.n_converted, vb.conversion_bp,
       CAST(10000 * vb.conversion_bp // ctrl.ctrl_bp - 10000 AS BIGINT) AS lift_vs_ctrl_bp
FROM vb CROSS JOIN ctrl
"""


@register("events_ab_experiment", oracle=_ABTEST_ORACLE, tags=("events", "experiment"))
def events_ab_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with deterministic hash assignment: users
    split 50/50 into variants by the first md5 hex char of their id (a pure
    function of (experiment, user) — the same derived-randomness primitive
    as curation_hash_split, so assignment is stable across reruns and
    growing data), then per-variant conversion (>= 1 purchase) and lift vs
    control in integer basis points.

    Scale shape: assignment is a scan-side projection; conversion is a
    distinct-user semi-structure (two user-grain shuffles); the readout
    collapses to |variants| rows before the control row broadcasts back
    for the lift column. No experiment-config table needed — the hash IS
    the assignment, which is how production experiment frameworks avoid
    an assignment-log join at billions of users."""
    (ev,) = load(spark, sf_dir, "events")
    assign = ev.select("user_id").distinct().select(
        "user_id",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))), 1, 1
            )
            < "8",
            "A",
        )
        .otherwise("B")
        .alias("variant"),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    vb = (
        assign.join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(F.coalesce("converted", F.lit(0))).cast("long").alias("n_converted"),
        )
        .withColumn(
            "conversion_bp",
            F.expr("CAST(10000 * n_converted div n_users AS BIGINT)"),
        )
    )
    ctrl = vb.filter(F.col("variant") == "A").select(
        F.col("conversion_bp").alias("ctrl_bp")
    )
    return vb.crossJoin(F.broadcast(ctrl)).select(
        "variant",
        "n_users",
        "n_converted",
        "conversion_bp",
        F.expr("CAST(10000 * conversion_bp div ctrl_bp - 10000 AS BIGINT)").alias(
            "lift_vs_ctrl_bp"
        ),
    )


_MARKOV_EVAL_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS cur, ts, event_id,
    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
trans AS (
  SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c FROM seq WHERE nxt IS NOT NULL
  GROUP BY cur, nxt
),
model AS (
  SELECT cur, nxt AS predicted FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY cur ORDER BY c DESC, nxt) AS rn FROM trans
  ) WHERE rn = 1
),
scored AS (
  SELECT s.cur, CASE WHEN s.nxt = m.predicted THEN 1 ELSE 0 END AS ok
  FROM seq s JOIN model m ON s.cur = m.cur
  WHERE s.nxt IS NOT NULL
)
SELECT cur AS event_type,
  CAST(COUNT(*) AS BIGINT) AS n_transitions,
  CAST(SUM(ok) AS BIGINT) AS n_correct,
  CAST(10000 * SUM(ok) // COUNT(*) AS BIGINT) AS accuracy_bp
FROM scored GROUP BY cur
"""


@register("events_markov_eval", oracle=_MARKOV_EVAL_ORACLE, tags=("events", "eval"))
def events_markov_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation harness for the Markov session model: train the argmax
    next-event predictor (most frequent successor per state, ties to the
    smallest label — the same transition counts as
    events_markov_transitions) and score its in-sample accuracy per state
    in basis points — the second model-eval entry next to
    text_langid_confusion, proving predict-then-score loops stay
    declarative.

    One lead window on the user key produces BOTH training pairs and eval
    instances; the model is |states|^2 rows that broadcast back onto the
    transition stream. In-sample by construction (documented): the point
    is the harness shape, not holdout methodology."""
    (ev,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wm = Window.partitionBy("cur").orderBy(F.desc("c"), F.asc("nxt"))
    model = (
        trans.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("cur", F.col("nxt").alias("predicted"))
    )
    scored = seq.join(F.broadcast(model), "cur").select(
        "cur", (F.col("nxt") == F.col("predicted")).cast("long").alias("ok")
    )
    return scored.groupBy(F.col("cur").alias("event_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions"),
        F.sum("ok").cast("long").alias("n_correct"),
        F.expr("CAST(10000 * SUM(ok) div COUNT(*) AS BIGINT)").alias("accuracy_bp"),
    )


# RFM segmentation (r5; r6 de-bottlenecked): the classic recency/frequency/
# monetary customer scoring behind retention and campaign targeting. Each
# dimension quintiles independently over the post-aggregate user grain with
# a unique (metric, user_id) total order, so tile assignment is
# deterministic on both engines; the corpus max timestamp (the "as of"
# anchor) is one 1-row broadcast. Monetary accumulates in exact integer
# cents. The oracle keeps plain NTILE(5) — the Spark side computes the
# SAME tiling via operators.sampling.distributed_ntile (range-repartition
# rank + integer NTILE arithmetic), because a bare ntile().over(orderBy)
# is a single-partition sort of every purchaser at 100 TB.
_RFM_ORACLE = """
WITH p AS (
  SELECT user_id, ts, CAST(ROUND(value * 100.0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
anchor AS (SELECT MAX(ts) AS mx FROM p),
per_user AS (
  SELECT user_id,
    CAST(date_diff('day', MAX(ts), (SELECT mx FROM anchor)) AS BIGINT) AS recency_days,
    CAST(COUNT(*) AS BIGINT) AS frequency,
    CAST(SUM(cents) AS BIGINT) AS monetary_cents
  FROM p GROUP BY user_id
)
SELECT
  user_id, recency_days, frequency, monetary_cents,
  CAST(6 - NTILE(5) OVER (ORDER BY recency_days, user_id) AS BIGINT) AS r_score,
  CAST(NTILE(5) OVER (ORDER BY frequency, user_id) AS BIGINT) AS f_score,
  CAST(NTILE(5) OVER (ORDER BY monetary_cents, user_id) AS BIGINT) AS m_score,
  CONCAT(
    CAST(6 - NTILE(5) OVER (ORDER BY recency_days, user_id) AS VARCHAR),
    CAST(NTILE(5) OVER (ORDER BY frequency, user_id) AS VARCHAR),
    CAST(NTILE(5) OVER (ORDER BY monetary_cents, user_id) AS VARCHAR)
  ) AS segment
FROM per_user
"""


@register("events_rfm_segmentation", oracle=_RFM_ORACLE, tags=("events", "stats"))
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-purchaser recency (days since last
    purchase, anchored at the corpus max timestamp), frequency (purchase
    count) and monetary (exact integer cents), each scored 1-5 by quintile
    — recency inverted so 5 always means "best" — and concatenated into
    the classic 3-digit segment label ("555" = champions).

    Scale shape: events collapse to user grain in one map-side-combinable
    aggregate (the only data-sized shuffle); the anchor is a 1-row
    broadcast. Each quintile is computed by ``distributed_ntile`` — a
    range-repartitioned global rank plus exact integer NTILE arithmetic —
    never a single-partition window, so the tiling scales with executors
    while matching the oracle's NTILE(5) bit-for-bit. The three tile maps
    join back on user_id (user-grain equi-joins). The aggregated user
    frame is localCheckpointed so the three rank paths and the join spine
    share one computation. All outputs integer/text — hash-exact.

    r13 (guide §2.6 — overlap independent jobs): the three tilings are
    independent given the materialized user frame, but each one issues
    ~3 sequential driver jobs (range-sample, checkpoint, count collect),
    and chaining them serialized ~9 jobs of pure scheduling floor (the
    entry's measured flat ~3.2 s constant at sf0.01 AND sf0.1 — r12
    BENCH_DETAIL scaling e=0.038). The tile maps are now built from
    ``per_user`` directly (not from the previous tiling's join, which
    only deepened the plan without changing any value — same row set,
    same order keys) and submitted from a 3-thread pool so their jobs
    overlap. Tiles, scores and segments are bit-identical: each tiling
    orders by its own metric with the same user_id tiebreak, and the
    user-grain equi-joins just attach columns."""
    from concurrent.futures import ThreadPoolExecutor

    from ..operators.sampling import distributed_ntile

    (events,) = load(spark, sf_dir, "events")
    p = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round(F.col("value") * 100.0).cast("long").alias("cents")
    )
    anchor = p.agg(F.max("ts").alias("mx"))
    per_user = (
        p.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("mx"), F.max("ts")).cast("long").alias("recency_days"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum("cents").cast("long").alias("monetary_cents"),
        )
        .localCheckpoint(eager=True)
    )
    def _tile_map(metric: str, out: str) -> DataFrame:
        return distributed_ntile(
            per_user.select("user_id", metric), 5, metric, "user_id", out_col=out
        ).select("user_id", out)

    with ThreadPoolExecutor(max_workers=3) as pool:
        r_map, f_map, m_map = pool.map(
            lambda a: _tile_map(*a),
            (
                ("recency_days", "r_tile"),
                ("frequency", "f_tile"),
                ("monetary_cents", "m_tile"),
            ),
        )
    scored = per_user.join(r_map, "user_id").join(f_map, "user_id").join(m_map, "user_id")
    r = (6 - F.col("r_tile")).cast("long")
    f = F.col("f_tile").cast("long")
    m = F.col("m_tile").cast("long")
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        r.alias("r_score"),
        f.alias("f_score"),
        m.alias("m_score"),
        F.concat(
            r.cast("string"), f.cast("string"), m.cast("string")
        ).alias("segment"),
    )
