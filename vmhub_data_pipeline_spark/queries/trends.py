"""Trend / drift / robust-statistics tier.

Analytics a data-curation team runs ON the pipeline's own output to decide
what to keep: OLS trend fits, categorical drift detection between time
periods, EWMA smoothing of daily series, winsorized (outlier-clipped)
summary statistics, and token-distribution entropy per source. The
reference delegates this whole class to its warehouse (SURVEY §0:
BigQuery-side analytics over `src/utils/bigquery_helper.py:109-170` loads);
here each is a native single-plan DataFrame query.

House rules (see queries/__init__.py): every statistic accumulates in exact
integer moments / micro-nat quanta so the result is independent of fp
summation order at any partitioning, and every computed column carries the
same alias and rounding on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.exact import quant
from ..tables import load
from . import register

# ---------------------------------------------------------------------------
# OLS regression trend (exact integer moments, single pass)
# ---------------------------------------------------------------------------

_REGR_ORACLE = """
WITH m AS (
  SELECT
    l_returnflag,
    COUNT(*) AS n,
    SUM(CAST(ROUND(l_quantity * 100.0) AS HUGEINT)) AS sx,
    SUM(CAST(ROUND(l_quantity * 100.0) AS HUGEINT)
        * CAST(ROUND(l_quantity * 100.0) AS HUGEINT)) AS sxx,
    SUM(CAST(ROUND(l_extendedprice * 100.0) AS HUGEINT)) AS sy,
    SUM(CAST(ROUND(l_extendedprice * 100.0) AS HUGEINT)
        * CAST(ROUND(l_extendedprice * 100.0) AS HUGEINT)) AS syy,
    SUM(CAST(ROUND(l_quantity * 100.0) AS HUGEINT)
        * CAST(ROUND(l_extendedprice * 100.0) AS HUGEINT)) AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT
  l_returnflag,
  n,
  ROUND(
    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
    / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)),
    6) AS slope,
  ROUND(
    (CAST(sy AS DOUBLE)
     - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
       / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
       * CAST(sx AS DOUBLE))
    / CAST(n AS DOUBLE) / 100.0,
    4) AS intercept,
  ROUND(
    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
    * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
    / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
       * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))),
    6) AS r2
FROM m
"""


@register("agg_regression_trend", oracle=_REGR_ORACLE, tags=("agg", "stats"))
def agg_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fit of price on quantity: slope / intercept / r²,
    assembled from one pass of exact integer moments (same machinery as
    ``agg_variance_corr``; built-in regr_slope would drift in low bits with
    partition merge order). One map-side-combined shuffle at group grain —
    the 100 TB shape for any regression over a fact table."""
    (li,) = load(spark, sf_dir, "lineitem")
    x = quant("l_quantity", 2).cast("decimal(38,0)")
    y = quant("l_extendedprice", 2).cast("decimal(38,0)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov_num = F.col("sxy").cast("double") - sxd * syd / nd
    var_x = F.col("sxx").cast("double") - sxd * sxd / nd
    var_y = F.col("syy").cast("double") - syd * syd / nd
    slope = cov_num / var_x
    return agg.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((syd - slope * sxd) / nd / F.lit(100.0), 4).alias("intercept"),
        F.round(cov_num * cov_num / (var_x * var_y), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Chi-square categorical drift between two time periods
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH cnt AS (
  SELECT
    event_type,
    CAST(SUM(CASE WHEN EXTRACT(DAY FROM ts) <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
    CAST(SUM(CASE WHEN EXTRACT(DAY FROM ts) <= 15 THEN 0 ELSE 1 END) AS BIGINT) AS n_late
  FROM events
  GROUP BY event_type
),
tot AS (
  SELECT CAST(SUM(n_early) AS BIGINT) AS tot_early,
         CAST(SUM(n_late) AS BIGINT) AS tot_late,
         CAST(SUM(n_early + n_late) AS BIGINT) AS grand
  FROM cnt
)
SELECT
  event_type,
  n_early,
  n_late,
  ROUND(
    (CAST(n_early AS DOUBLE)
       - CAST(n_early + n_late AS DOUBLE) * CAST(tot_early AS DOUBLE) / CAST(grand AS DOUBLE))
    * (CAST(n_early AS DOUBLE)
       - CAST(n_early + n_late AS DOUBLE) * CAST(tot_early AS DOUBLE) / CAST(grand AS DOUBLE))
    / (CAST(n_early + n_late AS DOUBLE) * CAST(tot_early AS DOUBLE) / CAST(grand AS DOUBLE))
    +
    (CAST(n_late AS DOUBLE)
       - CAST(n_early + n_late AS DOUBLE) * CAST(tot_late AS DOUBLE) / CAST(grand AS DOUBLE))
    * (CAST(n_late AS DOUBLE)
       - CAST(n_early + n_late AS DOUBLE) * CAST(tot_late AS DOUBLE) / CAST(grand AS DOUBLE))
    / (CAST(n_early + n_late AS DOUBLE) * CAST(tot_late AS DOUBLE) / CAST(grand AS DOUBLE)),
    6) AS chi2_contrib
FROM cnt CROSS JOIN tot
"""


@register("stats_chi2_drift", oracle=_CHI2_ORACLE, tags=("stats", "drift"))
def stats_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift detector: chi-square homogeneity contributions of
    each event_type between early-month (day ≤ 15) and late-month traffic —
    the standard guard a pipeline runs before accepting a new ingest batch
    into a training mix.

    Shape: one map-side-combined count aggregate at category grain, then a
    single-row totals aggregate broadcast back over the (tiny) category
    table. No shuffle touches row-grain data twice; expected counts divide
    exact integers so contributions are fp-order-independent."""
    (ev,) = load(spark, sf_dir, "events")
    early = F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0)
    cnt = ev.groupBy("event_type").agg(
        F.sum(early).cast("long").alias("n_early"),
        F.sum(1 - early).cast("long").alias("n_late"),
    )
    tot = cnt.agg(
        F.sum("n_early").cast("long").alias("tot_early"),
        F.sum("n_late").cast("long").alias("tot_late"),
        F.sum(F.col("n_early") + F.col("n_late")).cast("long").alias("grand"),
    )
    joined = cnt.crossJoin(F.broadcast(tot))
    row_tot = (F.col("n_early") + F.col("n_late")).cast("double")
    e_early = row_tot * F.col("tot_early").cast("double") / F.col("grand").cast("double")
    e_late = row_tot * F.col("tot_late").cast("double") / F.col("grand").cast("double")
    d_early = F.col("n_early").cast("double") - e_early
    d_late = F.col("n_late").cast("double") - e_late
    return joined.select(
        "event_type",
        "n_early",
        "n_late",
        F.round(d_early * d_early / e_early + d_late * d_late / e_late, 6).alias("chi2_contrib"),
    )


# ---------------------------------------------------------------------------
# EWMA smoothing of a daily series (sequential fold per key)
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT
    event_type,
    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
    CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS rev_q
  FROM events
  WHERE event_type IN ('purchase', 'click')
  GROUP BY event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
),
seq AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn FROM daily
),
rec AS (
  SELECT event_type, day, rn, rev_q, CAST(rev_q AS DOUBLE) / 100.0 AS ewma
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.event_type, s.day, s.rn, s.rev_q,
         0.3 * (CAST(s.rev_q AS DOUBLE) / 100.0) + 0.7 * r.ewma
  FROM seq s JOIN rec r ON s.event_type = r.event_type AND s.rn = r.rn + 1
)
SELECT
  event_type,
  day,
  ROUND(CAST(rev_q AS DOUBLE) / 100.0, 2) AS revenue,
  ROUND(ewma, 6) AS ewma_revenue
FROM rec
"""


@register("events_ewma_daily", oracle=_EWMA_ORACLE, tags=("events", "timeseries"))
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed daily revenue per event type (α = 0.3) — the recursive
    smoother behind ingest-volume anomaly alerts (pairs with
    ``events_outliers_mad``).

    EWMA is inherently sequential per key, and the closed form
    Σ α(1-α)^(t-i)·xᵢ underflows/overflows past a few hundred steps, so the
    recursion is run literally — as an ``F.aggregate`` fold over the
    day-sorted array of one KEY's daily totals. That is the right 100 TB
    shape: rows collapse to day grain FIRST (map-side-combined aggregate),
    so the fold length is bounded by calendar days (~thousands), never by
    row count, and each key folds independently in parallel. Both engines
    evaluate the identical 0.3·x + 0.7·prev double sequence (DuckDB via
    recursive CTE), so results are bit-identical before the final round."""
    (ev,) = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(quant("value", 2)).cast("long").alias("rev_q"))
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "rev_q"))).alias("s")
    )
    # fold: acc is the array of EWMA values so far; seed with the first x
    ewmas = F.aggregate(
        F.slice("s", 2, F.greatest(F.size("s") - 1, F.lit(0))),
        F.array(F.element_at("s", 1)["rev_q"].cast("double") / F.lit(100.0)),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.lit(0.3) * (x["rev_q"].cast("double") / F.lit(100.0))
                + F.lit(0.7) * F.element_at(acc, -1)
            ),
        ),
    )
    return (
        series.select("event_type", F.posexplode(F.arrays_zip("s", ewmas.alias("e"))))
        .select(
            "event_type",
            F.col("col")["s"]["day"].alias("day"),
            F.round(F.col("col")["s"]["rev_q"].cast("double") / F.lit(100.0), 2).alias("revenue"),
            F.round(F.col("col")["e"], 6).alias("ewma_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Winsorized summary statistics (clip at exact p05/p95, integer-exact means)
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH q AS (
  SELECT
    l_returnflag,
    CAST(ROUND(quantile_cont(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT), 0.05)) AS BIGINT) AS p05_q,
    CAST(ROUND(quantile_cont(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT), 0.95)) AS BIGINT) AS p95_q
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT
  l.l_returnflag,
  ROUND(CAST(q.p05_q AS DOUBLE) / 100.0, 2) AS p05,
  ROUND(CAST(q.p95_q AS DOUBLE) / 100.0, 2) AS p95,
  ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100.0) AS BIGINT)) AS DOUBLE)
        / COUNT(*) / 100.0, 4) AS mean_raw,
  ROUND(CAST(SUM(LEAST(GREATEST(CAST(ROUND(l.l_extendedprice * 100.0) AS BIGINT), q.p05_q),
                       q.p95_q)) AS DOUBLE)
        / COUNT(*) / 100.0, 4) AS mean_winsor,
  CAST(SUM(CASE WHEN CAST(ROUND(l.l_extendedprice * 100.0) AS BIGINT) < q.p05_q
                  OR CAST(ROUND(l.l_extendedprice * 100.0) AS BIGINT) > q.p95_q
                THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
FROM lineitem l
JOIN q ON q.l_returnflag = l.l_returnflag
GROUP BY l.l_returnflag, q.p05_q, q.p95_q
"""


@register("stats_winsorize", oracle=_WINSOR_ORACLE, tags=("stats", "robust"))
def stats_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group: clip price at the exact [p05, p95]
    cent-rounded percentiles, report raw vs clipped means and the clip
    count — the robust-statistics guard against a few corrupt rows skewing
    a quality metric.

    Two passes over the fact (percentile, then clip+sum), joined through a
    BROADCAST of the per-group thresholds — the group table is tiny at any
    scale. Thresholds are rounded to integer cents before clipping, so every
    clipped value is an exact integer and both means are integer sums —
    no fp-order sensitivity. (percentile_approx is the sketch-based scale
    path for the first pass; exact here because the oracle must match.)"""
    (li,) = load(spark, sf_dir, "lineitem")
    li = li.select("l_returnflag", quant("l_extendedprice", 2).alias("price_q"))
    q = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(price_q, 0.05)")).cast("long").alias("p05_q"),
        F.round(F.expr("percentile(price_q, 0.95)")).cast("long").alias("p95_q"),
    )
    j = li.join(
        F.broadcast(q.withColumnRenamed("l_returnflag", "rf")),
        on=[F.col("l_returnflag") == F.col("rf")],
    )
    clipped = F.least(F.greatest(F.col("price_q"), F.col("p05_q")), F.col("p95_q"))
    out = j.groupBy("l_returnflag", "p05_q", "p95_q").agg(
        F.sum("price_q").alias("sum_raw"),
        F.sum(clipped).alias("sum_winsor"),
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when((F.col("price_q") < F.col("p05_q")) | (F.col("price_q") > F.col("p95_q")), 1)
            .otherwise(0)
        ).cast("long").alias("n_clipped"),
    )
    return out.select(
        "l_returnflag",
        F.round(F.col("p05_q").cast("double") / F.lit(100.0), 2).alias("p05"),
        F.round(F.col("p95_q").cast("double") / F.lit(100.0), 2).alias("p95"),
        F.round(F.col("sum_raw").cast("double") / F.col("n") / F.lit(100.0), 4).alias("mean_raw"),
        F.round(F.col("sum_winsor").cast("double") / F.col("n") / F.lit(100.0), 4).alias(
            "mean_winsor"
        ),
        "n_clipped",
    )


# ---------------------------------------------------------------------------
# Token-distribution Shannon entropy per source (integer micro-nats)
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH wd AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS word FROM documents
),
wc AS (
  SELECT source, word, COUNT(*) AS wcnt FROM wd GROUP BY source, word
),
tot AS (
  SELECT source, CAST(SUM(wcnt) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_vocab
  FROM wc GROUP BY source
)
SELECT
  wc.source,
  ANY_VALUE(tot.n_tokens) AS n_tokens,
  ANY_VALUE(tot.n_vocab) AS n_vocab,
  CAST(-SUM(wc.wcnt * CAST(ROUND(LN(
    CAST(wc.wcnt AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE)
  ) * 1000000.0) AS BIGINT)) AS BIGINT) AS entropy_q,
  ROUND(CAST(CAST(-SUM(wc.wcnt * CAST(ROUND(LN(
    CAST(wc.wcnt AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE)
  ) * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
        / CAST(ANY_VALUE(tot.n_tokens) AS DOUBLE) / 1000000.0, 6) AS entropy_nats
FROM wc
JOIN tot ON tot.source = wc.source
GROUP BY wc.source
"""


@register("text_entropy_by_source", oracle=_ENTROPY_ORACLE, tags=("text", "stats"))
def text_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's unigram distribution — the
    diversity signal used when weighting sources in a pretraining mix (low
    entropy ⇒ templated/boilerplate-heavy source). Accumulates in integer
    micro-nats (same quantization as langid/perplexity) so the sum is exact
    and order-independent; the final division is one double op on identical
    integers in both engines.

    Shape: rows collapse to (source, word) counts map-side; per-source
    totals come from the SAME counts (no second scan) and rejoin by the
    source key — at 100 TB the join is a broadcast of one row per source."""
    (docs,) = load(spark, sf_dir, "documents")
    wd = docs.select("source", F.explode(F.split("text", " ")).alias("word"))
    wc = wd.groupBy("source", "word").agg(F.count(F.lit(1)).alias("wcnt"))
    tot = wc.groupBy("source").agg(
        F.sum("wcnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
    )
    qlogp = F.round(
        F.log(F.col("wcnt").cast("double") / F.col("n_tokens").cast("double")) * 1_000_000.0
    ).cast("long")
    j = wc.join(F.broadcast(tot.withColumnRenamed("source", "t_source")),
                on=[F.col("source") == F.col("t_source")])
    agg = j.select(
        "source", "n_tokens", "n_vocab", (F.col("wcnt") * qlogp).alias("term_q")
    ).groupBy("source").agg(
        F.any_value("n_tokens").alias("n_tokens"),
        F.any_value("n_vocab").alias("n_vocab"),
        (-F.sum("term_q")).alias("entropy_q"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "n_vocab",
        "entropy_q",
        F.round(
            F.col("entropy_q").cast("double") / F.col("n_tokens").cast("double") / F.lit(1_000_000.0),
            6,
        ).alias("entropy_nats"),
    )


_ZSCORE_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS rev_c
  FROM events GROUP BY day
),
w AS (
  SELECT day, rev_c,
    CAST(COUNT(*) OVER tw AS BIGINT) AS n_w,
    CAST(SUM(rev_c) OVER tw AS BIGINT) AS s_w,
    CAST(SUM(rev_c * rev_c) OVER tw AS BIGINT) AS ss_w
  FROM daily
  WINDOW tw AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT day, rev_c,
  ROUND(CASE WHEN n_w >= 3 AND
      (CAST(ss_w AS DOUBLE) - CAST(s_w AS DOUBLE) * CAST(s_w AS DOUBLE) / CAST(n_w AS DOUBLE))
        / (CAST(n_w AS DOUBLE) - 1.0) > 0
    THEN (CAST(rev_c AS DOUBLE) - CAST(s_w AS DOUBLE) / CAST(n_w AS DOUBLE))
         / sqrt((CAST(ss_w AS DOUBLE) - CAST(s_w AS DOUBLE) * CAST(s_w AS DOUBLE) / CAST(n_w AS DOUBLE))
                / (CAST(n_w AS DOUBLE) - 1.0))
    END, 6) AS zscore,
  COALESCE(ABS(CASE WHEN n_w >= 3 AND
      (CAST(ss_w AS DOUBLE) - CAST(s_w AS DOUBLE) * CAST(s_w AS DOUBLE) / CAST(n_w AS DOUBLE))
        / (CAST(n_w AS DOUBLE) - 1.0) > 0
    THEN (CAST(rev_c AS DOUBLE) - CAST(s_w AS DOUBLE) / CAST(n_w AS DOUBLE))
         / sqrt((CAST(ss_w AS DOUBLE) - CAST(s_w AS DOUBLE) * CAST(s_w AS DOUBLE) / CAST(n_w AS DOUBLE))
                / (CAST(n_w AS DOUBLE) - 1.0))
    END) > 3.0, FALSE) AS is_anomaly
FROM w
"""


@register("events_anomaly_zscore", oracle=_ZSCORE_ORACLE, tags=("events", "stats"))
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each day's revenue z-scored
    against the PRECEDING 7 days (never including itself — no
    self-masking), |z| > 3 flags the anomaly; warm-up days (< 3 priors) and
    zero-variance windows emit NULL scores rather than fake zeros. The
    time-series complement to the MAD (cross-sectional) and chi-square
    (categorical) detectors.

    Scale shape: rows collapse to day grain FIRST (map-side combinable,
    integer cents), so the trailing window runs over |days| rows — a
    bounded frame at any event volume; mean/variance assemble from exact
    integer window sums with the identical double expression on both
    engines (the agg_variance_corr machinery applied to window frames)."""
    (ev,) = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100.0).cast("long")).cast("long").alias("rev_c")
    )
    tw = Window.orderBy("day").rowsBetween(-7, -1)
    w = daily.select(
        "day",
        "rev_c",
        F.count(F.lit(1)).over(tw).cast("long").alias("n_w"),
        F.sum("rev_c").over(tw).cast("long").alias("s_w"),
        F.sum(F.col("rev_c") * F.col("rev_c")).over(tw).cast("long").alias("ss_w"),
    )
    nd = F.col("n_w").cast("double")
    sd = F.col("s_w").cast("double")
    var = (F.col("ss_w").cast("double") - sd * sd / nd) / (nd - F.lit(1.0))
    z = F.when(
        (F.col("n_w") >= 3) & (var > 0),
        (F.col("rev_c").cast("double") - sd / nd) / F.sqrt(var),
    )
    return w.select(
        "day",
        "rev_c",
        F.round(z, 6).alias("zscore"),
        F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("is_anomaly"),
    )
