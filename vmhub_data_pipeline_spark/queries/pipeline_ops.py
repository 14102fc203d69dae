"""Reference-parity scalar/pipeline operators as catalog queries —
SURVEY.md §2.2 (P2-P11).

These re-express the reference's record-shaping logic as column
expressions: CNPJ cleaning (src/main.py:22-23), storage-path construction
(src/main.py:25-31), date formatting/parsing (src/main.py:28,35;
src/utils/gcs_helper.py:213-218), day-boundary and date arithmetic
(src/config/endpoints.py:27-34; src/main.py:204). The lineage envelope
itself (P1) is in pipeline/lineage.py and exercised by unit tests (its
ingestion_timestamp is run-dependent, so it can't be oracle-hashed).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.urls import url_path_quote
from ..tables import load
from . import register

_PATHS_ORACLE = """
SELECT
  o_orderkey,
  TRANSLATE('12.345.678/0001-90', './-', '') AS cnpj,
  PRINTF('CNPJ_%s/%s/%s/response_pg%d.json',
         TRANSLATE('12.345.678/0001-90', './-', ''),
         'vendas',
         STRFTIME(o_orderdate, '%Y%m%d'),
         o_orderkey % 100) AS lake_path,
  'VMHUB' AS source_system
FROM orders
WHERE o_orderkey < 1000
"""


@register("pipeline_lake_paths", oracle=_PATHS_ORACLE, tags=("pipeline", "string"))
def pipeline_lake_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-path construction (P2+P3+P4): CNPJ cleaning via translate
    (reference src/main.py:22-23), Hive-ish path layout
    CNPJ_{cnpj}/{endpoint}/{yyyymmdd}/response_pg{page}.json (reference
    src/main.py:25-31), fixed source_system literal (src/main.py:39)."""
    (orders,) = load(spark, sf_dir, "orders")
    cnpj = F.translate(F.lit("12.345.678/0001-90"), "./-", "")
    return orders.filter(F.col("o_orderkey") < 1000).select(
        "o_orderkey",
        cnpj.alias("cnpj"),
        F.format_string(
            "CNPJ_%s/%s/%s/response_pg%d.json",
            cnpj,
            F.lit("vendas"),
            F.date_format("o_orderdate", "yyyyMMdd"),
            F.col("o_orderkey") % 100,
        ).alias("lake_path"),
        F.lit("VMHUB").alias("source_system"),
    )


_DATES_ORACLE = """
SELECT
  o_orderkey,
  STRFTIME(o_orderdate, '%Y%m%d')                       AS ds_str,
  CAST(STRPTIME(STRFTIME(o_orderdate, '%Y%m%d'), '%Y%m%d') AS DATE) AS ds_parsed,
  CAST(DATE_TRUNC('month', o_orderdate) AS DATE)        AS month_start,
  CAST(o_orderdate AS DATE) + 90                        AS ship_deadline,
  CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                                                        AS days_since_epoch_start,
  CAST(DAY(LAST_DAY(CAST(o_orderdate AS DATE))) AS BIGINT) AS days_in_month
FROM orders
WHERE o_orderkey < 1000
"""


@register("pipeline_date_functions", oracle=_DATES_ORACLE, tags=("pipeline", "date"))
def pipeline_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date format/parse round-trip + arithmetic (P4-P7): yyyyMMdd format
    (reference src/main.py:28), strptime parse (src/utils/gcs_helper.py:213),
    day/month truncation (src/config/endpoints.py:28-33), date offsets
    (src/main.py:204 two-year backfill arithmetic)."""
    (orders,) = load(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    return orders.filter(F.col("o_orderkey") < 1000).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMMdd").alias("ds_str"),
        F.to_date(F.date_format("o_orderdate", "yyyyMMdd"), "yyyyMMdd").alias("ds_parsed"),
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.date_add(od, 90).alias("ship_deadline"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).cast("long").alias(
            "days_since_epoch_start"
        ),
        F.dayofmonth(F.last_day(od)).cast("long").alias("days_in_month"),
    )


_BADDATE_ORACLE = """
WITH raw(s) AS (VALUES ('20240115'), ('20241301'), ('bogus'), (''), ('20240229')),
parsed AS (SELECT s, TRY_CAST(TRY_STRPTIME(s, '%Y%m%d') AS DATE) AS d FROM raw)
SELECT
  COUNT(*)                          AS n_input,
  COUNT(d)                          AS n_valid,
  MAX(d)                            AS max_valid_date
FROM parsed
"""


@register("pipeline_bad_date_tolerance", oracle=_BADDATE_ORACLE, tags=("pipeline", "date"))
def pipeline_bad_date_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-value-tolerant date parsing + watermark max (P5/A1): invalid
    yyyymmdd strings become NULL and are skipped, valid max survives —
    the reference's warn-and-skip parse (src/utils/gcs_helper.py:213-218)
    feeding its max-date watermark (:220)."""
    df = spark.createDataFrame(
        [("20240115",), ("20241301",), ("bogus",), ("",), ("20240229",)], "s string"
    )
    parsed = df.select("s", F.expr("try_to_date(s, 'yyyyMMdd')").alias("d"))
    return parsed.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.count("d").alias("n_valid"),
        F.max("d").alias("max_valid_date"),
    )


_STRINGS_ORACLE = """
SELECT
  c_custkey,
  UPPER(c_name)                                   AS name_upper,
  LOWER(c_mktsegment)                             AS segment_lower,
  LPAD(CAST(c_custkey AS VARCHAR), 9, '0')        AS custkey_padded,
  SUBSTR(c_name, 1, 8)                            AS name_prefix,
  CONCAT_WS('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
  REPLACE(c_name, 'Customer', 'Cliente')          AS name_localized,
  CAST(LENGTH(c_name) AS BIGINT)                  AS name_len,
  TRIM('  x  ')                                   AS trimmed,
  REPLACE(c_name, '#', '%23')                     AS name_urlquoted
FROM customer
WHERE c_custkey < 200
"""


@register("pipeline_string_functions", oracle=_STRINGS_ORACLE, tags=("pipeline", "string"))
def pipeline_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface (P2/P8/P9 family): case, pad, substring,
    concat, replace, trim — the record-shaping toolkit of the ingest path."""
    (cust,) = load(spark, sf_dir, "customer")
    return cust.filter(F.col("c_custkey") < 200).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("custkey_padded"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.regexp_replace("c_name", "Customer", "Cliente").alias("name_localized"),
        F.length("c_name").cast("long").alias("name_len"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        # P8: path-segment quoting (reference quote(cnpj),
        # src/api/vmhub_client.py:120). On c_name the only unsafe char is
        # '#', so the oracle can state the expectation as a REPLACE; full
        # quote() parity incl. space///*/~ is pinned in tests/test_schema.py.
        url_path_quote("c_name").alias("name_urlquoted"),
    )


_SERIES_ORACLE = """
SELECT
  CAST(d AS DATE) AS ds,
  COUNT(*)        AS n_days_window
FROM (
  SELECT UNNEST(generate_series(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY)) AS d
)
GROUP BY ds
"""


@register("pipeline_date_series", oracle=_SERIES_ORACLE, tags=("pipeline", "date"))
def pipeline_date_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily range generation (P7): sequence + explode — the reference's
    get_daily_ranges driver loop (src/config/endpoints.py:19-34) as a
    declarative expression."""
    df = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("ds")
    )
    return df.groupBy("ds").agg(F.count(F.lit(1)).alias("n_days_window"))
