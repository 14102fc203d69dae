"""Incremental watermark + daily range generation (SURVEY §2.3 A1, §2.7 T1).

Reference behavior: resume ``vendas`` from max(date) already landed, parsed
from path segments with bad-value tolerance (src/utils/gcs_helper.py:203-241,
max at :220, tolerant parse :213-218); cold start = today - 730 days
(src/main.py:204); daily stepping (src/config/endpoints.py:19-34).

``lake_watermark`` works on FILE METADATA (partition directory values), not
data — listing partitions is O(partitions) regardless of data volume, the
same property the reference gets from prefix listing.
"""

from __future__ import annotations

from datetime import date, timedelta

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from .lake import LakeLayout

COLD_START_DAYS = 730  # reference src/main.py:204: 2 * 365


def lake_watermark(
    spark: SparkSession, layout: LakeLayout, cnpj: str, endpoint: str
) -> date | None:
    """Max landed ds for (cnpj, endpoint), or None if nothing landed.

    TRUE metadata-only cost: lists the partition DIRECTORIES and parses
    their ds= values — O(partitions) filesystem entries, zero data rows.
    (A schema-less spark.read.json here would run full-corpus schema
    inference plus a row scan just to fold partition values the directory
    names already carry — the lake is NDJSON, which cannot column-prune.)
    Hidden ('.'/'_'-prefixed) names are skipped, matching Spark's own
    listing; invalid ds values are skipped (reference's warn-and-skip,
    src/utils/gcs_helper.py:213-218). Local-filesystem paths, like the
    rest of the lake layer; an object-store lake would route the same
    listing through the Hadoop FileSystem API.
    """
    import os

    endpoint_dir = f"{layout.root}/cnpj={cnpj}/endpoint={endpoint}"
    try:
        names = os.listdir(endpoint_dir)
    except (FileNotFoundError, NotADirectoryError):
        return None
    best: date | None = None
    for name in names:
        if not name.startswith("ds=") or name.startswith((".", "_")):
            continue
        try:
            d = date.fromisoformat(name[3:])
        except ValueError:
            continue  # warn-and-skip semantics: malformed ds dirs ignored
        if best is None or d > best:
            best = d
    return best


def daily_ranges(start: date, end: date) -> list[tuple[date, date]]:
    """Closed daily slices [d, d] from start to end inclusive — the driver
    loop of the reference's get_daily_ranges (src/config/endpoints.py:19-34).
    Day boundaries are handled half-open downstream (SURVEY §7 decision 1).
    """
    out = []
    d = start
    while d <= end:
        out.append((d, d))
        d += timedelta(days=1)
    return out


def resume_start(watermark: date | None, today: date) -> date:
    """Where to resume fetching: day after the watermark, or the 730-day
    cold-start backfill window (reference src/main.py:195-209, :204)."""
    if watermark is None:
        return today - timedelta(days=COLD_START_DAYS)
    return watermark + timedelta(days=1)


def refresh_incremental(
    spark: SparkSession,
    layout: LakeLayout,
    table_path: str,
    since_ds: str,
    **refresh_kwargs,
) -> None:
    """Incremental warehouse refresh: only lake partitions with ds >=
    ``since_ds`` are read (partition pruning — zero IO on older days) and
    only those partitions are overwritten (dynamic overwrite). This is the
    reference's watermark-resume generalized to the load side: where the
    reference truncate-reloads ALL history every run
    (src/utils/bigquery_helper.py:120, src/main.py:254-255), this touches
    O(new days) regardless of table age.
    """
    import pyspark.sql.functions as F

    from .lake import read_lake, refresh_table

    lake_df = read_lake(spark, layout).filter(F.col("ds") >= since_ds)
    refresh_table(lake_df, table_path, **refresh_kwargs)
