"""Lineage enrichment (SURVEY §2.2 P1).

The reference appends three lineage fields to every record before landing
it (reference src/main.py:33-40): ``gcs_uri`` (the blob path the record
will be written to), ``ingestion_timestamp`` (ISO-8601Z, computed ONCE per
page — batch-constant, src/main.py:35), ``source_system`` ('VMHUB').

The batch-constant timestamp is preserved deliberately (SURVEY §7 decision
3): a per-row current_timestamp() would differ within a batch and break the
reference's lineage semantics (all records of a page share one instant).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def batch_instant() -> str:
    """One ISO-8601Z instant for a whole ingest batch (src/main.py:35)."""
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def enrich_lineage(
    df: DataFrame,
    uri: Column | str | None = None,
    ingestion_timestamp: str | None = None,
    source_system: str = "VMHUB",
) -> DataFrame:
    """Append the lineage envelope.

    ``uri``: a Column (e.g. a computed path), a literal string, or None to
    use ``input_file_name()`` (the natural Spark lineage for file-sourced
    data). ``ingestion_timestamp`` defaults to one instant captured NOW for
    the whole batch.
    """
    if uri is None:
        uri_col = F.input_file_name()
    elif isinstance(uri, str):
        uri_col = F.lit(uri)
    else:
        uri_col = uri
    ts = ingestion_timestamp or batch_instant()
    return (
        df.withColumn("gcs_uri", uri_col)
        .withColumn("ingestion_timestamp", F.lit(ts))
        .withColumn("source_system", F.lit(source_system))
    )
