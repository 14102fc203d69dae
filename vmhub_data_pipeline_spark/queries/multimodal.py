"""Multimodal catalog entries — binary-column plumbing as queries.

Rows-only (no oracle): the feature extractor runs through mapInPandas with
a deterministic fake decode (media libs absent from this container — see
operators/multimodal.py); output determinism is asserted in
tests/test_operators.py instead of a SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import attach_binary_payload, extract_media_features
from ..tables import load
from . import register


@register("multimodal_features", oracle=None, tags=("multimodal",))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payloads -> Arrow-batched feature extraction -> per-format
    rollup. The payload column stays opaque bytes end-to-end; only the
    (stubbed) decode sees content."""
    (docs,) = load(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, "doc_id", "text")
    feats = extract_media_features(media)
    return feats.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg(F.col("width") * F.col("height")), 2).alias("avg_pixels"),
    )
