"""Multimodal column plumbing (driver [X] tier: image/audio/video as opaque
binary columns with typed metadata).

The Spark-side contract is fully real: binary payload column + metadata
struct, Arrow-batched mapInPandas feature extraction, deterministic
partitioning. Only the actual media DECODE is stubbed — the image/audio
libraries are not in this container — behind ``_decode_image``: it
raises NotImplementedError unless PIL is importable, and the default
pipeline uses ``deterministic_fake=True`` which derives plausible features
from a content hash instead (clearly marked, reproducible, testable).

At 100 TB the shape matters more than the decode: payloads stay opaque
bytes end-to-end (never parsed by Catalyst), batches flow through Arrow
with ``maxRecordsPerBatch`` bounding worker memory, and feature extraction
parallelizes per-partition with zero shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("content_sha", T.StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fixture adapter: treat document text bytes as an opaque media payload
    with typed metadata — the schema shape a real multimodal table has
    (payload binary, media_type, n_bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _decode_image(payload: bytes) -> tuple[int, int, str]:
    """REAL decode path — requires an imaging library absent from this
    container. Plumbing is exercised via the deterministic fake."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media decode requires PIL/pillow, not available in this environment; "
            "use deterministic_fake=True"
        ) from e
    img = Image.open(io.BytesIO(payload))
    return img.width, img.height, img.format or "unknown"


def _fake_features(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in: width/height/format derived from content
    hash — stable across runs/executors, so tests can assert exact values."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    fmt = ["png", "jpeg", "webp"][h[2] % 3]
    return width, height, fmt


def extract_media_features(
    media: DataFrame, deterministic_fake: bool = True, batch_size_hint: int = 1024
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas — the real distributed plumbing (schema, batching, no
    shuffle); only the pixel decode is faked/stubbed."""
    import pandas as pd

    from ..functions.pickling import ship_module_by_value

    ship_module_by_value(__name__)

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, media_type, n_bytes in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"], pdf["n_bytes"]
            ):
                data = bytes(payload)
                if deterministic_fake:
                    w, h, fmt = _fake_features(data)
                else:
                    w, h, fmt = _decode_image(data)
                rows.append(
                    (
                        int(doc_id),
                        media_type,
                        int(n_bytes),
                        w,
                        h,
                        fmt,
                        hashlib.sha256(data).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "width",
                    "height",
                    "format",
                    "content_sha",
                ],
            )

    return media.mapInPandas(work, FEATURE_SCHEMA)
