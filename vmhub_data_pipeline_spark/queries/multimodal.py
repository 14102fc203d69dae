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


_FORMAT_DETECT_ORACLE = r"""
WITH p AS (
  SELECT
    doc_id,
    CASE CAST(doc_id % 6 AS INTEGER)
      WHEN 0 THEN '\x89PNG'::BLOB
      WHEN 1 THEN '\xFF\xD8\xFF\xE0'::BLOB
      WHEN 2 THEN 'GIF8'::BLOB
      WHEN 3 THEN '%PDF'::BLOB
      WHEN 4 THEN 'RIFF\x00\x00\x00\x00WEBP'::BLOB
      ELSE 'ID3\x03'::BLOB
    END || encode(text) AS payload
  FROM documents
),
h AS (
  SELECT doc_id, payload, UPPER(SUBSTR(HEX(payload), 1, 24)) AS head
  FROM p
)
SELECT
  doc_id,
  CASE
    WHEN head LIKE '89504E47%' THEN 'png'
    WHEN head LIKE 'FFD8FF%' THEN 'jpeg'
    WHEN head LIKE '47494638%' THEN 'gif'
    WHEN head LIKE '25504446%' THEN 'pdf'
    WHEN head LIKE '52494646%' AND SUBSTR(head, 17, 8) = '57454250' THEN 'webp'
    WHEN head LIKE '52494646%' AND SUBSTR(head, 17, 8) = '57415645' THEN 'wave'
    WHEN head LIKE '52494646%' THEN 'riff-unknown'
    WHEN head LIKE '494433%' THEN 'mp3'
    ELSE 'unknown'
  END AS detected,
  CAST(OCTET_LENGTH(payload) AS BIGINT) AS n_bytes
FROM h
"""


@register("multimodal_format_detect", oracle=_FORMAT_DETECT_ORACLE, tags=("multimodal",))
def multimodal_format_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL format detection: payloads get genuine magic-byte prefixes
    (attach_magic_payload), and detection reads the BYTES — a JVM-side hex
    sniff with RIFF container disambiguation — never the metadata. Unlike
    multimodal_features (stubbed pixel decode, rows-only), this is fully
    oracle-checked: DuckDB builds byte-identical payloads and sniffs them
    with the same prefix logic."""
    from ..operators.multimodal import attach_magic_payload, sniff_format

    (docs,) = load(spark, sf_dir, "documents")
    media = attach_magic_payload(docs, "doc_id", "text")
    return media.select(
        "doc_id",
        sniff_format(F.col("payload")).alias("detected"),
        F.length("payload").cast("long").alias("n_bytes"),
    )


_DECODE_DIMS_ORACLE = """
SELECT
  doc_id,
  CAST(OCTET_LENGTH(ENCODE(text)) % 300 + 1 AS INTEGER) AS width,
  CAST((OCTET_LENGTH(ENCODE(text)) * 7) % 300 + 1 AS INTEGER) AS height,
  'bmp' AS format,
  CAST(26 + OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes
FROM documents
"""


@register("multimodal_decode_dims", oracle=_DECODE_DIMS_ORACLE, tags=("multimodal",))
def multimodal_decode_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel-header decode, end-to-end and oracle-checked: payloads are
    genuine BMP files built byte-by-byte JVM-side (attach_bmp_payload), and
    the extractor runs with deterministic_fake=False, so width/height come
    from ``decode_header`` PARSING the int32-LE header fields out of the
    payload bytes in the Arrow batch path — the same code path a real
    image-corpus pipeline uses, minus only the compressed-format branch.
    The oracle recomputes the dimensions from the construction rule; a hash
    match proves the byte round-trip (build -> parse) is exact."""
    from ..operators.multimodal import attach_bmp_payload

    (docs,) = load(spark, sf_dir, "documents")
    media = attach_bmp_payload(docs, "doc_id", "text")
    feats = extract_media_features(media, deterministic_fake=False)
    return feats.select("doc_id", "width", "height", "format", "n_bytes")


_CHUNK_ORACLE = r"""
WITH p AS (
  SELECT
    doc_id,
    CASE CAST(doc_id % 6 AS INTEGER)
      WHEN 0 THEN '\x89PNG'::BLOB
      WHEN 1 THEN '\xFF\xD8\xFF\xE0'::BLOB
      WHEN 2 THEN 'GIF8'::BLOB
      WHEN 3 THEN '%PDF'::BLOB
      WHEN 4 THEN 'RIFF\x00\x00\x00\x00WEBP'::BLOB
      ELSE 'ID3\x03'::BLOB
    END || encode(text) AS payload
  FROM documents
),
hx AS (
  SELECT doc_id, UPPER(HEX(payload)) AS h, OCTET_LENGTH(payload) AS nb FROM p
),
sampled AS (
  SELECT doc_id, h, UNNEST(generate_series(
    0, CAST(CEIL(nb / 64.0) AS BIGINT) - 1, 2
  )) AS chunk_idx
  FROM hx
)
SELECT
  doc_id,
  chunk_idx,
  chunk_idx * 64 AS chunk_offset,
  CAST(LENGTH(SUBSTR(h, chunk_idx * 128 + 1, 128)) / 2 AS BIGINT) AS chunk_bytes,
  MD5(SUBSTR(h, chunk_idx * 128 + 1, 128)) AS chunk_md5
FROM sampled
"""


@register("multimodal_chunk_sample", oracle=_CHUNK_ORACLE, tags=("multimodal",))
def multimodal_chunk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stand-in over REAL bytes: every 2nd 64-byte window of
    each magic-prefixed payload, fingerprinted — pure JVM slicing, fully
    oracle-checked (DuckDB builds byte-identical payloads and slices the
    same windows). The shape a video pipeline uses to cheaply sample
    key-frame candidates before the expensive decode."""
    from ..operators.multimodal import attach_magic_payload, sample_chunks

    (docs,) = load(spark, sf_dir, "documents")
    media = attach_magic_payload(docs, "doc_id", "text")
    return sample_chunks(media, "doc_id", "payload", chunk_size=64, every_k=2)


# REAL pixel decode end-to-end: genuine binary P6 PPMs are built JVM-side
# (ASCII header + raw RGB bytes), the Arrow batch path parses the header
# and decodes the pixel array with numpy — no imaging library — and the
# oracle recomputes every channel mean from the construction rule. The
# hash match proves build -> serialize -> parse -> decode -> aggregate is
# byte-faithful at every step.
_PPM_PIXEL_ORACLE = """
WITH p AS (
  SELECT doc_id, text, strlen(text) AS nb FROM documents
),
dims AS (
  SELECT doc_id, text,
    CAST(4 AS INTEGER) AS width,
    CAST(nb // 12 AS INTEGER) AS height,
    (nb // 12) * 12 AS npx_bytes
  FROM p WHERE nb >= 12
)
SELECT
  doc_id, width, height,
  ROUND(CAST(list_aggregate(list_transform(range(1, npx_bytes + 1, 3),
          i -> ascii(text[i])), 'sum') AS BIGINT)
        / (width * height * 1.0e0), 4) AS mean_r,
  ROUND(CAST(list_aggregate(list_transform(range(2, npx_bytes + 1, 3),
          i -> ascii(text[i])), 'sum') AS BIGINT)
        / (width * height * 1.0e0), 4) AS mean_g,
  ROUND(CAST(list_aggregate(list_transform(range(3, npx_bytes + 1, 3),
          i -> ascii(text[i])), 'sum') AS BIGINT)
        / (width * height * 1.0e0), 4) AS mean_b
FROM dims
"""


@register("multimodal_pixel_stats", oracle=_PPM_PIXEL_ORACLE, tags=("multimodal",))
def multimodal_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image RGB channel means from a REAL pixel decode: binary P6 PPMs
    (built byte-by-byte JVM-side) are parsed and decoded with numpy inside
    the Arrow batch path — header tokenization, dimension extraction, and
    the (h*w, 3) pixel view are all computed from the payload BYTES, no
    imaging library, no metadata ride-along.

    Scale shape: decode runs mapInPandas per partition, zero shuffle; the
    payload never transits Catalyst as anything but opaque binary, and the
    driver only ever sees 6 scalars per image. Channel sums are exact
    integer math (max 255 * n_pixels), so the means — the only division —
    hash-match the oracle's recomputation exactly."""
    from ..operators.multimodal import attach_ppm_payload, extract_pixel_stats

    (docs,) = load(spark, sf_dir, "documents")
    media = attach_ppm_payload(docs, "doc_id", "text")
    stats = extract_pixel_stats(media)
    return stats.select(
        "doc_id",
        "width",
        "height",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"),
    )


_AUDIO_ORACLE = """
SELECT
  doc_id,
  'wav' AS format,
  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 8000
            WHEN doc_id % 3 = 1 THEN 16000
            ELSE 44100 END AS BIGINT) AS sample_rate,
  CAST((doc_id % 2) * 8 + 8 AS BIGINT) AS bits_per_sample,
  CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS data_bytes,
  CAST((OCTET_LENGTH(ENCODE(text)) * 8 * 1000)
       // (CASE WHEN doc_id % 3 = 0 THEN 8000
                WHEN doc_id % 3 = 1 THEN 16000
                ELSE 44100 END
           * (doc_id % 2 + 1) * ((doc_id % 2) * 8 + 8)) AS BIGINT) AS duration_ms
FROM documents
"""


@register("multimodal_audio_stats", oracle=_AUDIO_ORACLE, tags=("multimodal",))
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-header decode, end-to-end and oracle-checked: payloads
    are genuine canonical 44-byte RIFF/WAVE PCM files built byte-by-byte
    JVM-side (attach_wav_payload), and every audio parameter — channels,
    sample rate, bit depth, data size, integer duration — is recovered by
    PARSING the little-endian header fields out of the payload bytes with
    scan-side JVM expressions (decode_wav_header); nothing rides along as
    metadata. The oracle recomputes the parameters from the construction
    rule, so a hash match proves the byte round-trip (build -> parse) is
    exact. Zero shuffle: the whole build+decode is one projection."""
    from ..operators.multimodal import attach_wav_payload, decode_wav_header

    (docs,) = load(spark, sf_dir, "documents")
    media = attach_wav_payload(docs, "doc_id", "text")
    return decode_wav_header(media)


_VIDEO_ORACLE = """
SELECT
  doc_id,
  CAST(doc_id % 5 + 1 AS BIGINT) AS n_frames,
  CAST(OCTET_LENGTH(ENCODE(text)) + 6 AS BIGINT) AS frame_bytes,
  CAST((doc_id % 5 + 1) * (OCTET_LENGTH(ENCODE(text)) + 6) AS BIGINT) AS total_bytes
FROM documents
"""


@register("multimodal_video_frames", oracle=_VIDEO_ORACLE, tags=("multimodal",))
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame census on a video stand-in: payloads are MJPEG-style
    concatenations of genuine JPEG SOI/APP0-marked frames
    (attach_mjpeg_payload), and the frame count is recovered by PARSING
    the marker bytes out of the stream (count_mjpeg_frames) — completing
    the byte-parsing triad (BMP/PPM pixels, WAV audio params, MJPEG
    frames). Oracle recomputes from the construction rule; hash match
    proves the byte round-trip. One projection, zero shuffle."""
    from ..operators.multimodal import attach_mjpeg_payload, count_mjpeg_frames

    (docs,) = load(spark, sf_dir, "documents")
    media = attach_mjpeg_payload(docs, "doc_id", "text")
    return count_mjpeg_frames(media)


# Frame-level audio analysis (r5): after multimodal_audio_stats proved the
# WAV header round-trip, this one analyses the SAMPLES — windowed PCM
# energy + silence detection parsed out of the data-chunk bytes with nested
# JVM higher-order functions (hex once per row, transform over frames,
# integer fold over samples). The fixture's PCM stand-in is the UTF-8 text,
# so the oracle recomputes every window energy from the ENCODEd BYTES (hex
# slice per byte — NOT ord() over characters, which would diverge from the
# Spark byte parser on any non-ASCII text; ADVICE r5) — all integers, so
# the hash proves the byte-extraction path (offset/stride arithmetic
# included) is exact.
_AUDIO_ENERGY_ORACLE = """
WITH b AS (
  SELECT doc_id, hex(ENCODE(text)) AS hx, OCTET_LENGTH(ENCODE(text)) AS n
  FROM documents
),
pos AS (
  SELECT doc_id, (i - 1) // 16 AS w,
    ('0x' || substr(hx, CAST(2 * i - 1 AS INT), 2))::INT - 128 AS s
  FROM b, UNNEST(RANGE(1, (n // 16) * 16 + 1)) AS t(i)
),
wins AS (
  SELECT doc_id, w, CAST(SUM(s * s) AS BIGINT) AS e
  FROM pos GROUP BY doc_id, w
)
SELECT
  doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_windows,
  CAST(SUM(e) AS BIGINT) AS total_energy,
  CAST(MAX(e) AS BIGINT) AS max_window_energy,
  CAST(SUM(CASE WHEN e < 8000 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent,
  CAST(10000 * SUM(CASE WHEN e < 8000 THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT)
    AS silence_bp
FROM wins
GROUP BY doc_id
"""


@register("multimodal_audio_energy", oracle=_AUDIO_ENERGY_ORACLE, tags=("multimodal",))
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL sample-level audio analysis: windowed PCM energy and silence
    detection computed from the WAV payload's data-chunk BYTES
    (operators/multimodal.py:pcm_window_energy) — byte extraction via the
    le32 data-size field, per-16-sample sum-of-squares energy around the u8
    midpoint, silent-frame count under an 8000 threshold, all in exact
    integer arithmetic. The voice-activity / silence-trim primitive that
    follows header decode in any real audio ingest.

    Scale shape: one hex projection per row then nested higher-order
    folds — no Python, no shuffle, O(bytes) per row; the driver sees 6
    scalars per clip. The oracle recomputes every window from the
    construction rule (PCM stand-in = text bytes, ord() per char), so the
    hash match proves the offset/stride byte math end-to-end."""
    from ..operators.multimodal import attach_wav_payload, pcm_window_energy

    (docs,) = load(spark, sf_dir, "documents")
    media = attach_wav_payload(docs, "doc_id", "text")
    return pcm_window_energy(media, window=16, silence_threshold=8000)
