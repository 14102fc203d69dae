"""Multimodal column plumbing (driver [X] tier: image/audio/video as opaque
binary columns with typed metadata).

The Spark-side contract is fully real: binary payload column + metadata
struct, Arrow-batched mapInPandas feature extraction, deterministic
partitioning. Three of the four feature families are REAL computations on
the bytes themselves:

* format detection — magic-byte sniffing as a pure JVM expression
  (``sniff_format``), including RIFF container disambiguation;
* byte statistics — Shannon entropy / mean byte / printable ratio via
  numpy in the Arrow batch path (``byte_stats``);
* content identity — sha256 over the payload.

The pixel/sample DECODE is real for header-parseable formats — BMP, PPM
(P3/P6), PNG (IHDR), and GIF dimensions are extracted by ``decode_header``,
pure byte math on the payload with no imaging library. Only
compressed-pixel formats whose dimensions are not header-determined from
fixed offsets (JPEG scan-segment walking, WEBP VP8 bitstream) still fall
back to PIL behind ``_decode_image``; absent PIL that path raises
NotImplementedError, and ``deterministic_fake=True`` substitutes
hash-derived dimensions (clearly marked, reproducible, testable).

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
        # REAL byte-level features (numpy over the payload, no decode libs):
        T.StructField("entropy", T.DoubleType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("printable_ratio", T.DoubleType()),
    ]
)


def byte_stats(payload: bytes) -> tuple[float, float, float]:
    """Shannon entropy (bits/byte), mean byte value, printable-ASCII ratio —
    genuine content features computable without media libraries; used for
    corpus QA (e.g. truncated/garbage media screens on compressed formats
    whose entropy should be ~8)."""
    import numpy as np

    if not payload:
        return 0.0, 0.0, 0.0
    arr = np.frombuffer(payload, dtype=np.uint8)
    counts = np.bincount(arr, minlength=256)
    p = counts[counts > 0] / arr.size
    entropy = float(-(p * np.log2(p)).sum())
    printable = float(((arr >= 0x20) & (arr < 0x7F)).mean())
    return entropy, float(arr.mean()), printable


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


# Magic-byte prefixes (public file-format signatures). RIFF is a container:
# bytes 9-12 pick the concrete format (WEBP image vs WAVE audio).
MAGIC: dict[str, bytes] = {
    "png": bytes([0x89]) + b"PNG",
    "jpeg": bytes([0xFF, 0xD8, 0xFF, 0xE0]),
    "gif": b"GIF8",
    "pdf": b"%PDF",
    "webp": b"RIFF\x00\x00\x00\x00WEBP",
    "mp3": b"ID3\x03",
}


def attach_magic_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fixture adapter with REAL format signatures: payload = magic-byte
    prefix (chosen by doc_id mod 6) + the document's UTF-8 bytes. Unlike
    ``attach_binary_payload``'s opaque bytes, these payloads carry genuine
    sniffable structure, so format detection downstream is real byte
    inspection, not metadata trust."""
    fmts = list(MAGIC)
    sel = F.pmod(F.col(id_col), F.lit(len(fmts)))
    payload = None
    for i, name in enumerate(fmts):
        branch = F.concat(F.lit(bytearray(MAGIC[name])), F.encode(F.col(text_col), "UTF-8"))
        payload = F.when(sel == i, branch) if payload is None else payload.when(sel == i, branch)
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.length(F.col(text_col)).cast("long").alias("text_chars"),
    )


def _int32_le_hex(v) -> F.Column:
    """int column -> 8 hex chars of its little-endian int32 encoding (pure
    JVM string ops, portable to the DuckDB oracle)."""
    be = F.lpad(F.hex(v), 8, "0")
    return F.concat(
        F.substring(be, 7, 2), F.substring(be, 5, 2), F.substring(be, 3, 2), F.substring(be, 1, 2)
    )


def attach_bmp_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fixture adapter producing REAL decodable BMPs: a 26-byte BITMAPINFO
    header ('BM', sizes/offsets, int32-LE width @18 and height @22 — the
    public BMP layout) with dimensions derived from the text, followed by
    the text bytes as pixel-data stand-in. ``decode_header`` (and any real
    BMP reader) recovers width/height from these payloads by parsing the
    BYTES — nothing rides along as metadata. Construction is JVM
    expressions end-to-end (hex building + unhex), zero Python."""
    nb = F.octet_length(F.col(text_col))
    width = (nb % 300 + 1).cast("int")
    height = ((nb * 7) % 300 + 1).cast("int")
    header_hex = F.concat(
        F.lit("424D"),          # 'BM'
        F.lit("00000000"),      # file size (unused by parsers that trust payload length)
        F.lit("00000000"),      # reserved
        F.lit("1A000000"),      # pixel-data offset = 26
        F.lit("28000000"),      # BITMAPINFOHEADER size = 40
        _int32_le_hex(width),
        _int32_le_hex(height),
    )
    payload = F.concat(F.unhex(header_hex), F.encode(F.col(text_col), "UTF-8"))
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("image/bmp").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def sniff_format(payload) -> F.Column:
    """Detect media format from magic bytes — pure JVM expression (hex of
    the first 12 bytes + CASE), no Python, no decode library. Handles the
    RIFF container correctly: 'RIFF' alone is ambiguous until bytes 9-12
    distinguish WEBP from WAVE."""
    head = F.upper(F.hex(F.substring(payload, 1, 12)))
    riff_tag = F.substring(head, 17, 8)  # hex chars for bytes 9..12
    return (
        F.when(head.startswith("89504E47"), F.lit("png"))
        .when(head.startswith("FFD8FF"), F.lit("jpeg"))
        .when(head.startswith("47494638"), F.lit("gif"))
        .when(head.startswith("25504446"), F.lit("pdf"))
        .when(
            head.startswith("52494646"),
            F.when(riff_tag == "57454250", F.lit("webp"))
            .when(riff_tag == "57415645", F.lit("wave"))
            .otherwise(F.lit("riff-unknown")),
        )
        .when(head.startswith("494433"), F.lit("mp3"))
        .when(head.startswith("424D"), F.lit("bmp"))
        .when(head.startswith("5036") | head.startswith("5033"), F.lit("ppm"))
        .otherwise(F.lit("unknown"))
    )


def decode_header(payload: bytes) -> tuple[int, int, str] | None:
    """REAL dimension decode for header-parseable image formats — pure byte
    math, no imaging library. Returns (width, height, format) or None when
    the format isn't one whose dimensions live at fixed/parseable header
    offsets. Public layouts:

    * BMP  — 'BM', int32-LE width @18, int32-LE height @22 (negative height
      = top-down row order; dimensions reported as magnitudes);
    * PNG  — 8-byte signature, IHDR chunk: uint32-BE width @16, height @20;
    * GIF  — 'GIF87a'/'GIF89a', uint16-LE logical-screen width @6, height @8;
    * PPM  — 'P3'/'P6', ASCII 'width height maxval' with whitespace and
      '#' comments between tokens.
    """
    import re
    import struct

    if len(payload) >= 26 and payload[:2] == b"BM":
        w, h = struct.unpack_from("<ii", payload, 18)
        return abs(w), abs(h), "bmp"
    if len(payload) >= 24 and payload[:4] == b"\x89PNG":
        w, h = struct.unpack_from(">II", payload, 16)
        return w, h, "png"
    if len(payload) >= 10 and payload[:4] in (b"GIF8",):
        w, h = struct.unpack_from("<HH", payload, 6)
        return w, h, "gif"
    if payload[:2] in (b"P3", b"P6"):
        # tokens after magic, skipping '#...' comments to end-of-line
        body = re.sub(rb"#[^\n]*", b"", payload[2:2048])
        toks = body.split()
        if len(toks) >= 2:
            try:
                return int(toks[0]), int(toks[1]), "ppm"
            except ValueError:
                return None
    return None


def _decode_image(payload: bytes) -> tuple[int, int, str]:
    """REAL decode path: header math first (BMP/PNG/GIF/PPM — in-container,
    no dependencies); compressed-pixel formats (JPEG/WEBP) fall back to PIL,
    absent from this container."""
    parsed = decode_header(payload)
    if parsed is not None:
        return parsed
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "non-header-parseable media decode requires PIL/pillow, not available "
            "in this environment; use deterministic_fake=True"
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
                # NULL payloads are a normal corpus-QA case (that's what
                # entropy screens exist for) — emit a flaggable empty-bytes
                # row instead of killing the job with bytes(None)
                data = b"" if payload is None else bytes(payload)
                n_bytes = 0 if pd.isna(n_bytes) else n_bytes
                if deterministic_fake:
                    w, h, fmt = _fake_features(data)
                else:
                    w, h, fmt = _decode_image(data)
                ent, mean_b, printable = byte_stats(data)
                rows.append(
                    (
                        int(doc_id),
                        media_type,
                        int(n_bytes),
                        w,
                        h,
                        fmt,
                        hashlib.sha256(data).hexdigest(),
                        ent,
                        mean_b,
                        printable,
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
                    "entropy",
                    "mean_byte",
                    "printable_ratio",
                ],
            )

    return media.mapInPandas(work, FEATURE_SCHEMA)


def sample_chunks(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    chunk_size: int = 64,
    every_k: int = 2,
) -> DataFrame:
    """Deterministic chunk sampling over an opaque binary payload — the
    frame-sampling shape for video/audio: take every ``every_k``-th
    ``chunk_size``-byte window instead of decoding the container (the
    decode itself stays behind the mapInPandas boundary, see
    extract_media_features).

    Pure JVM expressions end-to-end (sequence -> explode -> substring ->
    fingerprint): zero Python tax, zero shuffle — at 100 TB of media this
    runs at scan speed like the rule filters. Slicing happens in the HEX
    domain (2 chars/byte), which is byte-exact and keeps the expression
    portable to the DuckDB oracle (whose substr has no BLOB overload).
    Output one row per sampled chunk: (id, chunk_idx, chunk_offset,
    chunk_bytes, chunk_md5). A zero-length payload yields zero chunks
    (guarded: Spark's sequence(0, -1, k) raises on the inverted bound
    where SQL generate_series returns empty; explode of the empty array
    drops the row, matching the oracle).
    """
    hx = F.upper(F.hex(F.col(payload_col)))
    n_chunks = F.ceil(F.length(payload_col) / F.lit(chunk_size)).cast("long")
    idx = F.when(
        n_chunks > 0, F.sequence(F.lit(0).cast("long"), n_chunks - 1, F.lit(every_k).cast("long"))
    ).otherwise(F.array().cast("array<bigint>"))
    sampled = df.select(
        F.col(id_col),
        hx.alias("__hx"),
        F.explode(idx).alias("chunk_idx"),
    )
    chunk_hex = F.substring(
        F.col("__hx"), F.col("chunk_idx") * (2 * chunk_size) + 1, F.lit(2 * chunk_size)
    )
    return sampled.select(
        F.col(id_col),
        F.col("chunk_idx"),
        (F.col("chunk_idx") * chunk_size).alias("chunk_offset"),
        (F.length(chunk_hex) / 2).cast("long").alias("chunk_bytes"),
        F.md5(chunk_hex).alias("chunk_md5"),
    )


def attach_ppm_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fixture adapter producing REAL decodable binary P6 PPMs: the ASCII
    header ``P6\\n{w} {h}\\n255\\n`` followed by w*h*3 raw RGB bytes (the
    text's leading bytes — pure ASCII, one byte per char). Any PPM reader
    recovers dimensions AND pixels from the bytes alone. Construction is
    JVM expressions end-to-end; width is fixed at 4 and height derived as
    octet_length div 12 so the pixel block always fits the text with no
    padding byte.
    """
    nb = F.octet_length(F.col(text_col))
    width = F.lit(4)
    height = F.expr(f"octet_length({text_col}) div 12").cast("int")
    header = F.concat_ws(
        "",
        F.lit("P6\n"),
        width.cast("string"),
        F.lit(" "),
        height.cast("string"),
        F.lit("\n255\n"),
    )
    pixels = F.substring(F.col(text_col), 1, 12 * F.expr(f"octet_length({text_col}) div 12"))
    payload = F.concat(F.encode(header, "UTF-8"), F.encode(pixels, "UTF-8"))
    return df.filter(nb >= 12).select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("image/x-portable-pixmap").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def decode_ppm_pixels(payload: bytes) -> tuple[int, int, float, float, float] | None:
    """REAL P6 pixel decode with no imaging library: parse the ASCII header
    (magic, width, height, maxval tokens, then one whitespace byte), view
    the remaining bytes as an (h*w, 3) RGB array, return per-channel means.
    Channel sums are exact integer math; only the final mean divides."""
    import numpy as np

    if not payload.startswith(b"P6"):
        return None
    # header = 4 whitespace-separated tokens; pixel data starts after the
    # single whitespace byte that terminates maxval
    tokens, pos, tok = [], 0, b""
    while pos < len(payload) and len(tokens) < 4:
        ch = payload[pos : pos + 1]
        if ch.isspace():
            if tok:
                tokens.append(tok)
                tok = b""
        else:
            tok += ch
        pos += 1
    if len(tokens) < 4:
        return None
    w, h = int(tokens[1]), int(tokens[2])
    need = w * h * 3
    arr = np.frombuffer(payload[pos : pos + need], dtype=np.uint8)
    if arr.size < need or need == 0:
        return None
    rgb = arr.reshape(-1, 3).astype(np.int64)
    sums = rgb.sum(axis=0)
    npix = float(w * h)
    return w, h, float(sums[0]) / npix, float(sums[1]) / npix, float(sums[2]) / npix


def extract_pixel_stats(media: DataFrame) -> DataFrame:
    """Per-image channel means via Arrow-batched mapInPandas over the binary
    payload — the decode runs where the bytes live (per partition, zero
    shuffle); the driver never sees a pixel."""
    import pandas as pd

    def work(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                dec = decode_ppm_pixels(bytes(payload))
                if dec is None:
                    continue
                w, h, mr, mg, mb = dec
                # raw means — rounding happens in the query layer with
                # F.round (HALF_UP, matching the oracle's ROUND); Python's
                # banker's rounding would flip exact-.5 cases
                out.append((int(doc_id), w, h, mr, mg, mb))
            yield pd.DataFrame(
                out, columns=[f.name for f in PIXEL_STATS_SCHEMA.fields]
            )

    return media.select("doc_id", "payload").mapInPandas(work, PIXEL_STATS_SCHEMA)


def _int16_le_hex(v) -> F.Column:
    """int column -> 4 hex chars of its little-endian int16 encoding."""
    be = F.lpad(F.hex(v), 4, "0")
    return F.concat(F.substring(be, 3, 2), F.substring(be, 1, 2))


def _le_bytes_to_long(payload, pos: int, nbytes: int) -> F.Column:
    """Parse ``nbytes`` little-endian bytes at 1-based ``pos`` of a binary
    column into a long — pure JVM string ops (hex + pair reorder + conv),
    the decode twin of _int32_le_hex/_int16_le_hex."""
    hx = F.hex(F.substring(payload, pos, nbytes))
    be = F.concat(*[F.substring(hx, 2 * i + 1, 2) for i in reversed(range(nbytes))])
    return F.conv(be, 16, 10).cast("long")


def attach_wav_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fixture adapter producing REAL decodable WAVs: the canonical 44-byte
    RIFF/WAVE PCM header (fmt chunk with audioFormat=1, channels, sample
    rate, byte rate, block align, bits per sample; data chunk sized to the
    payload) with parameters derived from the row, followed by the text
    bytes as PCM-sample stand-in. Any real WAV reader recovers the audio
    parameters from these payloads by parsing the BYTES. Construction is
    JVM expressions end-to-end (hex building + unhex), zero Python."""
    did = F.col(id_col)
    nb = F.octet_length(F.col(text_col)).cast("long")
    channels = (did % 2 + 1).cast("int")
    rate = (
        F.when(did % 3 == 0, 8000).when(did % 3 == 1, 16000).otherwise(44100)
    ).cast("int")
    bits = ((did % 2) * 8 + 8).cast("int")  # 8 or 16
    block_align = (channels * bits / 8).cast("int")
    byte_rate = (rate * block_align).cast("int")
    header_hex = F.concat(
        F.lit("52494646"),            # 'RIFF'
        _int32_le_hex(nb + 36),       # chunk size
        F.lit("57415645"),            # 'WAVE'
        F.lit("666D7420"),            # 'fmt '
        F.lit("10000000"),            # fmt chunk size = 16
        F.lit("0100"),                # audioFormat = 1 (PCM)
        _int16_le_hex(channels),
        _int32_le_hex(rate),
        _int32_le_hex(byte_rate),
        _int16_le_hex(block_align),
        _int16_le_hex(bits),
        F.lit("64617461"),            # 'data'
        _int32_le_hex(nb),
    )
    payload = F.concat(F.unhex(header_hex), F.encode(F.col(text_col), "UTF-8"))
    return df.select(
        did.alias("doc_id"),
        payload.alias("payload"),
        F.lit("audio/wav").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def decode_wav_header(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Parse audio parameters out of WAV payload BYTES — scan-side JVM
    expressions, no Python, no audio library: container check (RIFF @1,
    WAVE @9), channels (le16 @23), sample rate (le32 @25), bits per sample
    (le16 @35), data size (le32 @41), and integer duration_ms derived as
    data_bytes * 8000 div (rate * channels * bits)."""
    p = F.col(payload_col)
    is_wav = (F.hex(F.substring(p, 1, 4)) == "52494646") & (
        F.hex(F.substring(p, 9, 4)) == "57415645"
    )
    channels = _le_bytes_to_long(p, 23, 2)
    rate = _le_bytes_to_long(p, 25, 4)
    bits = _le_bytes_to_long(p, 35, 2)
    data_size = _le_bytes_to_long(p, 41, 4)
    return media.select(
        "doc_id",
        F.when(is_wav, F.lit("wav")).otherwise("unknown").alias("format"),
        channels.alias("channels"),
        rate.alias("sample_rate"),
        bits.alias("bits_per_sample"),
        data_size.alias("data_bytes"),
        F.expr(
            f"CAST(({_le_expr(payload_col, 41, 4)} * 8 * 1000) div "
            f"({_le_expr(payload_col, 25, 4)} * {_le_expr(payload_col, 23, 2)} * "
            f"{_le_expr(payload_col, 35, 2)}) AS BIGINT)"
        ).alias("duration_ms"),
    )


def _le_expr(payload_col: str, pos: int, nbytes: int) -> str:
    """SQL-string twin of _le_bytes_to_long for use inside F.expr."""
    pairs = " , ".join(
        f"substring(hex(substring({payload_col}, {pos}, {nbytes})), {2 * i + 1}, 2)"
        for i in reversed(range(nbytes))
    )
    return f"CAST(conv(concat({pairs}), 16, 10) AS BIGINT)"


def attach_mjpeg_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fixture adapter producing a REAL frame-structured video stand-in:
    1 + doc_id % 5 concatenated JPEG frames, each a genuine SOI/APP0 marker
    (FF D8 FF E0), the text bytes as frame payload, and an EOI (FF D9) —
    the MJPEG layout. The text is ASCII (no 0xFF bytes), so frame markers
    are unambiguous in the byte stream and frame counting downstream is
    real byte parsing. JVM expressions end-to-end."""
    frame = F.concat(
        F.unhex(F.lit("FFD8FFE0")), F.encode(F.col(text_col), "UTF-8"),
        F.unhex(F.lit("FFD9")),
    )
    n_frames = (F.col(id_col) % 5 + 1).cast("int")
    payload = F.aggregate(
        F.sequence(F.lit(1), n_frames),
        F.lit(b"").cast("binary"),
        lambda acc, _: F.concat(acc, frame),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("video/x-motion-jpeg").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def count_mjpeg_frames(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Frame census by BYTE parsing: count SOI/APP0 markers at byte-aligned
    offsets — the frame-sample precursor of a video pipeline, scan-side, no
    Python, no codec.

    Byte alignment: a naive substring count over ``hex(payload)`` can match
    a marker starting mid-byte (odd hex offset) when real JPEG entropy data
    contains 0xFF bytes. The hex string is therefore first re-spaced into
    one token per byte (``regexp_replace(hx, '(..)', '$1 ')``), so the
    marker pattern can only ever match on byte boundaries. Occurrences =
    length delta under marker removal div marker width, all JVM-side.

    ``n_frames = 0`` (no SOI marker at all) yields NULL ``frame_bytes``
    rather than a divide-by-zero."""
    # 'FF D8 FF E0 ' — one trailing space per byte token, boundary-safe.
    spaced = F.regexp_replace(F.hex(F.col(payload_col)), "(..)", "$1 ")
    marker = "FF D8 FF E0 "
    n_frames = (
        (F.length(spaced) - F.length(F.replace(spaced, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")
    return media.select(
        "doc_id",
        n_frames.alias("n_frames"),
        F.when(
            n_frames > 0,
            (F.length(F.col(payload_col)).cast("long") / n_frames).cast("long"),
        ).alias("frame_bytes"),
        F.length(F.col(payload_col)).cast("long").alias("total_bytes"),
    )


def pcm_window_energy(
    media: DataFrame,
    window: int = 16,
    silence_threshold: int = 8000,
    payload_col: str = "payload",
) -> DataFrame:
    """Windowed PCM energy / silence detection parsed from WAV payload
    BYTES — the frame-level signal-analysis step after `decode_wav_header`'s
    parameter parse: the data chunk (offset 45, length = le32@41) is
    re-extracted from the payload, each byte read as an unsigned 8-bit
    sample, and per-window sum-of-squares energy around the u8 midpoint
    (s-128)² computed for every non-overlapping ``window``-sample frame.
    A frame with energy below ``silence_threshold`` counts as silent — the
    trim-leading/trailing-silence and voice-activity primitive.

    Pure JVM end-to-end: the data chunk is hexed ONCE per row into a
    projection column, then nested higher-order functions (transform over
    frames, aggregate over samples) fold the energies — no Python, no
    audio library, zero shuffle, O(data bytes) per row. Multi-byte-depth
    payloads are analysed at byte grain deliberately (a 16-bit stream's
    byte energy is a monotone proxy; production branches on
    bits_per_sample with the same plan shape). Rows with fewer than one
    full frame are dropped (nothing to analyse).
    """
    p = payload_col
    data_size = _le_bytes_to_long(F.col(p), 41, 4)
    w = int(window)
    stage = media.select(
        "doc_id",
        F.hex(F.expr(f"substring({p}, 45, {_le_expr(p, 41, 4)})")).alias("hx"),
        (data_size / w).cast("long").alias("n_windows"),
    ).where(F.col("n_windows") >= 1)
    samples = F.transform(
        F.sequence(F.lit(1), (F.col("n_windows") * w).cast("int")),
        lambda i: F.conv(
            F.substring(F.col("hx"), ((i - 1) * 2 + 1).cast("int"), 2), 16, 10
        ).cast("long")
        - 128,
    )
    energies = F.transform(
        F.sequence(F.lit(0), (F.col("n_windows") - 1).cast("int")),
        lambda win: F.aggregate(
            F.slice(F.col("ss"), (win * w + 1).cast("int"), w),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x * x,
        ),
    )
    st = F.lit(int(silence_threshold)).cast("long")
    out = stage.select("doc_id", "n_windows", samples.alias("ss")).select(
        "doc_id", "n_windows", energies.alias("es")
    )
    return out.select(
        "doc_id",
        "n_windows",
        F.aggregate("es", F.lit(0).cast("long"), lambda a, b: a + b).alias(
            "total_energy"
        ),
        F.array_max("es").cast("long").alias("max_window_energy"),
        F.size(F.filter("es", lambda e: e < st)).cast("long").alias("n_silent"),
    ).withColumn(
        "silence_bp", F.expr("CAST(10000 * n_silent div n_windows AS BIGINT)")
    )
