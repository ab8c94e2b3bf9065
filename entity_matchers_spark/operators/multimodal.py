"""Multimodal (binary-payload) columns: schema, partitioning, and
Arrow-batched feature plumbing.

A training-data pipeline at 100 TB carries images/audio/video as opaque
``binary`` columns with typed metadata, processed by vectorized UDFs.
Everything Spark-side is real and tested: the schema contract, the
``mapInPandas`` batch shape, the deterministic feature path, and the
partition discipline (payload bytes never pass through a shuffle:
features are computed map-side and the payload column is pruned before
any wide operation).

Decoding: the netpbm family (binary PGM ``P5`` / PPM ``P6``) is decoded
FOR REAL in pure numpy — header parse (comment/whitespace tolerant per
the spec) + raw pixel reshape, no codec library required — with exact
integer pixel statistics as the feature vector, oracle-verified end to
end (``multimodal_decode`` registry query). Compressed formats
(JPEG/PNG/audio/video) genuinely need codecs this container doesn't ship
and stay honestly stubbed behind ``NotImplementedError``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """REAL image decode for the netpbm family: binary PGM (``P5``,
    returns an (h, w) uint8 array) and binary PPM (``P6``, returns
    (h, w, 3)). Header parsing follows the spec: the magic, width, height
    and maxval tokens are separated by arbitrary whitespace, ``#``
    comments run to end-of-line anywhere between tokens, and exactly one
    whitespace byte separates the maxval from the raster. Only
    maxval <= 255 (one byte per sample) is supported — the format used by
    every netpbm producer in practice.

    Compressed formats (JPEG/PNG/...) require codec libraries not shipped
    in this container and raise ``NotImplementedError`` — route those
    through ``extract_media_features(real_decode=False)``.
    """
    if payload is None or len(payload) < 2 or payload[:1] != b"P":
        raise NotImplementedError(
            "only netpbm P5/P6 payloads are decodable without codec libraries"
        )
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise NotImplementedError(
            f"netpbm magic {magic!r} unsupported (P5/P6 only); compressed "
            "formats need codec libraries not shipped in this environment"
        )
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and comments between header tokens
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated netpbm header")
        tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    if not (0 < maxval <= 255):
        raise NotImplementedError("netpbm maxval > 255 (two-byte samples) unsupported")
    pos += 1  # exactly one whitespace byte before the raster
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    if raster.size < need:
        raise ValueError(f"netpbm raster truncated: {raster.size} < {need}")
    return raster.reshape((h, w, 3)) if channels == 3 else raster.reshape((h, w))


def image_features(arr: "np.ndarray") -> list[float]:
    """FEATURE_DIM exact, engine-reproducible statistics of a decoded
    image: [width, height, channels, mean, population std, min, max,
    median]. Mean/std come from integer sum and sum-of-squares
    (``var = (n·Σx² − (Σx)²) / n²`` — exact integer numerator, one
    correctly-rounded division, one sqrt), median is the average of the
    two middle order statistics — every value bit-reproducible in SQL."""
    h, w = arr.shape[0], arr.shape[1]
    channels = arr.shape[2] if arr.ndim == 3 else 1
    flat = arr.reshape(-1).astype(np.int64)
    n = int(flat.size)
    s = int(flat.sum())
    sq = int((flat * flat).sum())
    mean = s / n
    std = float(np.sqrt((n * sq - s * s) / (n * n)))
    srt = np.sort(flat)
    median = (int(srt[(n - 1) // 2]) + int(srt[n // 2])) / 2.0
    return [
        float(w),
        float(h),
        float(channels),
        mean,
        std,
        float(flat.min()),
        float(flat.max()),
        median,
    ]


def fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in feature extractor: md5 of the payload →
    FEATURE_DIM doubles in [0, 1). Exactly reproducible in any engine
    (byte i of md5 / 255), so the Spark plumbing is oracle-verifiable."""
    digest = hashlib.md5(payload or b"").digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def media_from_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat each document's UTF-8 bytes as an opaque media payload
    with typed metadata — the schema contract real ingest would satisfy."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("text/plain").alias("mime"),
        F.col(text_col).cast("binary").alias("payload"),
        F.length(F.col(text_col).cast("binary")).cast("long").alias("n_bytes"),
    )


def extract_media_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape: Arrow hands each partition as pandas chunks; the payload
    column enters Python exactly once and is DROPPED from the output so no
    downstream shuffle ever carries bytes. ``real_decode=True`` decodes
    each payload with :func:`decode_image` (real for netpbm P5/P6; raises
    for codec-requiring formats) and emits :func:`image_features`;
    ``real_decode=False`` emits the md5-derived stand-in features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if real_decode:
                feats = [image_features(decode_image(p)) for p in payloads]
            else:
                feats = [fake_features(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "digest": [hashlib.md5(p or b"").hexdigest() for p in payloads],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def pgm_media_from_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", side: int = 16
) -> DataFrame:
    """Deterministic binary-PGM payload per document: a ``side × side``
    8-bit grayscale image whose raster is the md5 digest of the text tiled
    to ``side²`` bytes, preceded by a spec-conformant ``P5`` header. Gives
    the real decoder genuine binary images to parse while keeping every
    pixel statistic SQL-derivable from ``md5(text)`` — the oracle
    recomputes the features without parsing, so any decode offset/parse
    error shows up as a value mismatch."""
    assert side * side % 16 == 0
    header = F.lit(f"P5\n{side} {side}\n255\n".encode())
    digest = F.unhex(F.md5(F.col(text_col)))
    raster = F.concat(*[digest] * (side * side // 16))
    payload = F.concat(header, raster)
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/x-portable-graymap").alias("mime"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling *plan* for video payloads: emits (media_id, frame_idx)
    rows for a stub decoder — demonstrates the explode/partition shape
    (frames co-partitioned with their media id) without any codec."""
    n_frames = (F.col("n_bytes") / 1000).cast("long") + 1  # stub: 1 frame per KB
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
