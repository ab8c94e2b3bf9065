"""Multimodal (binary-payload) columns: schema, partitioning, and
Arrow-batched feature plumbing.

A training-data pipeline at 100 TB carries images/audio/video as opaque
``binary`` columns with typed metadata, processed by vectorized UDFs. The
decode step needs codec libraries this container doesn't ship, so decoding
is STUBBED behind ``NotImplementedError`` — but everything Spark-side is
real and tested: the schema contract, the ``mapInPandas`` batch shape, the
deterministic feature path, and the partition discipline (payload bytes
never pass through a shuffle: features are computed map-side and the
payload column is pruned before any wide operation).
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
    """REAL image decode — requires PIL/libjpeg, not present in this
    container. The pipeline plumbing (schema, batching, pruning) is tested
    through ``fake_features``; swap this in when codecs are available."""
    raise NotImplementedError(
        "image decode requires codec libraries not shipped in this environment; "
        "use extract_media_features(real_decode=False)"
    )


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
    downstream shuffle ever carries bytes. ``real_decode=True`` routes
    through the stubbed codec path (raises in this container)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if real_decode:
                feats = [decode_image(p) for p in payloads]
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


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling *plan* for video payloads: emits (media_id, frame_idx)
    rows for a stub decoder — demonstrates the explode/partition shape
    (frames co-partitioned with their media id) without any codec."""
    n_frames = (F.col("n_bytes") / 1000).cast("long") + 1  # stub: 1 frame per KB
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
