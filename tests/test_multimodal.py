"""Real netpbm decode + exact feature statistics: the decoder must parse
spec-conformant headers (whitespace/comments), invert the PGM encoder the
registry query builds, and refuse codec-requiring formats honestly."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from entity_matchers_spark.operators.multimodal import (
    decode_image,
    image_features,
)


def _pgm(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    return f"P5\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def test_decode_pgm_roundtrip():
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, size=(7, 5), dtype=np.uint8)
    got = decode_image(_pgm(arr))
    assert got.shape == (7, 5)
    assert np.array_equal(got, arr)


def test_decode_ppm_color():
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
    payload = b"P6\n6 4\n255\n" + arr.tobytes()
    got = decode_image(payload)
    assert got.shape == (4, 6, 3)
    assert np.array_equal(got, arr)


def test_decode_header_comments_and_whitespace():
    arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
    payload = b"P5 # magic comment\n# full-line comment\n 4\t3 # dims\n255\n" + arr.tobytes()
    got = decode_image(payload)
    assert np.array_equal(got, arr)
    # raster may legally START with a whitespace-like byte: the header ends
    # after exactly ONE whitespace byte, so pixel value 0x0A must survive
    arr2 = np.full((2, 2), 0x0A, dtype=np.uint8)
    assert np.array_equal(decode_image(b"P5\n2 2\n255\n" + arr2.tobytes()), arr2)


def test_decode_refuses_codec_formats_and_truncation():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0JFIF")  # JPEG needs a codec
    with pytest.raises(NotImplementedError):
        decode_image(b"P4\n4 4\n")  # bitmap PBM unsupported
    with pytest.raises(ValueError):
        decode_image(b"P5\n4 4\n255\n\x00\x01")  # truncated raster


def test_image_features_exact_stats():
    arr = np.array([[0, 255], [10, 10]], dtype=np.uint8)
    w, h, c, mean, std, mn, mx, med = image_features(arr)
    assert (w, h, c) == (2.0, 2.0, 1.0)
    flat = arr.reshape(-1).astype(np.int64)
    n, s, sq = flat.size, int(flat.sum()), int((flat * flat).sum())
    assert mean == s / n
    assert std == float(np.sqrt((n * sq - s * s) / (n * n)))
    assert (mn, mx) == (0.0, 255.0)
    assert med == 10.0  # (10 + 10) / 2


def test_extract_media_features_real_decode_spark(spark):
    """End-to-end: Spark-built PGM payloads -> mapInPandas real decode ->
    features equal a local replay; digest is md5 of the exact payload."""
    from pyspark.sql import functions as F

    from entity_matchers_spark.operators.multimodal import (
        extract_media_features,
        pgm_media_from_documents,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "a" * 100), (3, "")],
        "doc_id long, text string",
    )
    media = pgm_media_from_documents(docs)
    rows = {r.media_id: r for r in extract_media_features(media, real_decode=True).collect()}
    for doc_id, text in [(1, "hello world"), (2, "a" * 100), (3, "")]:
        digest = hashlib.md5(text.encode()).digest()
        payload = b"P5\n16 16\n255\n" + digest * 16
        assert rows[doc_id].digest == hashlib.md5(payload).hexdigest()
        assert rows[doc_id].n_bytes == len(payload)
        want = image_features(decode_image(payload))
        assert list(rows[doc_id].feature) == want
