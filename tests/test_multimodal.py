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


def _wav(samples: np.ndarray, rate: int = 8000, bits: int = 8, channels: int = 1,
         extra_chunk: bytes = b"") -> bytes:
    data = samples.tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * bits // 8).to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + extra_chunk
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_decode_wav_pcm8_roundtrip():
    from entity_matchers_spark.operators.multimodal import decode_audio

    rng = np.random.RandomState(5)
    s = rng.randint(0, 256, size=37, dtype=np.uint8)
    got, rate = decode_audio(_wav(s))
    assert rate == 8000 and np.array_equal(got, s)


def test_decode_wav_pcm16_stereo_and_chunk_walk():
    from entity_matchers_spark.operators.multimodal import decode_audio

    rng = np.random.RandomState(6)
    s = rng.randint(-32768, 32768, size=(20, 2)).astype("<i2")
    # odd-sized LIST chunk before data: must be skipped WITH its pad byte
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    got, rate = decode_audio(_wav(s.reshape(-1), rate=44100, bits=16,
                                  channels=2, extra_chunk=extra))
    assert rate == 44100 and got.shape == (20, 2)
    assert np.array_equal(got, s)


def test_decode_wav_refuses_compressed():
    from entity_matchers_spark.operators.multimodal import decode_audio

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_audio(b"\xff\xfb\x90\x00mp3")  # MP3 frame header
    fmt = (85).to_bytes(2, "little") + (1).to_bytes(2, "little") + (8000).to_bytes(4, "little") \
        + (8000).to_bytes(4, "little") + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt \
        + b"data" + (2).to_bytes(4, "little") + b"ab"
    with _pytest.raises(NotImplementedError):  # WAVE container, MP3 codec inside
        decode_audio(b"RIFF" + len(body).to_bytes(4, "little") + body)


def test_audio_features_exact():
    from entity_matchers_spark.operators.multimodal import audio_features

    s = np.array([128, 130, 126, 128, 200], dtype=np.uint8)  # amp 0,2,-2,0,72
    n_frames, ch, rate, mean, rms, mn, mx, zc = audio_features(s, 8000)
    assert (n_frames, ch, rate) == (5.0, 1.0, 8000.0)
    amp = s.astype(np.int64) - 128
    assert mean == int(amp.sum()) / 5
    assert rms == float(np.sqrt(int((amp * amp).sum()) / 5))
    assert (mn, mx) == (-2.0, 72.0)
    assert zc == 1.0  # only the strict 2 -> -2 flip


def _y4m(frames: list[np.ndarray], chroma: str = "mono") -> bytes:
    h, w = frames[0].shape
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{chroma}\n".encode()]
    for f in frames:
        out.append(b"FRAME\n")
        out.append(f.astype(np.uint8).tobytes())
        if chroma.startswith("420"):
            out.append(bytes(w * h // 2))  # U+V planes
    return b"".join(out)


def test_decode_y4m_mono_roundtrip():
    from entity_matchers_spark.operators.multimodal import decode_y4m

    rng = np.random.RandomState(9)
    frames = [rng.randint(0, 256, (6, 4), dtype=np.uint8) for _ in range(3)]
    got = decode_y4m(_y4m(frames))
    assert got.shape == (3, 6, 4)
    for k in range(3):
        assert np.array_equal(got[k], frames[k])


def test_decode_y4m_420_luma_only():
    from entity_matchers_spark.operators.multimodal import decode_y4m

    rng = np.random.RandomState(10)
    frames = [rng.randint(0, 256, (4, 4), dtype=np.uint8) for _ in range(2)]
    got = decode_y4m(_y4m(frames, chroma="420jpeg"))
    assert got.shape == (2, 4, 4)
    for k in range(2):
        assert np.array_equal(got[k], frames[k])


def test_decode_y4m_refusals():
    from entity_matchers_spark.operators.multimodal import decode_y4m

    with pytest.raises(NotImplementedError):
        decode_y4m(b"\x00\x00\x00\x18ftypmp42")  # MP4 needs a codec
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 H4 Cmono\nFRAME\n\x00\x01")  # truncated


def test_sample_frame_stats_spark(spark):
    """End-to-end: Spark-built y4m clips -> real container parse ->
    every-2nd-frame stats equal a local replay."""
    from entity_matchers_spark.operators.multimodal import (
        decode_y4m,
        sample_frame_stats,
        y4m_media_from_documents,
    )

    docs = spark.createDataFrame(
        [(1, "clip one"), (2, "clip two")], "doc_id long, text string"
    )
    media = y4m_media_from_documents(docs)
    got = {
        (r.media_id, r.frame_idx): (r.n_frames, r.mean, r.minv, r.maxv)
        for r in sample_frame_stats(media, every_n=2).collect()
    }
    assert set(got) == {(1, 0), (1, 2), (2, 0), (2, 2)}
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    for (mid, idx), (nf, mean, mn, mx) in got.items():
        frames = decode_y4m(payloads[mid])
        assert nf == frames.shape[0] == 4
        flat = frames[idx].reshape(-1).astype(np.int64)
        assert mean == int(flat.sum()) / flat.size
        assert (mn, mx) == (float(flat.min()), float(flat.max()))


def test_decoders_roundtrip_hypothesis():
    """Property: for ANY dimensions, pixel/sample values, header comment
    placement and chroma mode, encode -> decode is the identity on the
    payload the decoder claims to support."""
    from hypothesis import given, settings, strategies as st

    from entity_matchers_spark.operators.multimodal import (
        decode_audio,
        decode_image,
        decode_y4m,
    )

    dims = st.tuples(st.integers(1, 12), st.integers(1, 12))
    seeds = st.integers(0, 2**31 - 1)

    @settings(max_examples=60, deadline=None)
    @given(dims=dims, seed=seeds, color=st.booleans(), comment=st.booleans())
    def pgm_case(dims, seed, color, comment):
        h, w = dims
        rng = np.random.RandomState(seed)
        shape = (h, w, 3) if color else (h, w)
        arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
        magic = b"P6" if color else b"P5"
        hdr = magic + (b" # c\n" if comment else b"\n") + f"{w} {h}\n255\n".encode()
        got = decode_image(hdr + arr.tobytes())
        assert got.shape == shape and np.array_equal(got, arr)

    @settings(max_examples=60, deadline=None)
    @given(n=st.integers(1, 64), seed=seeds, bits=st.sampled_from([8, 16]),
           channels=st.integers(1, 2), rate=st.integers(1, 96000))
    def wav_case(n, seed, bits, channels, rate):
        rng = np.random.RandomState(seed)
        if bits == 8:
            s = rng.randint(0, 256, size=n * channels, dtype=np.uint8)
        else:
            s = rng.randint(-32768, 32768, size=n * channels).astype("<i2")
        got, r = decode_audio(_wav(s, rate=rate, bits=bits, channels=channels))
        assert r == rate
        want = s.reshape(-1, channels) if channels > 1 else s
        assert np.array_equal(got, want)

    @settings(max_examples=40, deadline=None)
    @given(dims=dims, seed=seeds, nf=st.integers(0, 5), c420=st.booleans())
    def y4m_case(dims, seed, nf, c420):
        h, w = dims
        if c420 and (h % 2 or w % 2):
            h, w = h + h % 2, w + w % 2  # 420 needs even dims
        rng = np.random.RandomState(seed)
        frames = [rng.randint(0, 256, (h, w), dtype=np.uint8) for _ in range(nf)]
        payload = _y4m(frames or [np.zeros((h, w), np.uint8)], chroma="420" if c420 else "mono")
        if not frames:
            payload = payload.split(b"FRAME\n")[0]
        got = decode_y4m(payload)
        assert got.shape == (len(frames), h, w)
        for k, f in enumerate(frames):
            assert np.array_equal(got[k], f)

    pgm_case()
    wav_case()
    y4m_case()


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


def test_decode_degenerate_payloads_raise():
    """Spec-parseable but degenerate payloads must fail loudly (ValueError)
    instead of dividing by zero in the feature stage or silently decoding a
    truncated chunk into plausible statistics."""
    import pytest

    from entity_matchers_spark.operators.multimodal import (
        decode_audio,
        decode_image,
    )

    # 0-pixel rasters
    with pytest.raises(ValueError, match="empty netpbm raster"):
        decode_image(b"P5\n0 4\n255\n")
    with pytest.raises(ValueError, match="empty netpbm raster"):
        decode_image(b"P6\n3 0\n255\n")
    # empty data chunk
    with pytest.raises(ValueError, match="empty WAVE data chunk"):
        decode_audio(_wav(np.empty(0, dtype=np.uint8)))
    # stereo data chunk shorter than one frame -> zero frames
    with pytest.raises(ValueError, match="empty WAVE data chunk"):
        decode_audio(_wav(np.zeros(1, dtype="<i2"), bits=16, channels=2))
    # declared chunk size overruns the buffer: corrupt, not truncate-and-go
    good = _wav(np.arange(16, dtype=np.uint8))
    corrupt = good[:-4]  # data chunk now overruns
    with pytest.raises(ValueError, match="overruns payload"):
        decode_audio(corrupt)
