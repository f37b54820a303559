"""Unit tests for the pure-numpy media codecs (operators/codecs.py) and
their mapInPandas integration."""

from __future__ import annotations

import numpy as np
import pytest

from platform_etl_backend_spark.operators import codecs as C


def _pixels(h=4, w=8):
    return (np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3) * 3) % 256


def test_ppm_roundtrip():
    px = _pixels()
    assert np.array_equal(C.decode_ppm(C.encode_ppm(px)), px)


def test_ppm_header_whitespace_and_comments():
    px = _pixels(2, 3)
    raw = px.astype(np.uint8).tobytes()
    payload = b"P6 # comment\n# another comment\n 3\t2 \n255\n" + raw
    assert np.array_equal(C.decode_ppm(payload), px)


def test_ppm_rejects_bad_magic_and_truncation():
    with pytest.raises(ValueError, match="P6"):
        C.decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 12)
    with pytest.raises(ValueError, match="truncated raster"):
        C.decode_ppm(b"P6\n2 2\n255\n" + b"\x00" * 5)
    with pytest.raises(ValueError, match="maxval"):
        C.decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 3)


def test_resize_nearest():
    px = _pixels(4, 8)
    small = C.resize_nearest(px, 2, 4)
    assert small.shape == (2, 4, 3)
    assert np.array_equal(small[0, 0], px[0, 0])
    up = C.resize_nearest(px, 8, 16)
    assert up.shape == (8, 16, 3)
    assert np.array_equal(up[::2, ::2], px)


def test_wav_roundtrip_and_features():
    s = np.array([0, 1000, -1000, 32767, -32768, 0, 5], dtype=np.int16)
    sr, ch, back = C.decode_wav(C.encode_wav(s, sample_rate=44100))
    assert (sr, ch) == (44100, 1)
    assert np.array_equal(back, s)
    f = C.audio_features(back)
    assert f["n_samples"] == 7
    # strict sign-product crossings: 1000→-1000 and -1000→32767 and 32767→-32768
    assert f["zero_crossings"] == 3
    assert f["rms"] == pytest.approx(
        float(np.sqrt((s.astype(np.int64) ** 2).sum() / 7))
    )


def test_wav_odd_chunk_alignment():
    """RIFF chunks are word-aligned: an odd-sized unknown chunk before data
    must be skipped with its pad byte."""
    s = np.array([3, -3, 3], dtype=np.int16)
    wav = C.encode_wav(s, sample_rate=8000)
    # splice an odd-length junk chunk right after the fmt chunk
    fmt_end = 12 + 8 + 16
    junk = b"junk" + (5).to_bytes(4, "little") + b"abcde" + b"\x00"  # pad byte
    spliced = wav[:fmt_end] + junk + wav[fmt_end:]
    sr, ch, back = C.decode_wav(spliced)
    assert np.array_equal(back, s)


def test_wav_rejects_non_pcm_and_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        C.decode_wav(b"OggS" + b"\x00" * 40)
    wav = bytearray(C.encode_wav(np.array([1], dtype=np.int16)))
    wav[20] = 3  # format tag -> IEEE float
    with pytest.raises(ValueError, match="PCM16"):
        C.decode_wav(bytes(wav))


def test_decode_media_dispatch():
    px = _pixels(1, 2)
    assert np.array_equal(C.decode_media(C.encode_ppm(px), "ppm"), px)
    with pytest.raises(NotImplementedError, match="jpeg"):
        C.decode_media(b"\xff\xd8\xff", "jpeg")


def test_image_decode_features_mapinpandas(spark):
    from platform_etl_backend_spark.operators.multimodal import image_decode_features

    px = _pixels(4, 8)
    rows = [(1, bytearray(C.encode_ppm(px)))]
    df = spark.createDataFrame(rows, "media_id bigint, ppm binary")
    out = image_decode_features(df, "media_id", "ppm").collect()[0]
    want = C.image_features(px)
    assert (out.width, out.height) == (8, 4)
    assert out.mean_r == pytest.approx(want["mean_r"])
    assert out.mean_b == pytest.approx(want["mean_b"])
