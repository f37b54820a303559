"""Real media codecs in pure numpy — no external image/audio libraries.

The container has no PIL/libav, but two public formats are simple enough to
decode from first principles, which upgrades the multimodal plumbing from
"stub decode" to "real decode" for those formats:

- **PPM (P6)** — the netpbm binary RGB image format: ASCII header
  ``P6 <width> <height> <maxval>`` (whitespace-separated, ``#`` comments)
  followed by ``height*width*3`` raw bytes (maxval ≤ 255).
- **WAV (RIFF/WAVE, PCM16)** — canonical RIFF container: ``fmt `` chunk
  (PCM format tag 1, 16-bit) + ``data`` chunk of little-endian int16
  samples.

Baseline-sequential 4:4:4 JPEG also decodes for REAL — from first
principles in ``operators/jpeg.py`` (numpy DCT + canonical Huffman) — and
so does PNG (``operators/png.py``: stdlib zlib DEFLATE + all five
scanline filters + palette; lossless, so roundtrips are byte-exact).
Formats that genuinely need external libraries (MP3/H.264, and
progressive JPEG) still raise ``NotImplementedError`` via
``decode_media`` — honest stubs, per the repo's no-fake-decodes rule.

Everything here is deterministic and byte-exact, so decode paths can be
oracle-paired: a catalog query ENCODES payloads from known bytes Spark-side,
DECODES them through these parsers inside ``mapInPandas``, and DuckDB
recomputes the expected features from the same source bytes without ever
seeing the container format.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray, maxval: int = 255) -> bytes:
    """(H, W, 3) uint8 array → binary PPM."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3), got {pixels.shape}")
    h, w, _ = pixels.shape
    header = f"P6\n{w} {h}\n{maxval}\n".encode("ascii")
    return header + pixels.astype(np.uint8).tobytes()


def _read_header_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited header token, skipping '#' comments."""
    n = len(buf)
    while pos < n:
        c = buf[pos : pos + 1]
        if c == b"#":
            while pos < n and buf[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < n and not buf[pos : pos + 1].isspace():
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return buf[start:pos], pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (H, W, 3) uint8 pixel array."""
    magic, pos = _read_header_token(payload, 0)
    if magic != b"P6":
        raise ValueError(f"not a P6 PPM (magic={magic!r})")
    w_tok, pos = _read_header_token(payload, pos)
    h_tok, pos = _read_header_token(payload, pos)
    maxval_tok, pos = _read_header_token(payload, pos)
    w, h, maxval = int(w_tok), int(h_tok), int(maxval_tok)
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported maxval {maxval}")
    pos += 1  # exactly one whitespace byte after maxval per the spec
    need = h * w * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError(f"truncated raster: need {need}, have {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize — deterministic integer index math only."""
    h, w = pixels.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return pixels[rows][:, cols]


def image_features(pixels: np.ndarray) -> dict[str, float]:
    """Per-channel means (IEEE double; exact int sums divided once)."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3).astype(np.int64)
    n = h * w
    return {
        "mean_r": float(flat[:, 0].sum()) / n,
        "mean_g": float(flat[:, 1].sum()) / n,
        "mean_b": float(flat[:, 2].sum()) / n,
    }


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM 16-bit)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """int16 sample array → canonical RIFF/WAVE with one fmt + data chunk."""
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM16 → (sample_rate, channels, int16 samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = channels = None
    samples = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, channels, sample_rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 1 or bits != 16:
                raise ValueError(f"only PCM16 supported (tag={tag}, bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return sample_rate, channels, samples


def audio_features(samples: np.ndarray) -> dict[str, float]:
    """RMS and strict zero crossings (prev*cur < 0) in IEEE double."""
    s = samples.astype(np.int64)
    n = len(s)
    rms = float(np.sqrt(float((s * s).sum()) / n)) if n else 0.0
    zc = int(((s[:-1] * s[1:]) < 0).sum()) if n > 1 else 0
    return {"n_samples": n, "rms": rms, "zero_crossings": zc}


# ---------------------------------------------------------------------------
# BMP (Windows DIB, BITMAPINFOHEADER — public spec). Uncompressed 24-bit
# BGR, bottom-up row order, rows padded to 4-byte boundaries: trivial but
# REAL — the format data-lake image dumps actually contain alongside
# PNG/JPEG. Encoder + decoder, byte-exact roundtrips.
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BMP (BGR, bottom-up, padded rows)."""
    import struct

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (H,W,3) RGB, got {px.shape}")
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    bgr = px[::-1, :, ::-1]  # bottom-up, RGB->BGR
    body = b"".join(row.tobytes() + b"\x00" * pad for row in bgr.reshape(h, row_bytes))
    data_offset = 14 + 40
    file_size = data_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (H, W, 3) uint8 RGB. Handles positive
    (bottom-up) and negative (top-down) heights."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    (_, _fsize, _, _, data_offset) = struct.unpack("<2sIHHI", payload[:14])
    (hdr_size, w, h, planes, bpp, comp) = struct.unpack("<IiiHHI", payload[14:34])
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    if comp != 0:
        raise NotImplementedError(f"compressed BMP (method {comp}) not supported")
    if bpp != 24:
        raise NotImplementedError(f"{bpp}-bit BMP not supported (24-bit only)")
    if planes != 1 or w <= 0 or h == 0:
        raise ValueError("invalid BMP dimensions")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = data_offset + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload[data_offset : data_offset + stride * h], dtype=np.uint8
    ).reshape(h, stride)[:, :row_bytes]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return img if top_down else img[::-1]


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def decode_media(payload: bytes, fmt: str):
    """Decode a payload by declared format; real codecs where pure-numpy
    parsing is possible, honest NotImplementedError where a library is
    genuinely required."""
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "wav":
        return decode_wav(payload)
    if fmt == "jpeg":
        # baseline-sequential 4:4:4 JPEG from first principles (numpy DCT +
        # canonical Huffman) — see operators/jpeg.py
        from platform_etl_backend_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if fmt == "png":
        # stdlib zlib + numpy scanline filters — see operators/png.py
        from platform_etl_backend_spark.operators.png import decode_png

        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "gif":
        # real LZW (variable-width codes, dict growth/reset) + GIF container
        from platform_etl_backend_spark.operators.gif import decode_gif

        return decode_gif(payload)
    raise NotImplementedError(
        f"format {fmt!r} needs an external codec library (PIL/libav), "
        "not present in this environment"
    )
