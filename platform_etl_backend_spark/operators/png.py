"""PNG (ISO 15948 / RFC 2083, public spec) in stdlib zlib + numpy — no PIL.

Replaces the ``NotImplementedError`` stub for the ``png`` format in
``decode_media``. PNG needed no external codec after all: DEFLATE is in the
Python standard library (``zlib``), and the rest of the format — chunk
framing with CRC32, scanline filters — is small, exactly specified, and
LOSSLESS, so round-trips are byte-exact (even stronger than the JPEG
codec's bounded-error guarantee; oracle pairing can predict exact values).

Scope:
- bit depth 8; color types 0 (grayscale), 2 (RGB), 3 (palette + PLTE),
  6 (RGBA); interlace 0. All five scanline filters (None/Sub/Up/Average/
  Paeth) on decode; the encoder emits filter 0 with a per-row heuristic
  escape hatch kept out for determinism.
- Adam7 interlace, 16-bit depth, and ancillary color management raise
  ``NotImplementedError`` honestly.

Like the other codecs this is a per-payload kernel for Arrow-batched
``mapInPandas`` stages; the scanline unfilter is a per-row loop (Sub/Paeth
carry an intra-row dependency, which is inherent to the format).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """uint8 array → PNG. (H, W) → grayscale, (H, W, 3) → RGB,
    (H, W, 4) → RGBA. Filter 0 on every scanline (deterministic output)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color, ch = 0, 1
        h, w = px.shape
    elif px.ndim == 3 and px.shape[2] in (3, 4):
        color = 2 if px.shape[2] == 3 else 6
        h, w, ch = px.shape
    else:
        raise ValueError(f"expected (H,W) / (H,W,3) / (H,W,4), got {px.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = px.reshape(h, w * ch)
    scanlines = b"".join(b"\x00" + row.tobytes() for row in raw)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines, level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(data: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 0:
            cur = np.frombuffer(bytes(row), dtype=np.uint8).copy()
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
            cur = np.frombuffer(bytes(row), dtype=np.uint8).copy()
        elif ftype == 2:  # Up
            cur = (np.frombuffer(bytes(row), dtype=np.uint8) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + int(prev[i])) >> 1)) & 0xFF
            cur = np.frombuffer(bytes(row), dtype=np.uint8).copy()
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
            cur = np.frombuffer(bytes(row), dtype=np.uint8).copy()
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    if pos != len(data):
        raise ValueError("scanline data length mismatch")
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → uint8 array: (H, W) for grayscale, (H, W, 3) for RGB/palette,
    (H, W, 4) for RGBA. CRC-checked chunk framing; all 5 filters."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise NotImplementedError("only bit depth 8 supported")
            if color not in _CHANNELS:
                raise NotImplementedError(f"color type {color} not supported")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlace not supported")
            if comp != 0 or filt != 0:
                raise ValueError("invalid compression/filter method")
            ihdr = (w, h, color)
        elif tag == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    w, h, color = ihdr
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    px = _unfilter(raw, h, w, ch)
    if color == 0:
        return px.reshape(h, w)
    if color == 3:
        if plte is None:
            raise ValueError("palette image without PLTE chunk")
        return plte[px.reshape(h, w)]
    return px.reshape(h, w, ch)
