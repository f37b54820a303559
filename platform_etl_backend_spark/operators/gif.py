"""GIF (GIF89a, CompuServe spec / W3C note — public) in pure Python+numpy.

A REAL LZW codec — variable-width codes (3..12 bits, LSB-first bit
packing), CLEAR/EOI control codes, dictionary growth with the 4096-entry
reset, and the deferred `code == next_entry` corner case — plus the GIF
container: logical screen descriptor, global color table, image
descriptor, sub-block framing, trailer. Lossless, so round-trips are
byte-exact like PNG/BMP.

Scope: single-image, non-interlaced, global color table; extension
blocks (0x21) are skipped per spec. Interlaced images and local color
tables raise ``NotImplementedError`` honestly.

Like the other codecs this is a per-payload kernel for Arrow-batched
``mapInPandas`` stages.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21


class _BitWriter:
    """LSB-first bit packer (the GIF LZW byte order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR first, grows code width when the next
    code would not fit, resets the dictionary at 4096 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _BitWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w.write(clear, width)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        w.write(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            w.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        w.write(table[cur], width)
    w.write(eoi, width)
    return w.flush()


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _BitReader(data)
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = r.read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK corner case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(H, W) uint8 palette indices + (N, 3) palette → single-image
    GIF89a with a global color table (padded to the next power of two)."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
        raise ValueError("expected (H,W) indices and (N<=256, 3) palette")
    if idx.max(initial=0) >= len(pal):
        raise ValueError("index out of palette range")
    h, w = idx.shape
    size = 2
    while size < max(len(pal), 2):
        size *= 2
    gct_bits = size.bit_length() - 1  # log2(size)
    pal_full = np.zeros((size, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    mcs = max(2, gct_bits)
    comp = lzw_encode(idx.tobytes(), mcs)
    blocks = bytearray()
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
        + pal_full.tobytes()
        + struct.pack("<BHHHHB", _IMAGE_SEP, 0, 0, w, h, 0)
        + bytes([mcs])
        + bytes(blocks)
        + bytes([_TRAILER])
    )


def decode_gif(payload: bytes) -> np.ndarray:
    """Single-image GIF → (H, W, 3) uint8 RGB via the global color table."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    if not flags & 0x80:
        raise NotImplementedError("GIF without a global color table")
    gct_size = 2 << (flags & 0x07)
    pal = np.frombuffer(payload[pos : pos + gct_size * 3], dtype=np.uint8).reshape(-1, 3)
    pos += gct_size * 3
    while pos < len(payload):
        b = payload[pos]
        if b == _EXTENSION:
            pos += 2  # introducer + label
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == _IMAGE_SEP:
            _, _x, _y, w, h, iflags = struct.unpack("<BHHHHB", payload[pos : pos + 10])
            pos += 10
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF not supported")
            if iflags & 0x80:
                raise NotImplementedError("local color table not supported")
            mcs = payload[pos]
            pos += 1
            comp = bytearray()
            while payload[pos] != 0:
                n = payload[pos]
                comp += payload[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = np.frombuffer(lzw_decode(bytes(comp), mcs), dtype=np.uint8)
            if len(idx) != w * h:
                raise ValueError("decoded pixel count mismatch")
            return pal[idx.reshape(h, w)]
        elif b == _TRAILER:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("no image data in GIF")
