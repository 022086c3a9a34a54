"""Minimal pure-Python PNG codec (stdlib zlib/struct only; no PIL in this
environment).

Encodes/decodes 8-bit RGB PNGs with filter type 0 on every scanline —
real, spec-conformant PNG (lossless), deterministic byte output for a given
pixel array (fixed zlib level). Decode supports filters 0-4 so any
conformant writer's output can be read back.

This is the engine's *lossless* image path; the lossy path is ``qraw``
(see ``images.py``), a clearly-marked deterministic stand-in for JPEG since
no JPEG codec exists in this container.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → PNG bytes (color type 2, bit depth 8,
    filter 0, zlib level 6). Deterministic."""
    assert rgb.dtype == np.uint8 and rgb.ndim == 3 and rgb.shape[2] == 3
    h, w = rgb.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = rgb.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    stride = w * bpp
    # fast path: every scanline filter byte is 0 (this encoder always
    # writes filter 0) — the unfilter is a single strided view, no
    # per-scanline Python loop
    if len(raw) == h * (stride + 1):
        rows = raw.reshape(h, stride + 1)
        if not rows[:, 0].any():
            return np.ascontiguousarray(rows[:, 1:])
    out = np.zeros((h, stride), dtype=np.int64)
    pos = 0
    for y in range(h):
        ftype = int(raw[pos])
        line = raw[pos + 1 : pos + 1 + stride].astype(np.int64)
        pos += 1 + stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        if ftype == 0:
            out[y] = line
        elif ftype == 2:  # up
            out[y] = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # sub / average / paeth need sequential x
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    val = line[x] + a
                elif ftype == 3:
                    val = line[x] + (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    val = line[x] + pred
                cur[x] = val & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → RGB uint8 (h, w, 3). Supports 8-bit RGB, no interlace."""
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    idat = b""
    w = h = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    return _unfilter(raw, h, w, 3).reshape(h, w, 3)
