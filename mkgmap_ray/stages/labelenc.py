"""Garmin 6-bit label encoding (``imgfmt/app/labelenc/Format6Encoder``).

Character map (``Format6Encoder.java:41-48``): space=0, A–Z=1..26,
0–9=0x20..0x29; symbols go as a 0x1C shift code + symbol index; the text
is uppercased first (the reference also transliterates accents via table
files — out of round-1 scope, non-ASCII symbols are dropped exactly like
the reference's unmapped characters). Stream terminates with 0xFF; six
bits per character packed MSB-first (``put6``, byte length
``((chars-1)*6)/8 + 1`` — wait, ``(off*6)/8 + 1`` with the terminator
included, mirrored exactly below).
"""

from __future__ import annotations

import numpy as np

LETTERS = (
    " ABCDEFGHIJKLMNO"
    "PQRSTUVWXYZxx   "
    "0123456789\x01\x02\x03\x04\x05\x06"
)
SYMBOLS = "@!\"#$%&'()*+,-./" "xxxxxxxxxx:;<=>?" "xxxxxxxxxxx[\\]^_"
SYMBOL_SHIFT = 0x1C


def encode6(text: str) -> bytes:
    """Encode one label to its packed 6-bit byte form (incl. terminator)."""
    codes: list[int] = []
    for c in text.upper():
        if c == " ":
            codes.append(0)
        elif "A" <= c <= "Z":
            codes.append(ord(c) - ord("A") + 1)
        elif "0" <= c <= "9":
            codes.append(ord(c) - ord("0") + 0x20)
        elif ord(c) in (0x1B, 0x1C):
            codes.extend((0x1B, ord(c) + 0x10))
        elif 0x1D <= ord(c) <= 0x1F:
            codes.append(ord(c))
        elif 1 <= ord(c) <= 6:  # highway shields
            codes.append(0x29 + ord(c))
        else:
            ind = SYMBOLS.find(c)
            if ind >= 0 and SYMBOLS[ind] != "x":
                codes.extend((SYMBOL_SHIFT, ind))
            # unmapped characters are dropped (reference shiftedSymbol)
    codes.append(0x3F)  # 0xff truncated to 6 bits by put6's mask
    n = len(codes)
    buf = bytearray((n * 6 + 7) // 8 + 1)
    for off, c in enumerate(codes):
        bit = off * 6
        byte = bit // 8
        shift = bit - 8 * byte
        mask = 0xFC >> shift
        buf[byte] |= ((c << 2) >> shift) & mask
        if shift > 2:
            buf[byte + 1] |= ((c << 2) << (8 - shift)) & 0xFF
    length = ((n - 1) * 6) // 8 + 1
    return bytes(buf[:length])


def decode6(data: bytes) -> str:
    """Decode a packed 6-bit label back to text (inverse of ``encode6``)."""
    out = []
    n6 = len(data) * 8 // 6
    codes = []
    for off in range(n6):
        bit = off * 6
        byte = bit // 8
        shift = bit - 8 * byte
        v = (data[byte] << 8) | (data[byte + 1] if byte + 1 < len(data) else 0)
        codes.append((v >> (10 - shift)) & 0x3F)
    i = 0
    while i < len(codes):
        c = codes[i]
        if c == 0x3F:  # terminator (0xff & 0x3f)
            break
        if c == SYMBOL_SHIFT and i + 1 < len(codes):
            s = SYMBOLS[codes[i + 1]]
            if s != "x":
                out.append(s)
            i += 2
            continue
        if c == 0x1B and i + 1 < len(codes):
            out.append(chr(codes[i + 1] - 0x10))
            i += 2
            continue
        if c < len(LETTERS):
            ch = LETTERS[c]
            if ch != "x":
                out.append(ch)
        i += 1
    return "".join(out)


def encoded_len6(n_codes: np.ndarray) -> np.ndarray:
    """Byte length of a label of ``n_codes`` 6-bit characters (terminator
    included), the reference's ``((off-1)*6)/8 + 1`` with off = codes+1."""
    n = np.asarray(n_codes, np.int64) + 1  # + terminator
    return ((n - 1) * 6) // 8 + 1
