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


# --- 8-bit / UTF-8 label encodings ------------------------------------------

# authored ASCII transliteration rows for the Latin-1 block (the
# reference reads these from resources/chars/ascii/row00.trans via
# TableTransliterator; same substitution scheme, compact table)
_TRANSLIT = {
    "À": "A", "Á": "A", "Â": "A", "Ã": "A", "Ä": "A", "Å": "AA",
    "Æ": "AE", "Ç": "C", "È": "E", "É": "E", "Ê": "E", "Ë": "E",
    "Ì": "I", "Í": "I", "Î": "I", "Ï": "I", "Ð": "D", "Ñ": "N",
    "Ò": "O", "Ó": "O", "Ô": "O", "Õ": "O", "Ö": "O", "Ø": "OE",
    "Ù": "U", "Ú": "U", "Û": "U", "Ü": "U", "Ý": "Y", "Þ": "TH",
    "ß": "ss",
    "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "aa",
    "æ": "ae", "ç": "c", "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ì": "i", "í": "i", "î": "i", "ï": "i", "ð": "d", "ñ": "n",
    "ò": "o", "ó": "o", "ô": "o", "õ": "o", "ö": "o", "ø": "oe",
    "ù": "u", "ú": "u", "û": "u", "ü": "u", "ý": "y", "þ": "th",
    "ÿ": "y",
}


def transliterate_ascii(text: str) -> str:
    """``TableTransliterator.transliterate`` semantics for an ASCII
    target: chars ≤ 0x7f pass through, known accents substitute, the
    rest become '?'."""
    out = []
    for c in text:
        if ord(c) <= 0x7F:
            out.append(c)
        else:
            out.append(_TRANSLIT.get(c, "?"))
    return "".join(out)


def encode8(text: str, codepage: str = "latin1",
            upper: bool = False) -> bytes:
    """8-bit label encoding (``labelenc/AnyCharsetEncoder.java:50-100``):
    encode in the target codepage, transliterating unmappable characters,
    NUL-terminated."""
    if upper:
        text = text.upper()
    if codepage == "ascii":
        text = transliterate_ascii(text)
        return text.encode("ascii", errors="replace") + b"\x00"
    out = bytearray()
    for c in text:
        try:
            out += c.encode("latin-1")
        except UnicodeEncodeError:
            out += transliterate_ascii(c).encode("ascii", errors="replace")
    return bytes(out) + b"\x00"


def encode_utf8(text: str, upper: bool = False) -> bytes:
    """Unicode label encoding (``labelenc/Utf8Encoder.java:29-45``):
    utf-8 bytes, NUL-terminated."""
    if upper:
        text = text.upper()
    return text.encode("utf-8") + b"\x00"


def decode8(data: bytes, codepage: str = "latin1") -> str:
    enc = "latin-1" if codepage == "latin1" else "ascii"
    return data.rstrip(b"\x00").decode(enc)


def encode_any_charset(text: str, charset: str = "cp1252",
                       upper: bool = False) -> bytes:
    """General (including MULTIBYTE) label encoding
    (``labelenc/AnyCharsetEncoder.java:50-101``): encode in the target
    charset; an unmappable character goes through the transliterator
    and the replacement is encoded instead, degrading to '?' when the
    replacement is unmappable too. Covers the reference's cp932/ms932
    Japanese codepage (``CodeFunctions.java:101-105``) via the
    same-named Python codec. NUL-terminated like every LBL encoding."""
    if upper:
        text = text.upper()
    out = bytearray()
    for c in text:
        try:
            out += c.encode(charset)
        except (UnicodeEncodeError, LookupError):
            rep = transliterate_ascii(c)
            try:
                out += rep.encode(charset)
            except (UnicodeEncodeError, LookupError):
                out += b"?"
    return bytes(out) + b"\x00"


def decode_any_charset(data: bytes, charset: str) -> str:
    """``labelenc/AnyCharsetDecoder.java`` analogue."""
    return data.rstrip(b"\x00").decode(charset)


def code_functions(charset: str):
    """``CodeFunctions.createEncoderForLBL`` dispatch
    (``labelenc/CodeFunctions.java:73-112``): returns (label format,
    codepage, encoder callable). Format 6 = packed ASCII, format 9 =
    single/multibyte + codepage, 10 = unicode."""
    cs = charset.lower()
    if cs == "ascii":
        return 6, 0, lambda t, upper=False: encode6(
            t.upper() if upper else t
        )
    if cs == "cp0":
        return 9, 0, lambda t, upper=False: encode8(t, "ascii", upper)
    if cs in ("cp1252", "latin1"):
        return 9, 1252, lambda t, upper=False: encode8(t, "latin1", upper)
    if cs in ("cp65001", "unicode"):
        return 10, 65001, encode_utf8
    if cs in ("cp932", "ms932"):
        return 9, 932, lambda t, upper=False: encode_any_charset(
            t, "cp932", upper
        )
    cp = int(cs[2:]) if cs.startswith("cp") and cs[2:].isdigit() else 0
    return 9, cp, lambda t, upper=False: encode_any_charset(t, cs, upper)


# --- road-name prefix/suffix separators --------------------------------------

SEP_PREFIX_SHOWN = "\x1e"   # blank-joined prefix, shown as a blank
SEP_PREFIX_HIDDEN = "\x1b"  # glued prefix, fully hidden
SEP_SUFFIX_SHOWN = "\x1f"
SEP_SUFFIX_HIDDEN = "\x1c"

# authored per-country search lists in the reference's option-file
# structure (osmstyle/PrefixSuffixFilter.java:95-204 reads them from a
# config; first case-insensitive match wins, longest-first like the
# sorted lists the reference builds)
DEFAULT_PREFIXES = {
    "FRA": ["Rue de la ", "Rue des ", "Avenue des ", "Rue ", "Avenue "],
    "DEU": ["An der ", "Am "],
    "GBR": ["The "],
}
DEFAULT_SUFFIXES = {
    "GBR": [" Street", " Road", " Lane"],
    "USA": [" Street", " Road", " Avenue"],
    "DEU": ["straße", "strasse", "weg"],
}


def prefix_suffix_filter(label: str, country: str,
                         prefixes: dict | None = None,
                         suffixes: dict | None = None) -> str:
    """``PrefixSuffixFilter.filter`` (``PrefixSuffixFilter.java:205-265``):
    insert the Garmin zoom-out separators into a road label — a
    well-known prefix ending in a blank replaces the blank with 0x1e
    (else 0x1b after it); a suffix starting with a blank replaces it
    with 0x1f (else 0x1c before it). Labels starting with shield codes
    (< 0x07) pass unchanged; first match per side wins."""
    if not label or not country:
        return label
    out = label
    for prefix in (prefixes or DEFAULT_PREFIXES).get(country, []):
        if out and ord(out[0]) < 7:
            break
        if len(out) >= len(prefix) and \
                out[: len(prefix)].lower() == prefix.lower():
            if prefix.endswith(" "):
                out = prefix[:-1] + SEP_PREFIX_SHOWN + out[len(prefix):]
            else:
                out = prefix + SEP_PREFIX_HIDDEN + out[len(prefix):]
            break
    for suffix in (suffixes or DEFAULT_SUFFIXES).get(country, []):
        if len(out) < len(suffix):
            continue
        pos = len(out) - len(suffix)
        if out[pos:].lower() == suffix.lower():
            if suffix.startswith(" "):
                out = out[:pos] + SEP_SUFFIX_SHOWN + suffix[1:]
            else:
                out = out[:pos] + SEP_SUFFIX_HIDDEN + suffix
            break
    return out
