"""Codepage collation keys (``imgfmt/app/srt/Sort.java`` semantics).

The reference builds per-label sort keys with three strengths: the key
is all PRIMARY weights, a double NUL, all SECONDARY weights, NUL, all
TERTIARY weights, NUL (``Sort.fillCompleteKey``/``fillKey``,
``Sort.java:389-432``); byte-wise comparison of keys then yields
case/diacritic-insensitive primary ordering with accents deciding at
secondary strength and case at tertiary strength. Characters may expand
(``… → ...``) before weighting; unmapped characters are ignorable.

The table below is authored in the same three-level structure as the
reference's ``.srt`` sources (``<`` separates primary groups, ``;``
secondary subgroups, tuples are tertiary case variants) but covers the
engine's label alphabet (ASCII + a few Latin-1 accents) — building the
full cp1252 table is a data exercise, not a semantic one.

Key building is three C-speed ``bytes.translate`` passes per label
(ignorables dropped via the delete argument), no per-character Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# primary groups in collation order; each entry is a list of secondary
# subgroups; each subgroup is a tuple of tertiary (case) variants
_GROUPS: list[list[tuple[str, ...]]] = [
    [(" ",)],
    [("_",)], [("-",)], [(",",)], [(";",)], [(":",)], [("!",)], [("?",)],
    [(".",)], [("'",)], [('"',)], [("(",)], [(")",)], [("[",)], [("]",)],
    [("@",)], [("*",)], [("/",)], [("\\",)], [("&",)], [("#",)], [("%",)],
    [("+",)], [("<",)], [("=",)], [(">",)], [("|",)], [("~",)],
    [("$",)],
    [("0",)], [("1",)], [("2",)], [("3",)], [("4",)],
    [("5",)], [("6",)], [("7",)], [("8",)], [("9",)],
    [("a", "A"), ("á", "Á"), ("à", "À"), ("â", "Â"), ("ä", "Ä")],
    [("b", "B")],
    [("c", "C"), ("ç", "Ç")],
    [("d", "D")],
    [("e", "E"), ("é", "É"), ("è", "È"), ("ê", "Ê"), ("ë", "Ë")],
    [("f", "F")], [("g", "G")], [("h", "H")],
    [("i", "I"), ("í", "Í"), ("ì", "Ì")],
    [("j", "J")], [("k", "K")], [("l", "L")], [("m", "M")],
    [("n", "N"), ("ñ", "Ñ")],
    [("o", "O"), ("ó", "Ó"), ("ò", "Ò"), ("ô", "Ô"), ("ö", "Ö")],
    [("p", "P")], [("q", "Q")], [("r", "R")],
    [("s", "S")], [("ß",)],
    [("t", "T")],
    [("u", "U"), ("ú", "Ú"), ("ù", "Ù"), ("ü", "Ü")],
    [("v", "V")], [("w", "W")], [("x", "X")],
    [("y", "Y"), ("ý", "Ý")],
    [("z", "Z")],
]

# pre-weighting expansions (Sort.java expansion list semantics)
EXPANSIONS = {"…": "...", "¼": "1/4", "½": "1/2", "¾": "3/4"}

_ENC = "latin-1"  # 8-bit codepage stand-in covering the table


def _build_tables():
    prim = {}
    sec = {}
    ter = {}
    for p, group in enumerate(_GROUPS, start=1):
        for s, sub in enumerate(group, start=1):
            for t, ch in enumerate(sub, start=1):
                b = ch.encode(_ENC)[0]
                prim[b] = p
                sec[b] = s
                ter[b] = t
    mapped = sorted(prim)
    delete = bytes(b for b in range(256) if b not in prim)
    def table(d):
        return bytes(d.get(b, 0) for b in range(256))
    return table(prim), table(sec), table(ter), delete


_PRIM, _SEC, _TER, _DELETE = _build_tables()


def sort_key(label: str) -> bytes:
    """The reference's complete collation key for one label: primary
    weights + NUL NUL + secondary weights + NUL + tertiary weights + NUL
    (``Sort.fillCompleteKey``)."""
    for ch, repl in EXPANSIONS.items():
        if ch in label:
            label = label.replace(ch, repl)
    enc = label.encode(_ENC, errors="ignore")
    return (
        enc.translate(_PRIM, _DELETE) + b"\x00\x00"
        + enc.translate(_SEC, _DELETE) + b"\x00"
        + enc.translate(_TER, _DELETE) + b"\x00"
    )


def sort_key_hex(labels: pd.Series) -> pd.Series:
    """Order-preserving hex form of ``sort_key`` for each label (hex is
    byte-order-preserving, so a string sort on it equals a key sort —
    usable directly as a Ray ``Dataset.sort`` column)."""
    return labels.map(lambda s: sort_key(s).hex())


class CollateKey:
    """map_batches callable: append the collation sort key (hex) for a
    label column — the distributed face of the MDR global index ordering."""

    def __init__(self, label_col: str, out_col: str = "collate_key"):
        self.label_col = label_col
        self.out_col = out_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[self.out_col] = sort_key_hex(
            batch[self.label_col].astype(str)
        )
        return batch


def srt_char_table_bytes() -> dict:
    """Serialize the collation table in the SRT binary section forms
    (``imgfmt/app/srt/SRTFile.java:96-131`` + ``writeSrt5Expansions``):

    - ``srt4``: per character code 0..255 a flags byte (1 letter, 2
      digit, expansion count << 4 — ``SrtTextReader.charFlags`` +
      expansion marking) followed by the packed weight pair
      ``primary u8, (tertiary << 4) | (secondary & 0xf)`` —
      the single-codepage (non-multi) layout;
    - ``srt5``: the expansion table, one packed weight pair per
      expanded character, referenced from the char table via the
      primary value (1-based index).
    """
    prim = {}
    sec = {}
    ter = {}
    for p, group in enumerate(_GROUPS, start=1):
        for s, sub in enumerate(group, start=1):
            for t, ch in enumerate(sub, start=1):
                b = ch.encode(_ENC)[0]
                prim[b], sec[b], ter[b] = p, s, t

    # expansion entries: per source char, one weight triple per expanded
    # character; the char table stores (count-1) in the flag nibble and
    # the 1-based first index as its primary
    exp_entries: list[tuple[int, int, int]] = []
    exp_ref: dict[int, tuple[int, int]] = {}
    for src, repl in sorted(EXPANSIONS.items()):
        # expansion sources beyond latin-1 (e.g. the cp1252 ellipsis)
        try:
            b = src.encode(_ENC)[0]
        except UnicodeEncodeError:
            b = src.encode("cp1252")[0]
        first = len(exp_entries) + 1
        for ch in repl:
            cb = ch.encode(_ENC)[0]
            exp_entries.append(
                (prim.get(cb, 0), sec.get(cb, 0), ter.get(cb, 0))
            )
        exp_ref[b] = (first, len(repl) - 1)

    srt4 = bytearray()
    for code in range(256):
        ch = bytes([code]).decode(_ENC)
        flags = 0
        if ch.isalpha():
            flags = 1
        if ch.isdigit():
            flags = 2
        if code in exp_ref:
            first, extra = exp_ref[code]
            flags |= extra << 4
            p, s, t = first, 0, 0
        else:
            p = prim.get(code, 0)
            s = sec.get(code, 0)
            t = ter.get(code, 0)
        srt4 += bytes([flags, p & 0xFF, ((t << 4) | (s & 0xF)) & 0xFF])
    srt5 = bytearray()
    for p, s, t in exp_entries:
        srt5 += bytes([p & 0xFF, ((t << 4) | (s & 0xF)) & 0xFF])
    return {"srt4": bytes(srt4), "srt5": bytes(srt5)}
