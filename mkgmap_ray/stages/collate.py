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
