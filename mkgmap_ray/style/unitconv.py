"""Unit conversions for style values (``osmstyle/eval/UnitConversions.java``).

A conversion code is ``source=>target`` (e.g. ``m=>ft``): a plain number
is assumed to be in the SOURCE unit; a value carrying its own unit
suffix (``10ft``, ``30 mph``) converts from that unit instead. Factor
tables normalize to the canonical unit per quantity (m, km/h, t) like
the reference's LENGTH/SPEED/WEIGHT maps (``UnitConversions.java:39-62``).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

LENGTH_FACTORS = {
    "m": 1.0, "km": 1000.0, "ft": 0.3048, "feet": 0.3048, "mi": 1609.344,
}
SPEED_FACTORS = {
    "kmh": 1.0, "km/h": 1.0, "kmph": 1.0, "mph": 1.60934, "knots": 1.852,
}
WEIGHT_FACTORS = {
    "t": 1.0, "kg": 0.001, "lb": 0.00045359237, "lbs": 0.00045359237,
}

_ALL_FACTORS = {**LENGTH_FACTORS, **SPEED_FACTORS, **WEIGHT_FACTORS}

_NUM_UNIT_RE = re.compile(r"^\s*([+-]?[0-9]*\.?[0-9]+)\s*(.*?)\s*$")


def _factor_map_for(unit: str) -> dict[str, float]:
    for m in (LENGTH_FACTORS, SPEED_FACTORS, WEIGHT_FACTORS):
        if unit in m:
            return m
    raise ValueError(f"unknown unit {unit!r}")


def convert_value(value: str, source: str, target: str) -> float | None:
    """One value through ``source=>target``; None for non-numeric."""
    factors = _factor_map_for(source)
    if target not in factors:
        raise ValueError(f"incompatible units {source!r}=>{target!r}")
    m = _NUM_UNIT_RE.match(value or "")
    if not m:
        return None
    num = float(m.group(1))
    unit = m.group(2).lower()
    f_src = factors.get(unit) if unit else factors[source]
    if f_src is None:
        return None  # unit of a different quantity / unknown
    return num * f_src / factors[target]


def convert_series(col: pd.Series, code: str) -> pd.Series:
    """Vector form for ``conv:source=>target`` value filters; NA where the
    value is non-numeric or carries an incompatible unit. Numbers that are
    integral render without a decimal point (reference's number format)."""
    source, _, target = code.partition("=>")
    if not target:
        raise ValueError(f"bad conversion code {code!r}")

    def one(v):
        if v is None or v is pd.NA:
            return pd.NA
        out = convert_value(str(v), source.strip(), target.strip())
        if out is None:
            return pd.NA
        if out == int(out):
            return str(int(out))
        return f"{out:g}"

    return col.map(one).astype("string")


def maxspeed_kmh(col: pd.Series) -> pd.Series:
    """``maxspeed()`` style function (``function/MaxSpeedFunction.java``):
    the maxspeed tag normalized to km/h (mph/knots suffixes honored)."""
    return convert_series(col, "kmh=>kmh")
