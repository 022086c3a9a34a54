"""Fixed-point coordinate model.

Mirrors the reference's ``imgfmt/app/Coord.java:27-70``:

- a *map unit* is ``360 / 2**24`` degrees (24-bit Garmin resolution);
- *high precision* (hp) coordinates use ``2**30`` units per 360 degrees
  (``HIGH_PREC_BITS = 30``), i.e. ``DELTA_SHIFT = 6`` extra bits below the
  map-unit grid;
- converting degrees→units rounds to nearest (``Coord.toMapUnit``-style).

All functions are vectorized over numpy arrays and also accept scalars.
"""

from __future__ import annotations

import numpy as np

MAP_UNIT_BITS = 24
HIGH_PREC_BITS = 30
DELTA_SHIFT = HIGH_PREC_BITS - MAP_UNIT_BITS  # 6

_MU_PER_DEG = (1 << MAP_UNIT_BITS) / 360.0
_HP_PER_DEG = (1 << HIGH_PREC_BITS) / 360.0


def _round_half_away(x):
    """Round half away from zero, like Java's ``(int)(x >= 0 ? x+0.5 : x-0.5)``."""
    x = np.asarray(x, dtype=np.float64)
    return np.trunc(np.where(x >= 0, x + 0.5, x - 0.5)).astype(np.int64)


def deg_to_mu(deg):
    """Degrees → 24-bit map units (round to nearest, half away from zero)."""
    return _round_half_away(np.asarray(deg, dtype=np.float64) * _MU_PER_DEG)


def deg_to_hp(deg):
    """Degrees → 30-bit high-precision units."""
    return _round_half_away(np.asarray(deg, dtype=np.float64) * _HP_PER_DEG)


def mu_to_deg(mu):
    return np.asarray(mu, dtype=np.float64) * (360.0 / (1 << MAP_UNIT_BITS))


def hp_to_deg(hp):
    return np.asarray(hp, dtype=np.float64) * (360.0 / (1 << HIGH_PREC_BITS))


def mu_to_hp(mu):
    return np.asarray(mu, dtype=np.int64) << DELTA_SHIFT


def hp_to_mu(hp):
    """hp → map units, rounding to nearest like ``Coord.getLatitude()``
    (adds half a delta then arithmetic-shifts)."""
    hp = np.asarray(hp, dtype=np.int64)
    return (hp + (1 << (DELTA_SHIFT - 1))) >> DELTA_SHIFT
