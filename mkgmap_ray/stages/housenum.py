"""Housenumber interval assembly (``ExtNumbers.fillNumbers`` semantics).

Reference: ``osmstyle/housenumber/ExtNumbers.java:208-333`` (fillNumbers) and
``HousenumberGenerator.java:1695-1783`` (per-road left/right assembly):
houses matched to a road are sorted by their position along it, split by
road side, and each side yields one Numbers interval carrying

- number style: ODD (1) / EVEN (2) / BOTH (3) from the parities present,
- start/end: first/last house number in position order, direction-normalized
  to the lowest/highest numbers when the sequence is "increasing"
  (ExtNumbers.java:265-295 with prev == next == null),
- not_in_order: both increasing and decreasing steps present, or the
  endpoints are not the extremes,
- has_gaps: the [lowest, highest] range stepped by 1 (BOTH) or 2 (ODD/EVEN)
  contains numbers absent from the side (ExtNumbers.java:296-303).

Scale shape: house→road matching emits compact (road, side, pos, house,
num) rows only; those hash-partition by road and each partition computes
every per-(road, side) interval in one vectorized lexsort + reduceat pass —
no per-group Python, no payload shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

N_HOUSE_PARTS = 64

_COLS = ("road", "side", "style", "start_num", "end_num", "n",
         "not_in_order", "has_gaps")


def fill_numbers_part(g: pd.DataFrame) -> pd.DataFrame:
    """One hash partition of matched houses → per-(road, side) Numbers
    rows, fully vectorized (group boundaries via lexsort + reduceat)."""
    empty = pd.DataFrame({c: pd.Series(dtype=np.int64) for c in _COLS})
    if not len(g):
        return empty
    road = g["road"].to_numpy(np.int64)
    side = g["side"].to_numpy(np.int64)
    pos = g["pos"].to_numpy(np.int64)
    house = g["house"].to_numpy(np.int64)
    num = g["num"].to_numpy(np.int64)

    order = np.lexsort((house, pos, side, road))
    road, side, pos, num = road[order], side[order], pos[order], num[order]
    new = np.r_[True, (road[1:] != road[:-1]) | (side[1:] != side[:-1])]
    starts = np.flatnonzero(new)
    ends = np.r_[starts[1:], len(road)] - 1

    lo = np.minimum.reduceat(num, starts)
    hi = np.maximum.reduceat(num, starts)
    n = (ends - starts + 1).astype(np.int64)
    first = num[starts]
    last = num[ends]
    is_even = (num % 2 == 0).astype(np.int64)
    has_even = np.maximum.reduceat(is_even, starts)
    has_odd = np.maximum.reduceat(1 - is_even, starts)
    # in-group steps: diff vs previous row, 0 on group boundaries
    d = np.r_[0, num[1:] - num[:-1]]
    d[new] = 0
    inc = np.maximum.reduceat((d > 0).astype(np.int64), starts)
    dec = np.maximum.reduceat((d < 0).astype(np.int64), starts)
    # distinct numbers per group (second sort keyed by value)
    gid = np.cumsum(new) - 1
    o2 = np.lexsort((num, gid))
    dn = np.r_[True, (gid[o2][1:] != gid[o2][:-1])
               | (num[o2][1:] != num[o2][:-1])]
    nd = np.bincount(gid[o2][dn], minlength=len(starts)).astype(np.int64)

    style = np.where(has_even & has_odd, 3, np.where(has_even, 2, 1))
    # ExtNumbers.java:265-295 increasing/inOrder decision, prev==next==null
    not_extremes = ((first != hi) & (first != lo)) | ((last != hi)
                                                      & (last != lo))
    case1 = (first == last) & (hi != lo)
    increasing = np.where(
        case1, True,
        np.where(not_extremes, first <= last, first < last),
    )
    not_in_order = ((inc & dec) | (~case1 & not_extremes)).astype(np.int64)
    start_num = np.where(increasing, lo, hi)
    end_num = np.where(increasing, hi, lo)
    step = np.where(style == 3, 1, 2)
    interior = (hi - lo) // step - 1
    has_gaps = ((hi > lo) & (interior > nd - 2)).astype(np.int64)

    return pd.DataFrame(
        {
            "road": road[starts],
            "side": side[starts],
            "style": style.astype(np.int64),
            "start_num": start_num.astype(np.int64),
            "end_num": end_num.astype(np.int64),
            "n": n,
            "not_in_order": not_in_order,
            "has_gaps": has_gaps,
        }
    )
