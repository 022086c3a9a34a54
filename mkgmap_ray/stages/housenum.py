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

# imgfmt/app/net/Numbers.java:28 (see NumberPreparer)
MAX_DELTA = 131071

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


# --- ExtNumbers plausibility self-repair ------------------------------------


def _implausible_keys(iv: pd.DataFrame) -> pd.DataFrame:
    """(road, ipart) composites whose Numbers record is implausible.

    ``Numbers.isPlausible`` (imgfmt/app/net/Numbers.java:299-353): a side
    fails when |start-end| > MAX_DELTA or an EVEN/ODD style carries an
    end of the wrong parity; a (left, right) pair fails when both styles
    are present, equal or BOTH, and the number ranges overlap — except
    the single-equal-number-on-both-sides case. (City/zip splits of the
    reference are not modelled; the fixture carries neither.)"""
    start = iv["start_num"].to_numpy(np.int64)
    end = iv["end_num"].to_numpy(np.int64)
    style = iv["style"].to_numpy(np.int64)
    side_bad = (
        (np.abs(start - end) > MAX_DELTA)
        | ((style == 2) & ((start % 2 != 0) | (end % 2 != 0)))
        | ((style == 1) & ((start % 2 == 0) | (end % 2 == 0)))
    )
    out = iv[["road", "ipart"]].copy()
    out["bad"] = side_bad
    out["lo"] = np.minimum(start, end)
    out["hi"] = np.maximum(start, end)
    out["style"] = style
    out["single"] = start == end
    g = out.groupby(["road", "ipart"], sort=False)
    agg = g.agg(
        any_side_bad=("bad", "max"),
        n_sides=("style", "size"),
        lo1=("lo", "first"), hi1=("hi", "first"),
        lo2=("lo", "last"), hi2=("hi", "last"),
        s1=("style", "first"), s2=("style", "last"),
        sg1=("single", "first"), sg2=("single", "last"),
    ).reset_index()
    pair = agg["n_sides"] >= 2
    style_cond = (agg["s1"] == agg["s2"]) | (agg["s1"] == 3) | (agg["s2"] == 3)
    overlap = ~((agg["lo2"] > agg["hi1"]) | (agg["hi2"] < agg["lo1"]))
    single_eq = agg["sg1"] & agg["sg2"] & (agg["lo1"] == agg["lo2"])
    pair_bad = pair & style_cond & overlap & ~single_eq
    bad = agg[agg["any_side_bad"].astype(bool) | pair_bad]
    return bad[["road", "ipart"]]


_RCOLS = ("road", "part", "side", "style", "start_num", "end_num", "n",
          "not_in_order", "has_gaps")


def repair_intervals_part(g: pd.DataFrame, max_rounds: int = 8) -> pd.DataFrame:
    """One hash partition of matched houses → fillNumbers intervals run
    through the ExtNumbers plausibility loop (``ExtNumbers.java:394-427``
    ``while (curr.isPlausible() == false) { findGoodSplitPos; tryChange }``):
    an implausible interval is split at the largest position gap of its
    houses (first such gap on ties — the deterministic face of
    ``findGoodSplitPos``), both new intervals re-checked, until every
    interval is plausible or no split is possible. Returns one row per
    (road, part, side) with ``part`` numbered along the road."""
    empty = pd.DataFrame({c: pd.Series(dtype=np.int64) for c in _RCOLS})
    if not len(g):
        return empty
    g = g.copy()
    g["ipart"] = np.int64(0)
    given_up: set[tuple[int, int]] = set()
    for _ in range(max_rounds):
        comp = g.rename(columns={"road": "road0"})
        comp["road"] = comp["road0"] * 4096 + comp["ipart"]
        iv = fill_numbers_part(comp)
        iv["ipart"] = iv["road"] % 4096
        iv["road"] = iv["road"] // 4096
        bad = _implausible_keys(iv)
        if given_up:
            keep = ~bad.apply(
                lambda r: (int(r["road"]), int(r["ipart"])) in given_up,
                axis=1,
            )
            bad = bad[keep] if len(bad) else bad
        if not len(bad):
            break
        key = g["road"] * 4096 + g["ipart"]
        bad_keys = set((bad["road"] * 4096 + bad["ipart"]).tolist())
        mask = key.isin(bad_keys)
        sub = g[mask].sort_values(["road", "ipart", "pos", "house"])
        gap = sub["pos"].diff()
        first = sub.groupby(["road", "ipart"], sort=False).cumcount() == 0
        gap[first] = -1
        gkey = sub["road"] * 4096 + sub["ipart"]
        gmax = gap.groupby(gkey.to_numpy()).transform("max")
        # first row per group reaching the max gap = the split position
        cand = sub[(gap.to_numpy() == gmax.to_numpy()) & (gmax.to_numpy() > 0)]
        split = cand.groupby(["road", "ipart"], sort=False).first().reset_index()
        # groups without a positive gap cannot be split: give up (the
        # reference logs "can't fix" and breaks)
        splittable = set(
            (split["road"].astype(np.int64) * 4096
             + split["ipart"].astype(np.int64)).tolist()
        )
        for bk in bad_keys - splittable:
            given_up.add((int(bk) // 4096, int(bk) % 4096))
        if not len(split):
            break
        sp = dict(zip(
            (split["road"].astype(np.int64) * 4096
             + split["ipart"].astype(np.int64)).tolist(),
            split["pos"].astype(np.int64).tolist(),
        ))
        kv = key.to_numpy(np.int64)
        spv = np.array([sp.get(int(x), np.iinfo(np.int64).max) for x in kv],
                       np.int64)
        right = g["pos"].to_numpy(np.int64) >= spv
        g["ipart"] = g["ipart"].to_numpy(np.int64) * 2 + right
    # dense part ids in position order per road
    comp = g.rename(columns={"road": "road0"})
    comp["road"] = comp["road0"] * 4096 + comp["ipart"]
    iv = fill_numbers_part(comp)
    iv["ipart"] = iv["road"] % 4096
    iv["road"] = iv["road"] // 4096
    minpos = g.groupby([g["road"], g["ipart"]])["pos"].min()
    rank = minpos.groupby(level=0).rank(method="dense").astype(np.int64) - 1
    iv = iv.merge(
        rank.rename("part").reset_index().rename(
            columns={"level_0": "road", "level_1": "ipart"}),
        on=["road", "ipart"],
    )
    return iv[list(_RCOLS)].sort_values(
        ["road", "part", "side"]).reset_index(drop=True).astype("int64")
