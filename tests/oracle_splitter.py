"""Slow, obviously-correct recursive reimplementation of the reference's
MapSplitter recursion (``build/MapSplitter.java:131-200``), used as the
oracle for the engine's iterative/vectorized split tree.

Operates on plain Python feature dicts; intentionally shares no code with
``mkgmap_ray.grid``/``splitter`` beyond ``Area`` (the split-position math
must be identical by definition)."""

from __future__ import annotations

from mkgmap_ray.geom.area import Area
from mkgmap_ray.geom.coords import DELTA_SHIFT
from mkgmap_ray.splitter import SplitLimits


def _jdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _feature_stat(f):
    kind, n = f["kind"], f["n_points"]
    if kind == 0:
        return (1, 0, 0, 9, 1)
    n_el = 1 + (max(n, 1) - 1) // 250
    size = n_el * 11 + n * 4
    if kind == 1:
        return (0, n_el, 0, size, 1) if n > 1 else (0, 0, 0, 0, 1)
    return (0, 0, n_el, size, 2) if n > 3 else (0, 0, 0, 0, 2)


def _pick(f, areas, nx, ny):
    xbase = areas[0].min_lon << DELTA_SHIFT
    ybase = areas[0].min_lat << DELTA_SHIFT
    dx = areas[0].width << DELTA_SHIFT
    dy = areas[0].height << DELTA_SHIFT
    xcell = min(max(_jdiv(f["lon_hp"] - xbase, dx), 0), nx - 1)
    ycell = min(max(_jdiv(f["lat_hp"] - ybase, dy), 0), ny - 1)
    return xcell * ny + ycell


def oracle_split(features, bounds: Area, shift: int,
                 limits: SplitLimits = SplitLimits()):
    """Return list of (Area, [feature indices]) leaves."""
    idx = list(range(len(features)))

    # splitMaxSize root grid
    width = bounds.width >> shift
    height = bounds.height >> shift
    xs = width // limits.max_division_size + 1 if width > limits.max_division_size else 1
    ys = height // limits.max_division_size + 1 if height > limits.max_division_size else 1
    if xs > 1 or ys > 1:
        areas = bounds.split(xs, ys, shift)
        buckets = [[] for _ in areas]
        for i in idx:
            buckets[_pick(features[i], areas, xs, ys)].append(i)
        work = list(zip(areas, buckets))
    else:
        work = [(bounds, idx)]

    leaves = []
    while work:
        area, members = work.pop()
        n_pt = n_ln = est = n_split = 0
        for i in members:
            s = _feature_stat(features[i])
            n_pt += s[0]
            n_ln += s[1]
            est += s[3]
            n_split += s[4]
        must = (
            n_ln > limits.max_lines
            or n_pt > limits.max_points
            or est > limits.max_rgn_size
        )
        want = (
            area.max_dimension > (limits.min_dimension << shift)
            and est > limits.wanted_size
        )
        if (must or want) and n_split > 1 and area.max_dimension > (
            limits.min_dimension << shift
        ):
            if area.width > area.height:
                sub = area.split(2, 1, shift)
                nx, ny = 2, 1
            else:
                sub = area.split(1, 2, shift)
                nx, ny = 1, 2
            if sub is not None:
                buckets = [[] for _ in sub]
                for i in members:
                    buckets[_pick(features[i], sub, nx, ny)].append(i)
                work.extend(zip(sub, buckets))
                continue
        leaves.append((area, members))
    return leaves


def oracle_split_levels(features, bounds: Area, shifts,
                        limits: SplitLimits = SplitLimits()):
    """Multi-level oracle (``MapBuilder.makeMapAreas``): level 0 splits the
    root at shifts[0]; each later level re-splits every parent leaf area at
    its (finer) shift with only that area's members. Returns one list of
    (Area, member indices) per shift."""
    out = []
    areas = None
    for shift in shifts:
        if areas is None:
            areas = oracle_split(features, bounds, shift, limits)
        else:
            nxt = []
            for a, members in areas:
                sub = oracle_split(
                    [features[i] for i in members], a, shift, limits
                )
                for la, lmem in sub:
                    nxt.append((la, [members[j] for j in lmem]))
            areas = nxt
        out.append(areas)
    return out
