"""Per-line filters from the reference's filter chain.

- ``round_coords``: snap hp coords to the resolution grid
  (``filters/RoundCoordsFilter.java``): shift-dependent round-to-nearest of
  the high-precision value onto multiples of ``2**(DELTA_SHIFT + shift)``.
- ``remove_obsolete_points``: drop repeated and collinear points / spikes
  (``filters/RemoveObsoletePointsFilter.java``).
- ``split_long_line``: split polylines with more than ``MAX_POINTS_IN_LINE``
  points into chunks of at least half that size
  (``filters/LineSplitterFilter.java:42-76``).
- ``signed_area2``: twice the signed area (shoelace), the reference's
  ``Way.calcAreaSize`` / ``ShapeMergeFilter.calcAreaSizeTestVal`` analogue.
"""

from __future__ import annotations

import numpy as np

from .coords import DELTA_SHIFT

MAX_POINTS_IN_LINE = 250  # LineSplitterFilter.java:40
MAX_POINTS_IN_ELEMENT = 250  # PolygonSplitterFilter.java:30


def round_coords(lat_hp, lon_hp, shift: int):
    """Snap hp coordinates to the grid of resolution ``shift`` (map-unit
    shift; 0 at resolution 24). Round to nearest multiple of
    ``2**(DELTA_SHIFT+shift)`` half-up, like ``RoundCoordsFilter``'s
    ``(co.getHighPrecLat() + roundVal) & ~mask`` pattern."""
    total_shift = DELTA_SHIFT + shift
    half = np.int64(1 << (total_shift - 1))
    mask = np.int64(~((1 << total_shift) - 1))
    lat = (np.asarray(lat_hp, dtype=np.int64) + half) & mask
    lon = (np.asarray(lon_hp, dtype=np.int64) + half) & mask
    return lat, lon


def dedupe_consecutive(lat_hp, lon_hp):
    """Drop consecutive duplicate points; returns keep-mask."""
    lat = np.asarray(lat_hp, dtype=np.int64)
    lon = np.asarray(lon_hp, dtype=np.int64)
    keep = np.ones(len(lat), dtype=bool)
    if len(lat) > 1:
        keep[1:] = (lat[1:] != lat[:-1]) | (lon[1:] != lon[:-1])
    return keep


def remove_obsolete_points(lat_hp, lon_hp, is_polygon: bool = False) -> np.ndarray:
    """Keep-mask dropping consecutive duplicates, collinear middles and
    spikes (``RemoveObsoletePointsFilter.java``: a point is obsolete when the
    triangle prev→p→next has zero area — collinear — or p equals a
    neighbour; spikes are 180° turnbacks)."""
    lat = np.asarray(lat_hp, dtype=np.int64)
    lon = np.asarray(lon_hp, dtype=np.int64)
    n = len(lat)
    if n <= 2:
        return dedupe_consecutive(lat, lon)

    keep_dup = dedupe_consecutive(lat, lon)
    lat, lon = lat[keep_dup], lon[keep_dup]
    m = len(lat)
    out = np.ones(m, dtype=bool)
    if m > 2:
        # iterate because removing a point can make its neighbour obsolete
        changed = True
        while changed and out.sum() > 2:
            idx = np.flatnonzero(out)
            la, lo = lat[idx], lon[idx]
            ax, ay = lo[:-2], la[:-2]
            bx, by = lo[1:-1], la[1:-1]
            cx, cy = lo[2:], la[2:]
            cross = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            dot = (ax - bx) * (cx - bx) + (ay - by) * (cy - by)
            # collinear and either passing straight through (dot<0 means the
            # angle at b is ~180° => b lies between) or a spike (dot>0)
            obsolete = cross == 0
            changed = bool(obsolete.any())
            if changed:
                # remove only the first obsolete point per pass to mirror the
                # reference's sequential scan semantics
                first = int(np.argmax(obsolete))
                out[idx[first + 1]] = False
    result = np.zeros(n, dtype=bool)
    result[np.flatnonzero(keep_dup)[out]] = True
    return result


def split_long_line(n_points: int, max_points: int = MAX_POINTS_IN_LINE):
    """Return list of (start, end_exclusive) index ranges splitting a line of
    ``n_points`` into chunks of ≤ ``max_points`` points where consecutive
    chunks share their boundary point and every chunk has at least
    ``max_points/2`` points (``LineSplitterFilter.java:42-76``)."""
    if n_points <= max_points:
        return [(0, n_points)]
    ranges = []
    start = 0
    remaining = n_points
    while remaining > max_points:
        if remaining < max_points + max_points // 2:
            take = remaining // 2 + 1
        else:
            take = max_points
        ranges.append((start, start + take))
        start += take - 1  # share the boundary point
        remaining = n_points - start
    ranges.append((start, n_points))
    return ranges


def signed_area2(lat_hp, lon_hp) -> int:
    """Twice the signed shoelace area in hp units² (int). Positive =
    counter-clockwise (mirrors ``Way.calcAreaSize`` sign convention up to
    orientation of the lat/lon axes)."""
    lat = np.asarray(lat_hp, dtype=np.int64)
    lon = np.asarray(lon_hp, dtype=np.int64)
    if len(lat) < 3:
        return 0
    if lat[0] == lat[-1] and lon[0] == lon[-1]:
        lat, lon = lat[:-1], lon[:-1]
    x, y = lon, lat
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    return int(np.sum(x * yn - xn * y))


def order_by_decreasing_area(rings, ids=None) -> np.ndarray:
    """``--order-by-decreasing-area`` (``doc/options.txt:844``,
    ``MapBuilder`` orderByDecreasingArea / ``Way.getFullArea``): indices
    ordering shapes by |signed area| DESCENDING so large polygons draw
    first; ties break on ascending id for determinism."""
    areas = np.asarray(
        [abs(signed_area2(la, lo)) for la, lo in rings], np.int64
    )
    ids = (
        np.arange(len(rings), dtype=np.int64)
        if ids is None else np.asarray(ids, np.int64)
    )
    return np.lexsort((ids, -areas))
