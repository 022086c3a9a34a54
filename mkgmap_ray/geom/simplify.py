"""Douglas-Peucker simplification with preserved points.

Mirrors the reference's ``filters/DouglasPeuckerFilter.java:28-135``:

- the outer pass walks preserved points right-to-left, simplifying each
  span between consecutive preserved points independently (``doFilter``);
- within a span, the point with the largest ``shortestDistToLineSegment``
  distance to the chord splits the span recursively; spans whose max
  distance is within ``allowed_error`` collapse to their endpoints;
- distances are metres via the reference's flat-earth approximation
  (``Coord.distance``: ``U/360 * sqrt(distanceInDegreesSquared)`` with the
  longitude delta scaled by the cosine of the mean latitude,
  ``Coord.java:432-470``); perpendicular distance uses Heron's formula
  (``Coord.distToLineSegment``, ``Coord.java:806-824``).
"""

from __future__ import annotations

import numpy as np

from .coords import HIGH_PREC_BITS

R = 6378137.0  # WGS84 equatorial radius, Coord.java:60
U = R * 2 * np.pi  # circumference, Coord.java:61
_DEG_PER_HP = 360.0 / (1 << HIGH_PREC_BITS)
_HP_TO_RAD = 2 * np.pi / (1 << HIGH_PREC_BITS)


def _dist_m(lat1, lon1, lat2, lon2):
    """Flat-earth distance in metres between hp coords (vectorized);
    ``Coord.distance`` / ``distanceInDegreesSquared``."""
    lat_diff = np.abs(lat1 - lat2) * _DEG_PER_HP
    lon_diff = np.abs(lon1 - lon2) * _DEG_PER_HP
    lon_diff = np.where(lon_diff > 180.0, lon_diff - 360.0, lon_diff)
    lon_diff = lon_diff * np.cos(np.pi / 180.0 * ((lat1 + lat2) * (0.5 * _DEG_PER_HP)))
    return U / 360.0 * np.sqrt(lat_diff * lat_diff + lon_diff * lon_diff)


def shortest_dist_to_segment(p_lat, p_lon, a_lat, a_lon, b_lat, b_lon):
    """Vectorized ``Coord.shortestDistToLineSegment`` (``Coord.java:836-871``):
    project with cos-scaled longitudes; clamp to endpoints; interior distance
    via Heron's formula on flat-earth distances."""
    p_lat = np.asarray(p_lat, dtype=np.float64)
    p_lon = np.asarray(p_lon, dtype=np.float64)
    a_lat = np.asarray(a_lat, dtype=np.float64)
    a_lon = np.asarray(a_lon, dtype=np.float64)
    b_lat = np.asarray(b_lat, dtype=np.float64)
    b_lon = np.asarray(b_lon, dtype=np.float64)

    d_lon = b_lon - a_lon
    d_lat = b_lat - a_lat
    scale = np.cos((a_lat + b_lat + p_lat) / 3.0 * _HP_TO_RAD)
    s_d_lon = scale * d_lon
    denom = s_d_lon * s_d_lon + d_lat * d_lat
    with np.errstate(divide="ignore", invalid="ignore"):
        frac = np.where(
            denom > 0,
            (scale * (p_lon - a_lon) * s_d_lon + (p_lat - a_lat) * d_lat) / denom,
            0.0,
        )

    ap = _dist_m(a_lat, a_lon, p_lat, p_lon)
    bp = _dist_m(b_lat, b_lon, p_lat, p_lon)
    ab = _dist_m(a_lat, a_lon, b_lat, b_lon)
    s = (ab + ap + bp) / 2.0
    heron_arg = np.maximum(s * (s - ab) * (s - ap) * (s - bp), 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        interior = np.where(ab > 0, 2.0 * np.sqrt(heron_arg) / ab, 0.0)
    interior = np.where((ap == 0) | (bp == 0), 0.0, interior)
    return np.where(frac <= 0, ap, np.where(frac >= 1, bp, interior))


def _dp_span(lat, lon, start: int, end: int, allowed: float, keep: np.ndarray):
    """Iterative Douglas-Peucker over [start, end]; marks kept indices.
    Max-distance scan runs high-to-low index like the reference
    (``DouglasPeuckerFilter.douglasPeucker``) so ties pick the same split."""
    stack = [(start, end)]
    while stack:
        s, e = stack.pop()
        if e - s <= 1:
            continue
        seg = slice(s + 1, e)
        d = shortest_dist_to_segment(
            lat[seg], lon[seg], lat[s], lon[s], lat[e], lon[e]
        )
        # reference scans i from end-1 down to start+1 replacing only on a
        # strictly greater distance, so among ties the HIGHEST index wins
        max_rel = len(d) - 1 - int(np.argmax(d[::-1]))
        if float(d[max_rel]) > allowed:
            mid = s + 1 + max_rel
            stack.append((s, mid))
            stack.append((mid, e))
        else:
            keep[s + 1 : e] = False


def douglas_peucker(
    lat_hp: np.ndarray,
    lon_hp: np.ndarray,
    allowed_error: float,
    preserved: np.ndarray | None = None,
) -> np.ndarray:
    """Simplify a polyline; returns a boolean keep-mask over the points.

    ``allowed_error`` is in metres (the reference's ``maxErrorDistance =
    filterDistance * 2^shift`` with unit ≈5.4 m at resolution 24,
    ``DouglasPeuckerFilter.java:43``). ``preserved`` marks points that must
    survive (``Coord.preserved()``); spans between preserved points are
    simplified independently, mirroring ``doFilter``'s right-to-left loop.
    """
    lat = np.asarray(lat_hp, dtype=np.float64)
    lon = np.asarray(lon_hp, dtype=np.float64)
    n = len(lat)
    keep = np.ones(n, dtype=bool)
    if n <= 2:
        return keep
    end = n - 1
    if preserved is not None:
        preserved = np.asarray(preserved, dtype=bool)
        for i in range(end - 1, 0, -1):
            if preserved[i]:
                _dp_span(lat, lon, i, end, allowed_error, keep)
                end = i
    _dp_span(lat, lon, 0, end, allowed_error, keep)
    return keep


def douglas_peucker_batch(lat2d, lon2d, counts, allowed_error: float):
    """Douglas-Peucker over MANY equal-width rows at once.

    Same semantics as per-row ``douglas_peucker`` (no ``preserved``
    support — callers with pinned points use the scalar path): a worklist
    of (row, lo, hi) spans advances level-wise; per level the interior
    max-distance scan runs as ≤ width vectorized passes, with ties picking
    the highest index like the reference's high-to-low replace-on-greater
    scan. Returns a (m, K) keep mask (False beyond each row's count).
    """
    lat = np.asarray(lat2d, np.float64)
    lon = np.asarray(lon2d, np.float64)
    m, K = lat.shape
    counts = np.asarray(counts, np.int64)
    keep = np.arange(K)[None, :] < counts[:, None]

    rows = np.nonzero(counts > 2)[0]
    lo = np.zeros(len(rows), np.int64)
    hi = counts[rows] - 1
    while len(rows):
        width = hi - lo
        best_d = np.full(len(rows), -1.0)
        best_off = np.zeros(len(rows), np.int64)
        for j in range(1, K - 1):
            act = j < width
            if not act.any():
                break
            r = rows[act]
            d = shortest_dist_to_segment(
                lat[r, lo[act] + j], lon[r, lo[act] + j],
                lat[r, lo[act]], lon[r, lo[act]],
                lat[r, hi[act]], lon[r, hi[act]],
            )
            upd = np.zeros(len(rows), bool)
            upd[act] = d >= best_d[act]  # ties → higher offset wins
            tmp = np.full(len(rows), np.nan)
            tmp[act] = d
            best_d[upd] = tmp[upd]
            best_off[upd] = j
        far = best_d > allowed_error
        nf = ~far
        if nf.any():
            r, l, h = rows[nf], lo[nf], hi[nf]
            for j in range(1, K - 1):
                sel = j < (h - l)
                if not sel.any():
                    break
                keep[r[sel], l[sel] + j] = False
        if not far.any():
            break
        r, l, h = rows[far], lo[far], hi[far]
        mid = l + best_off[far]
        rows = np.concatenate([r, r])
        lo = np.concatenate([l, mid])
        hi = np.concatenate([mid, h])
        live = hi - lo > 1
        rows, lo, hi = rows[live], lo[live], hi[live]
    return keep
