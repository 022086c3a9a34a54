"""Clipping kernels.

- ``clip_segment`` / ``clip_polyline``: Liang-Barsky polyline↔bbox clipping
  mirroring the reference's ``general/LineClipper.java:41-252`` — integer
  high-precision coordinates, ``checkSide`` parameter tests, new endpoints
  rounded half-away-from-zero (``LineClipper.calcCoord``), degenerate
  (zero-length) clipped segments dropped, and closed ways re-joined across
  the start point.
- ``sutherland_hodgman``: polygon↔rectangle clipping mirroring
  ``util/ShapeSplitter.clipSinglePathWithSutherlandHodgman``
  (``ShapeSplitter.java:129-157``): clip successively against the four
  rectangle edges, emitting edge intersections in double precision.

All inputs are hp (2^30) integer coordinate arrays; the clip window is an
hp-inclusive rectangle ``(min_lat, min_lon, max_lat, max_lon)``.
"""

from __future__ import annotations

import numpy as np


def _round_half_away_scalar(y: float) -> int:
    return int(y + 0.5) if y >= 0 else int(y - 0.5)


def clip_segment(
    x0: int, y0: int, x1: int, y1: int, rect: tuple[int, int, int, int]
) -> tuple[int, int, int, int] | None:
    """Liang-Barsky clip of one segment (x=lon_hp, y=lat_hp) to ``rect`` =
    (min_lat, min_lon, max_lat, max_lon) in hp units.

    Returns clipped endpoints or None if fully outside / degenerate.
    Mirrors ``LineClipper.clip(Area, Coord[])`` (``LineClipper.java:104-227``).
    """
    min_lat, min_lon, max_lat, max_lon = rect
    if (
        min_lon <= x0 <= max_lon
        and min_lon <= x1 <= max_lon
        and min_lat <= y0 <= max_lat
        and min_lat <= y1 <= max_lat
    ):
        return (x0, y0, x1, y1)

    dx = x1 - x0
    dy = y1 - y0
    t0, t1 = 0.0, 1.0
    for p, q in (
        (-dx, -(min_lon - x0)),
        (dx, max_lon - x0),
        (-dy, -(min_lat - y0)),
        (dy, max_lat - y0),
    ):
        if p == 0:
            if q < 0:
                return None
        else:
            r = q / p
            if p < 0:
                if r > t1:
                    return None
                if r > t0:
                    t0 = r
            else:
                if r < t0:
                    return None
                if r < t1:
                    t1 = r
    nx0, ny0, nx1, ny1 = x0, y0, x1, y1
    if t0 > 0:
        nx0 = _round_half_away_scalar(x0 + t0 * dx)
        ny0 = _round_half_away_scalar(y0 + t0 * dy)
    if t1 < 1:
        nx1 = _round_half_away_scalar(x0 + t1 * dx)
        ny1 = _round_half_away_scalar(y0 + t1 * dy)
    if t0 >= t1 or (nx0 == nx1 and ny0 == ny1):
        return None
    return (nx0, ny0, nx1, ny1)


def clip_segments_np(x0, y0, x1, y1, rect):
    """Vectorized Liang-Barsky over independent segments (same semantics as
    ``clip_segment``; the parametric interval form ``tmin = max(0,
    min(tx_lo,tx_hi), min(ty_lo,ty_hi))`` is algebraically identical to the
    reference's per-edge ``checkSide`` updates — IEEE division/negation are
    exact, so the computed t values match bit-for-bit).

    Degenerate input segments (both endpoints equal) are rejected, mirroring
    ``LineClipper.clip``'s polyline loop which skips them.

    ``rect`` may be four scalars or four arrays (per-segment rects, used by
    the per-cell clip stage).

    Returns (keep_mask, cx0, cy0, cx1, cy1) int64 arrays (full length;
    values only meaningful where keep_mask).
    """
    x0 = np.asarray(x0, np.int64)
    y0 = np.asarray(y0, np.int64)
    x1 = np.asarray(x1, np.int64)
    y1 = np.asarray(y1, np.int64)
    min_lat, min_lon, max_lat, max_lon = (
        np.asarray(v, np.int64) for v in rect
    )
    dx = x1 - x0
    dy = y1 - y0

    NEG = -1e300
    POS = 1e300
    with np.errstate(divide="ignore", invalid="ignore"):
        tx_lo = (min_lon - x0) / dx
        tx_hi = (max_lon - x0) / dx
        ty_lo = (min_lat - y0) / dy
        ty_hi = (max_lat - y0) / dy
    x_ok = dx != 0
    y_ok = dy != 0
    t0 = np.maximum(
        0.0,
        np.maximum(
            np.where(x_ok, np.minimum(tx_lo, tx_hi), NEG),
            np.where(y_ok, np.minimum(ty_lo, ty_hi), NEG),
        ),
    )
    t1 = np.minimum(
        1.0,
        np.minimum(
            np.where(x_ok, np.maximum(tx_lo, tx_hi), POS),
            np.where(y_ok, np.maximum(ty_lo, ty_hi), POS),
        ),
    )
    reject = (
        (~x_ok & ((x0 < min_lon) | (x0 > max_lon)))
        | (~y_ok & ((y0 < min_lat) | (y0 > max_lat)))
        | (t0 >= t1)
        | (~x_ok & ~y_ok)
    )

    def rha(v):
        return np.trunc(np.where(v >= 0, v + 0.5, v - 0.5)).astype(np.int64)

    cx0 = np.where(t0 > 0, rha(x0 + t0 * dx), x0)
    cy0 = np.where(t0 > 0, rha(y0 + t0 * dy), y0)
    cx1 = np.where(t1 < 1, rha(x0 + t1 * dx), x1)
    cy1 = np.where(t1 < 1, rha(y0 + t1 * dy), y1)
    reject |= (cx0 == cx1) & (cy0 == cy1)
    return ~reject, cx0, cy0, cx1, cy1


def clip_polyline(
    lat_hp: np.ndarray, lon_hp: np.ndarray, rect: tuple[int, int, int, int]
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Clip a polyline to ``rect``; may emit several sublines
    (``LineClipper.clip``, ``LineClipper.java:41-102``).

    Returns a list of (lat_hp, lon_hp) int64 array pairs. If the whole line
    is inside, returns the original arrays as the single entry. Closed input
    (first point == last point) re-joins the first and last emitted sublines
    when they meet at the original start point.
    """
    lat_hp = np.asarray(lat_hp, dtype=np.int64)
    lon_hp = np.asarray(lon_hp, dtype=np.int64)
    min_lat, min_lon, max_lat, max_lon = rect
    inside = (
        (lat_hp >= min_lat)
        & (lat_hp <= max_lat)
        & (lon_hp >= min_lon)
        & (lon_hp <= max_lon)
    )
    if inside.all():
        return [(lat_hp, lon_hp)]

    out: list[tuple[list[int], list[int]]] = []
    cur_lat: list[int] | None = None
    cur_lon: list[int] | None = None
    last: tuple[int, int] | None = None
    for i in range(len(lat_hp) - 1):
        y0, x0 = int(lat_hp[i]), int(lon_hp[i])
        y1, x1 = int(lat_hp[i + 1]), int(lon_hp[i + 1])
        if y0 == y1 and x0 == x1:
            continue
        seg = clip_segment(x0, y0, x1, y1, rect)
        if seg is None:
            cur_lat = cur_lon = None
            continue
        sx0, sy0, sx1, sy1 = seg
        if cur_lat is None or (sx0, sy0) != last:
            cur_lat, cur_lon = [sy0, sy1], [sx0, sx1]
            out.append((cur_lat, cur_lon))
        else:
            cur_lat.append(sy1)
            cur_lon.append(sx1)
        last = (sx1, sy1)

    # closed way: join last subline into first when they meet
    if (
        len(out) >= 2
        and lat_hp[0] == lat_hp[-1]
        and lon_hp[0] == lon_hp[-1]
        and out[0][0][0] == out[-1][0][-1]
        and out[0][1][0] == out[-1][1][-1]
    ):
        first = out.pop(0)
        out[-1] = (out[-1][0] + first[0][1:], out[-1][1] + first[1][1:])

    return [
        (np.asarray(la, dtype=np.int64), np.asarray(lo, dtype=np.int64))
        for la, lo in out
    ]


def _clip_edge(
    lat: np.ndarray, lon: np.ndarray, edge: int, val: float
) -> tuple[np.ndarray, np.ndarray]:
    """Clip polygon against one rectangle half-plane; vectorized.

    edge: 0 = lon >= val (left), 1 = lon <= val (right),
          2 = lat >= val (bottom), 3 = lat <= val (top).
    """
    n = len(lat)
    if n == 0:
        return lat, lon
    coord = lon if edge in (0, 1) else lat
    if edge in (0, 2):
        inside = coord >= val
    else:
        inside = coord <= val
    prev = np.roll(np.arange(n), 1)
    ins_p = inside[prev]
    cross = inside != ins_p

    # intersection of segment (prev -> cur) with edge line
    la0, lo0 = lat[prev], lon[prev]
    la1, lo1 = lat, lon
    if edge in (0, 1):
        denom = lo1 - lo0
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(denom != 0, (val - lo0) / denom, 0.0)
        ix_lat = la0 + t * (la1 - la0)
        ix_lon = np.full(n, float(val))
    else:
        denom = la1 - la0
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(denom != 0, (val - la0) / denom, 0.0)
        ix_lon = lo0 + t * (lo1 - lo0)
        ix_lat = np.full(n, float(val))

    counts = cross.astype(np.int64) + inside.astype(np.int64)
    total = int(counts.sum())
    out_lat = np.empty(total, dtype=np.float64)
    out_lon = np.empty(total, dtype=np.float64)
    offs = np.cumsum(counts) - counts
    # intersections go first in each slot, then the inside vertex
    ci = offs[cross]
    out_lat[ci] = ix_lat[cross]
    out_lon[ci] = ix_lon[cross]
    vi = offs[inside] + cross[inside].astype(np.int64)
    out_lat[vi] = la1[inside]
    out_lon[vi] = lo1[inside]
    return out_lat, out_lon


def sutherland_hodgman(
    lat_hp: np.ndarray, lon_hp: np.ndarray, rect: tuple[int, int, int, int]
) -> tuple[np.ndarray, np.ndarray] | None:
    """Sutherland-Hodgman polygon clip against an hp rectangle
    (``ShapeSplitter.clipSinglePathWithSutherlandHodgman``,
    ``ShapeSplitter.java:129-157``).

    The input ring may or may not repeat its first point; the output ring is
    open (no repeated first point), rounded back to int64 hp coordinates
    half-away-from-zero, with consecutive duplicates collapsed. Returns None
    when fewer than 3 points survive.
    """
    lat = np.asarray(lat_hp, dtype=np.float64)
    lon = np.asarray(lon_hp, dtype=np.float64)
    if len(lat) >= 2 and lat[0] == lat[-1] and lon[0] == lon[-1]:
        lat, lon = lat[:-1], lon[:-1]
    if len(lat) < 3:
        return None
    min_lat, min_lon, max_lat, max_lon = rect
    for edge, val in ((0, min_lon), (1, max_lon), (2, min_lat), (3, max_lat)):
        lat, lon = _clip_edge(lat, lon, edge, float(val))
        if len(lat) < 3:
            return None
    ilat = np.trunc(np.where(lat >= 0, lat + 0.5, lat - 0.5)).astype(np.int64)
    ilon = np.trunc(np.where(lon >= 0, lon + 0.5, lon - 0.5)).astype(np.int64)
    # collapse consecutive duplicates (including wrap-around)
    keep = np.ones(len(ilat), dtype=bool)
    keep[1:] = (ilat[1:] != ilat[:-1]) | (ilon[1:] != ilon[:-1])
    ilat, ilon = ilat[keep], ilon[keep]
    while len(ilat) > 1 and ilat[0] == ilat[-1] and ilon[0] == ilon[-1]:
        ilat, ilon = ilat[:-1], ilon[:-1]
    if len(ilat) < 3:
        return None
    return ilat, ilon


def sutherland_hodgman_batch(lat2d, lon2d, counts, rects):
    """Vectorized Sutherland-Hodgman over MANY rings at once.

    Same semantics as ``sutherland_hodgman`` (one call per ring), but all
    rings advance through the four edge passes together on padded (m, W)
    matrices — the scale path for shape-heavy batches where most rings
    cross their cell bounds.

    ``lat2d``/``lon2d``: (m, K) padded vertex matrices (open rings — the
    caller strips a repeated first point); ``counts``: (m,) valid vertex
    counts; ``rects``: (m, 4) per-ring hp clip rectangles
    (min_lat, min_lon, max_lat, max_lon).

    Returns (out_lat2d, out_lon2d, out_counts) — int64 padded matrices
    (width grows per pass to the worst surviving ring, since each
    Sutherland-Hodgman pass over a non-convex ring can emit up to ~3n/2
    vertices) and per-ring vertex counts (0 where the ring vanished, <3
    must be dropped by the caller like the scalar kernel returning None).
    """
    m, K = np.asarray(lat2d).shape
    W = K
    LA = np.asarray(lat2d, np.float64)
    LO = np.asarray(lon2d, np.float64)
    c = np.asarray(counts, np.int64).copy()
    rects = np.asarray(rects, np.int64)

    for edge, val in (
        (0, rects[:, 1]), (1, rects[:, 3]), (2, rects[:, 0]), (3, rects[:, 2])
    ):
        rows = np.arange(m)[:, None]
        J = np.arange(W)[None, :]
        valf = val.astype(np.float64)[:, None]
        V = J < c[:, None]
        coord = LO if edge in (0, 1) else LA
        if edge in (0, 2):
            inside = (coord >= valf) & V
        else:
            inside = (coord <= valf) & V
        safe_c = np.maximum(c, 1)
        P = (J - 1) % safe_c[:, None]
        LAp = LA[rows, P]
        LOp = LO[rows, P]
        coord_p = LOp if edge in (0, 1) else LAp
        ins_p = inside[rows, P]
        cross = (inside != ins_p) & V

        denom = coord - coord_p
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(denom != 0, (valf - coord_p) / denom, 0.0)
        if edge in (0, 1):
            ixLA = LAp + t * (LA - LAp)
            ixLO = np.broadcast_to(valf, LA.shape)
        else:
            ixLO = LOp + t * (LO - LOp)
            ixLA = np.broadcast_to(valf, LA.shape)

        nj = cross.astype(np.int64) + inside.astype(np.int64)
        ends = np.cumsum(nj, axis=1)
        offs = ends - nj
        # each pass can GROW a non-convex ring (up to ~3n/2 vertices), so
        # size the output buffers to the worst surviving ring, not K+const
        W = max(int(ends[:, -1].max(initial=0)), 4)
        NLA = np.zeros((m, W), np.float64)
        NLO = np.zeros((m, W), np.float64)
        cr, cj = np.nonzero(cross)
        NLA[cr, offs[cr, cj]] = ixLA[cr, cj]
        NLO[cr, offs[cr, cj]] = ixLO[cr, cj]
        ir, ij = np.nonzero(inside)
        pos = offs[ir, ij] + cross[ir, ij].astype(np.int64)
        NLA[ir, pos] = LA[ir, ij]
        NLO[ir, pos] = LO[ir, ij]
        LA, LO = NLA, NLO
        c = ends[:, -1]
        c = np.where(c < 3, 0, c)

    # round half-away-from-zero back to int
    iLA = np.trunc(np.where(LA >= 0, LA + 0.5, LA - 0.5)).astype(np.int64)
    iLO = np.trunc(np.where(LO >= 0, LO + 0.5, LO - 0.5)).astype(np.int64)

    # collapse consecutive duplicates (within valid range), like the scalar
    J = np.arange(W)[None, :]
    V = J < c[:, None]
    prev_la = np.roll(iLA, 1, axis=1)
    prev_lo = np.roll(iLO, 1, axis=1)
    keep = V & ((iLA != prev_la) | (iLO != prev_lo) | (J == 0))
    nj = keep.astype(np.int64)
    ends = np.cumsum(nj, axis=1)
    offs = ends - nj
    CLA = np.zeros((m, W), np.int64)
    CLO = np.zeros((m, W), np.int64)
    kr, kj = np.nonzero(keep)
    CLA[kr, offs[kr, kj]] = iLA[kr, kj]
    CLO[kr, offs[kr, kj]] = iLO[kr, kj]
    c = ends[:, -1]

    # strip wrap-around duplicates (first == last), iterating like the
    # scalar while-loop (bounded by W passes, usually 0-1)
    for _ in range(W):
        has = c > 1
        last = np.maximum(c - 1, 0)
        dup = has & (
            (CLA[np.arange(m), last] == CLA[:, 0])
            & (CLO[np.arange(m), last] == CLO[:, 0])
        )
        if not dup.any():
            break
        c = np.where(dup, c - 1, c)
    c = np.where(c < 3, 0, c)
    return CLA, CLO, c
