"""Size-driven splitters and decimation filters.

Round-2 additions to the per-level filter chain, mirroring:

- ``filters/LineSizeSplitterFilter.java:28-192``: lines whose bbox
  exceeds the 15-bit subdivision dimension first get midpoints inserted
  until every segment's bbox fits (``splitLinesToMaxSize`` with
  ``maxSize-10``), then are chunked greedily while the running bbox
  stays within ``maxSize`` (chunks share the boundary point);
- ``filters/PolygonSplitterBase.split`` (``PolygonSplitterBase.java:
  45-65``): a too-big polygon halves along its longer axis, the cut
  aligned like ``Area.split(2,1,shift)`` (falling back to the midpoint
  when alignment collapses);
- ``filters/PolygonSplitterFilter.java:32-59``: recursive halving while
  a shape exceeds ``MAX_POINT_IN_ELEMENT`` (250) points;
- ``filters/PolygonSubdivSizeSplitterFilter.java:40-119``: recursive
  halving while the estimated RGN size or bbox dimension exceeds the
  subdivision limits;
- ``filters/SmoothingFilter.java:35-170``: decimation by running
  average — one output point each time the accumulated |Δlat|+|Δlon|
  from the group start exceeds ``MIN_SPACING << shift`` (Java
  truncating-division average, last input re-fed when the group had >1
  point, end point appended when distinct);
- ``filters/LinePreparerFilter.java:28-135``: reject elements with too
  few distinct points at the target resolution; rotate a shape's start
  point so the largest delta is not encoded (fewer bits for all points).

All helpers take/return (lat, lon) int64 MAP-UNIT arrays (the filters
run after RoundCoordsFilter in the reference chain).
"""

from __future__ import annotations

import numpy as np

from .area import Area

LINE_MAX_SIZE = 0x7FFF  # LineSizeSplitterFilter.MAX_SIZE
POLY_MAX_SIZE = 0xFFFF  # PolygonSplitterBase.MAX_SIZE
MAX_POINT_IN_ELEMENT = 250
MAX_RGN_SIZE = 0xFFF8
SMOOTH_MIN_SPACING = 5


def _filter_max_size(shift: int, base: int = LINE_MAX_SIZE) -> int:
    if shift > 15:
        shift = 16
    return min((1 << 24) - 1, max(base << shift, 0x8000))


def line_size_split(lat, lon, shift: int):
    """``LineSizeSplitterFilter.doFilter``: returns a list of (lat, lon)
    chunks; a line already within the limit returns itself unchanged."""
    lat = np.asarray(lat, np.int64)
    lon = np.asarray(lon, np.int64)
    max_size = _filter_max_size(shift)
    if len(lat) == 0:
        return []
    dim = max(
        int(lat.max() - lat.min()), int(lon.max() - lon.min())
    )
    if dim < max_size:
        return [(lat, lon)]
    # insert midpoints until every segment bbox fits (maxSize-10)
    limit = max_size - 10
    pts_lat = list(map(int, lat))
    pts_lon = list(map(int, lon))
    i = len(pts_lat) - 2
    while i >= 0:
        w = abs(pts_lon[i] - pts_lon[i + 1])
        h = abs(pts_lat[i] - pts_lat[i + 1])
        if w > limit or h > limit:
            pts_lat.insert(
                i + 1, pts_lat[i] + (pts_lat[i + 1] - pts_lat[i]) // 2
            )
            pts_lon.insert(
                i + 1, pts_lon[i] + (pts_lon[i + 1] - pts_lon[i]) // 2
            )
            i += 1
        else:
            i -= 1
    # greedy chunking while the running bbox stays within maxSize
    out = []
    cur_lat: list[int] = []
    cur_lon: list[int] = []
    mnla = mnlo = 1 << 60
    mxla = mxlo = -(1 << 60)
    prev = None
    for la, lo in zip(pts_lat, pts_lon):
        mnla, mxla = min(mnla, la), max(mxla, la)
        mnlo, mxlo = min(mnlo, lo), max(mxlo, lo)
        if max(mxla - mnla, mxlo - mnlo) > max_size:
            out.append(
                (np.asarray(cur_lat, np.int64), np.asarray(cur_lon, np.int64))
            )
            cur_lat, cur_lon = [prev[0]], [prev[1]]
            mnla, mxla = min(prev[0], la), max(prev[0], la)
            mnlo, mxlo = min(prev[1], lo), max(prev[1], lo)
        cur_lat.append(la)
        cur_lon.append(lo)
        prev = (la, lo)
    if len(cur_lat) > 1:
        out.append(
            (np.asarray(cur_lat, np.int64), np.asarray(cur_lon, np.int64))
        )
    return out


def _half_plane_clip(lat, lon, cut: int, is_longitude: bool, keep_low: bool):
    """Sutherland-Hodgman of a closed ring against one half-plane at
    ``cut`` (inclusive both sides: points ON the line belong to both
    halves, like ``ShapeSplitter.splitShape`` emitting the cut line into
    both outputs)."""
    from .clip import _clip_edge

    la = np.asarray(lat, np.float64)
    lo = np.asarray(lon, np.float64)
    if is_longitude:
        edge = 1 if keep_low else 0  # lon <= cut / lon >= cut
    else:
        edge = 3 if keep_low else 2
    cla, clo = _clip_edge(la, lo, edge, float(cut))
    if len(cla) < 3:
        return None
    ila = np.round(cla).astype(np.int64)
    ilo = np.round(clo).astype(np.int64)
    keep = np.ones(len(ila), bool)
    keep[1:] = (ila[1:] != ila[:-1]) | (ilo[1:] != ilo[:-1])
    ila, ilo = ila[keep], ilo[keep]
    while len(ila) > 1 and ila[0] == ila[-1] and ilo[0] == ilo[-1]:
        ila, ilo = ila[:-1], ilo[:-1]
    if len(ila) < 3:
        return None
    return ila, ilo


def polygon_split_half(lat, lon, shift: int):
    """``PolygonSplitterBase.split``: halve a closed shape along its
    longer axis at the ``Area.split``-aligned cut (midpoint fallback).
    Returns 1-2 (lat, lon) rings."""
    lat = np.asarray(lat, np.int64)
    lon = np.asarray(lon, np.int64)
    b = Area(int(lat.min()), int(lon.min()),
             int(lat.max()), int(lon.max()))
    if b.width > b.height:
        areas = b.split(2, 1, shift)
        cut = areas[0].max_lon if areas else b.min_lon + b.width // 2
        is_longitude = True
    else:
        areas = b.split(1, 2, shift)
        cut = areas[0].max_lat if areas else b.min_lat + b.height // 2
        is_longitude = False
    out = []
    for keep_low in (True, False):
        r = _half_plane_clip(lat, lon, int(cut), is_longitude, keep_low)
        if r is not None:
            out.append(r)
    return out or [(lat, lon)]


def polygon_split_filter(lat, lon, shift: int,
                         max_points: int = MAX_POINT_IN_ELEMENT):
    """``PolygonSplitterFilter``: recursively halve while any part has
    too many points (the ``MustSplitException`` loop)."""
    work = [(np.asarray(lat, np.int64), np.asarray(lon, np.int64))]
    out = []
    while work:
        la, lo = work.pop()
        if len(la) < max_points:
            out.append((la, lo))
            continue
        parts = polygon_split_half(la, lo, shift)
        if len(parts) == 1 and len(parts[0][0]) >= len(la):
            out.append((la, lo))  # cannot reduce further
            continue
        work.extend(parts)
    return out


def _shape_size_ok(la: np.ndarray, lo: np.ndarray, max_dim: int) -> bool:
    n = len(la)
    n_elements = 1 + (max(n, 1) - 1) // MAX_POINT_IN_ELEMENT
    size = n_elements * 11 + n * 4
    if size > MAX_RGN_SIZE:
        return False
    dim = max(int(la.max() - la.min()), int(lo.max() - lo.min()))
    return dim <= max_dim


def polygon_subdiv_size_split(lat, lon, shift: int):
    """``PolygonSubdivSizeSplitterFilter``: halve until estimated RGN
    bytes and bbox dimension fit the subdivision."""
    max_dim = _filter_max_size(shift, POLY_MAX_SIZE)
    work = [(np.asarray(lat, np.int64), np.asarray(lon, np.int64))]
    out = []
    while work:
        la, lo = work.pop()
        if _shape_size_ok(la, lo, max_dim):
            out.append((la, lo))
            continue
        parts = polygon_split_half(la, lo, shift)
        if len(parts) == 1 and len(parts[0][0]) >= len(la):
            out.append((la, lo))
            continue
        work.extend(parts)
    return out


def smoothing_filter(lat, lon, shift: int):
    """``SmoothingFilter.doFilter`` decimation (scalar mirror of the
    running-average loop — group sizes are data-dependent so the loop is
    inherently sequential; it only runs at coarse levels where few points
    survive)."""
    lat = np.asarray(lat, np.int64)
    lon = np.asarray(lon, np.int64)
    n = len(lat)
    if shift == 0 or n <= 5:
        return lat, lon
    stepsize = SMOOTH_MIN_SPACING << shift
    out_la = [int(lat[0])]
    out_lo = [int(lon[0])]
    start_la, start_lo = int(lat[0]), int(lon[0])
    acc_la = acc_lo = count = step = 0
    i = 1
    while i < n:
        la, lo = int(lat[i]), int(lon[i])
        count += 1
        acc_la += la
        acc_lo += lo
        step += abs(start_la - la) + abs(start_lo - lo)
        if step > stepsize:
            # Java truncating division (values can be negative)
            av_la = int(acc_la / count) if count else 0
            av_lo = int(acc_lo / count) if count else 0
            out_la.append(av_la)
            out_lo.append(av_lo)
            if count > 1:
                i -= 1  # re-feed the last input point
            start_la, start_lo = av_la, av_lo
            acc_la = acc_lo = count = step = 0
        i += 1
    if (out_la[-1], out_lo[-1]) != (int(lat[-1]), int(lon[-1])):
        out_la.append(int(lat[-1]))
        out_lo.append(int(lon[-1]))
    return np.asarray(out_la, np.int64), np.asarray(out_lo, np.int64)


def bits_needed(val: int) -> int:
    """``LinePreparer.bitsNeeded``: bit length of |val|."""
    return int(abs(int(val))).bit_length()


def line_preparer(lat, lon, shift: int, is_shape: bool):
    """``LinePreparerFilter.doFilter``: returns the (possibly rotated)
    (lat, lon) arrays, or None when the element has too few distinct
    points at the target resolution. A shape's start point rotates to
    the position of the largest delta so that delta is never encoded
    (largest bit-width reduction, then smallest rotation)."""
    lat = np.asarray(lat, np.int64)
    lon = np.asarray(lon, np.int64)
    n = len(lat)
    min_required = 3 if is_shape else 2
    closed = n >= 2 and lat[0] == lat[-1] and lon[0] == lon[-1]
    if is_shape and closed:
        min_required += 1
    # resolution-local coordinates (subdiv round: drop shift bits)
    rla = lat >> shift
    rlo = lon >> shift
    d_la = np.diff(rla)
    d_lo = np.diff(rlo)
    keep = (d_la != 0) | (d_lo != 0)
    n_encoded = 1 + int(keep.sum())
    if n_encoded < min_required:
        return None
    if not is_shape:
        return lat, lon
    # rotation: per axis, largest and 2nd-largest delta bit widths
    max_bits = [0, 0]
    max_bits2 = [0, 0]
    max_pos = [0, 0]
    for i in np.nonzero(keep)[0]:
        for k, d in ((0, int(d_lo[i])), (1, int(d_la[i]))):
            nb = bits_needed(d)
            if nb > max_bits2[k]:
                if nb > max_bits[k]:
                    max_bits2[k] = max_bits[k]
                    max_bits[k] = nb
                    max_pos[k] = int(i) + 1
                else:
                    max_bits2[k] = nb
    reduction = 0
    rotation = 0
    for k in range(2):
        delta = max_bits[k] - max_bits2[k]
        if delta > reduction or (delta == reduction
                                 and rotation > max_pos[k]):
            reduction = delta
            rotation = max_pos[k]
    if rotation == 0:
        return lat, lon
    core_la = lat[:-1] if closed else lat
    core_lo = lon[:-1] if closed else lon
    rot_la = np.roll(core_la, -rotation)
    rot_lo = np.roll(core_lo, -rotation)
    if closed:
        rot_la = np.append(rot_la, rot_la[0])
        rot_lo = np.append(rot_lo, rot_lo[0])
    return rot_la, rot_lo
