"""Country-border routing-node check
(``osmstyle/StyledConverter.java:628-726``,
``checkRoutingNodesAtAdminBoundaries`` + ``splitBoundary``).

The reference clips admin-boundary ways to the tile bbox, splits them
into ≤20-point chunks, loads the chunks into an ``ElementQuadTree``,
and for every road whose bbox overlaps a chunk computes road-segment ×
border-segment intersections: an intersection within snap distance of
an existing road node marks that node as an external routing node
(``setOnCountryBorder``); otherwise a NEW node is inserted at the
intersection, deduplicated across roads via a shared coordinate map
(NOD3/NOD4 external-node input).

Engine shape: the border set is dimension-sized → broadcast once via
``ray.put``; each ``map_batches`` actor builds a grid-bucketed SEGMENT
index in ``__init__`` (the QuadTree analogue — cell → border-segment
ids) and processes road batches fully vectorized: candidate pairs come
from the grid, orientation cross-products classify the pairs, and the
snap-vs-insert decision is a masked select. Nothing here shuffles; the
output is (way_id, crossing stats) partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

DEFAULT_CELL_SHIFT = 12  # 4096-unit grid cells
SNAP_DIST = 1.0  # map units; reference snaps within 1 (Coord.distance)
MAX_CHUNK = 20  # splitBoundary max points per indexed chunk


def split_boundary(points_lat, points_lon, max_pts: int = MAX_CHUNK):
    """``splitBoundary``: cut a border way into ≤max_pts chunks (chunks
    share their boundary vertex so no crossing is lost)."""
    la = np.asarray(points_lat, np.int64)
    lo = np.asarray(points_lon, np.int64)
    out = []
    pos = 0
    while pos < len(la):
        right = min(len(la), pos + max_pts)
        if right - pos >= 2:
            out.append((la[pos:right].copy(), lo[pos:right].copy()))
        pos = right - 1
        if right == len(la):
            break
    return out


class BorderSegmentIndex:
    """Grid-bucketed border segment set (the ElementQuadTree analogue)."""

    def __init__(self, borders, cell_shift: int = DEFAULT_CELL_SHIFT):
        """``borders``: list of (lat_array, lon_array) polylines."""
        self.cell_shift = cell_shift
        y1s, x1s, y2s, x2s = [], [], [], []
        for la, lo in borders:
            la = np.asarray(la, np.int64)
            lo = np.asarray(lo, np.int64)
            if len(la) < 2:
                continue
            y1s.append(la[:-1]); x1s.append(lo[:-1])
            y2s.append(la[1:]); x2s.append(lo[1:])
        if y1s:
            self.by1 = np.concatenate(y1s); self.bx1 = np.concatenate(x1s)
            self.by2 = np.concatenate(y2s); self.bx2 = np.concatenate(x2s)
        else:
            self.by1 = self.bx1 = self.by2 = self.bx2 = np.zeros(0, np.int64)
        # sorted (cell_key -> border-seg id) arrays: candidate lookup is
        # one searchsorted per road cell, no Python per-row loop
        ck, cb = _explode_cells(
            self.by1, self.bx1, self.by2, self.bx2, cell_shift
        )
        order = np.argsort(ck, kind="stable")
        self.cell_keys = ck[order]
        self.cell_segs = cb[order]

    def candidate_pairs(self, ry1, rx1, ry2, rx2):
        """(road_seg_idx, border_seg_idx) candidate pairs via the grid —
        fully vectorized (explode road bboxes to cells, searchsorted
        into the sorted border cell table, repeat-expand the runs)."""
        rk, rr = _explode_cells(ry1, rx1, ry2, rx2, self.cell_shift)
        lo = np.searchsorted(self.cell_keys, rk, side="left")
        hi = np.searchsorted(self.cell_keys, rk, side="right")
        cnt = hi - lo
        hit = cnt > 0
        lo, cnt, rr = lo[hit], cnt[hit], rr[hit]
        # expand run [lo, lo+cnt) for each road cell
        total = int(cnt.sum())
        if total == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        starts = np.repeat(lo, cnt)
        offs = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt
        )
        pairs_b = self.cell_segs[starts + offs]
        pairs_r = np.repeat(rr, cnt)
        # a pair can repeat when a segment pair shares several cells
        uniq = np.unique(
            pairs_r * (len(self.by1) + 1) + pairs_b
        )
        return uniq // (len(self.by1) + 1), uniq % (len(self.by1) + 1)


def _explode_cells(y1, x1, y2, x2, shift):
    """(cell_key, seg_idx) pairs for every grid cell each segment's bbox
    covers — vectorized 2-level repeat expansion."""
    cy1 = np.minimum(y1, y2) >> shift
    cy2 = np.maximum(y1, y2) >> shift
    cx1 = np.minimum(x1, x2) >> shift
    cx2 = np.maximum(x1, x2) >> shift
    ny = (cy2 - cy1 + 1).astype(np.int64)
    nx = (cx2 - cx1 + 1).astype(np.int64)
    ncell = ny * nx
    total = int(ncell.sum())
    if total == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    seg = np.repeat(np.arange(len(y1), dtype=np.int64), ncell)
    off = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(ncell)[:-1])), ncell
    )
    cy = cy1[seg] + off // nx[seg]
    cx = cx1[seg] + off % nx[seg]
    # pack (cy, cx) into one sortable key; coordinates are signed, so
    # bias into the positive range first
    key = ((cy + (1 << 20)) << 22) | (cx + (1 << 20))
    return key, seg


def _cross(ax, ay, bx, by):
    return ax * by - ay * bx


def segment_intersections(ry1, rx1, ry2, rx2, by1, bx1, by2, bx2):
    """Vectorized closed-segment intersection for paired segments.

    Returns (mask, iy, ix): which pairs intersect (touching endpoints
    count, collinear overlap does not — matching
    ``Utils.getSegmentSegmentIntersection``) and the intersection
    point in float map units."""
    rdx = (rx2 - rx1).astype(np.float64)
    rdy = (ry2 - ry1).astype(np.float64)
    bdx = (bx2 - bx1).astype(np.float64)
    bdy = (by2 - by1).astype(np.float64)
    exd = (bx1 - rx1).astype(np.float64)
    eyd = (by1 - ry1).astype(np.float64)
    den = _cross(rdx, rdy, bdx, bdy)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = _cross(exd, eyd, bdx, bdy) / den  # along road
        u = _cross(exd, eyd, rdx, rdy) / den  # along border
    mask = (
        (den != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    )
    ix = rx1 + t * rdx
    iy = ry1 + t * rdy
    return mask, iy, ix


class BorderNodeCheck:
    """Actor-pool stage: per road segment, classify border crossings as
    snap-to-existing-node vs new external routing node."""

    def __init__(self, borders_ref, snap_dist: float = SNAP_DIST,
                 cell_shift: int = DEFAULT_CELL_SHIFT):
        borders = (
            ray.get(borders_ref)
            if isinstance(borders_ref, ray.ObjectRef)
            else borders_ref
        )
        chunks = []
        for la, lo in borders:
            chunks.extend(split_boundary(la, lo))
        self.index = BorderSegmentIndex(chunks, cell_shift)
        self.snap_dist = snap_dist

    def __call__(self, batch: pa.Table) -> pa.Table:
        wid = np.asarray(batch["way_id"].combine_chunks(), np.int64)
        ry1 = np.asarray(batch["y1"].combine_chunks(), np.int64)
        rx1 = np.asarray(batch["x1"].combine_chunks(), np.int64)
        ry2 = np.asarray(batch["y2"].combine_chunks(), np.int64)
        rx2 = np.asarray(batch["x2"].combine_chunks(), np.int64)
        pr, pb = self.index.candidate_pairs(ry1, rx1, ry2, rx2)
        n = len(wid)
        n_cross = np.zeros(n, np.int64)
        n_snap = np.zeros(n, np.int64)
        n_new = np.zeros(n, np.int64)
        sum_ix = np.zeros(n, np.int64)
        if len(pr):
            idx = self.index
            mask, iy, ix = segment_intersections(
                ry1[pr], rx1[pr], ry2[pr], rx2[pr],
                idx.by1[pb], idx.bx1[pb], idx.by2[pb], idx.bx2[pb],
            )
            pr = pr[mask]
            iy, ix = iy[mask], ix[mask]
            d1 = np.hypot(iy - ry1[pr], ix - rx1[pr])
            d2 = np.hypot(iy - ry2[pr], ix - rx2[pr])
            snap = np.minimum(d1, d2) < self.snap_dist
            np.add.at(n_cross, pr, 1)
            np.add.at(n_snap, pr[snap], 1)
            np.add.at(n_new, pr[~snap], 1)
            np.add.at(
                sum_ix, pr, np.round(ix).astype(np.int64)
            )
        return pa.table(
            {
                "way_id": pa.array(wid, pa.int64()),
                "n_cross": pa.array(n_cross, pa.int64()),
                "n_snap": pa.array(n_snap, pa.int64()),
                "n_new": pa.array(n_new, pa.int64()),
                "sum_ix": pa.array(sum_ix, pa.int64()),
            }
        )
