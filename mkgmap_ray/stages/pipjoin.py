"""Point-in-polygon join (actor pool holding a gridded polygon index).

The engine analogue of the reference's ``LocationHook``
(``reader/osm/LocationHook.java:120-239``): each feature's representative
point probes a boundary index and inherits the ids of every polygon that
contains it. The index mirrors ``BoundaryGrid``
(``reader/osm/boundary/BoundaryGrid.java:31-79``): polygons are bucketed by
bbox into a fixed raster (``BoundaryUtil.RASTER`` = 2^15 map units in the
reference; configurable here), so a probe only tests polygons whose bbox
raster cells overlap the point's cell.

The boundary set is the SMALL side: it is ``ray.put`` once on the driver
and each actor builds its index in ``__init__`` — no shuffle, the probe
side streams through ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.pip import points_in_polygon

DEFAULT_RASTER_SHIFT = 15 + 6  # 2^15 map units, in hp units


class PolygonIndex:
    """Grid-bucketed polygon set over hp coordinates.

    ``polygons``: list of (poly_id, [(ring_lat, ring_lon), ...]) — first
    ring outer, rest holes (even-odd).
    """

    def __init__(self, polygons, raster_shift: int = DEFAULT_RASTER_SHIFT):
        self.raster_shift = raster_shift
        self.polys = []
        self.buckets: dict[tuple[int, int], list[int]] = {}
        for idx, (pid, rings) in enumerate(polygons):
            rings = [
                (np.asarray(la, np.int64), np.asarray(lo, np.int64))
                for la, lo in rings
            ]
            bb = (
                min(r[0].min() for r in rings),
                min(r[1].min() for r in rings),
                max(r[0].max() for r in rings),
                max(r[1].max() for r in rings),
            )
            self.polys.append((pid, rings, bb))
            for cy in range(
                int(bb[0]) >> raster_shift, (int(bb[2]) >> raster_shift) + 1
            ):
                for cx in range(
                    int(bb[1]) >> raster_shift, (int(bb[3]) >> raster_shift) + 1
                ):
                    self.buckets.setdefault((cy, cx), []).append(idx)

    def query(self, lat_hp: np.ndarray, lon_hp: np.ndarray):
        """Return (row_idx, poly_id) match arrays for a batch of points."""
        lat_hp = np.asarray(lat_hp, np.int64)
        lon_hp = np.asarray(lon_hp, np.int64)
        cy = lat_hp >> self.raster_shift
        cx = lon_hp >> self.raster_shift
        # group probe points by raster cell, then candidate polygons per cell
        order = np.lexsort((cx, cy))
        out_rows: list[np.ndarray] = []
        out_pids: list[np.ndarray] = []
        i = 0
        n = len(order)
        while i < n:
            j = i
            key = (cy[order[i]], cx[order[i]])
            while j < n and (cy[order[j]], cx[order[j]]) == key:
                j += 1
            rows = order[i:j]
            i = j
            for idx in self.buckets.get((int(key[0]), int(key[1])), ()):
                pid, rings, bb = self.polys[idx]
                la, lo = lat_hp[rows], lon_hp[rows]
                cand = (
                    (la >= bb[0]) & (la <= bb[2]) & (lo >= bb[1]) & (lo <= bb[3])
                )
                if not cand.any():
                    continue
                sub = rows[cand]
                acc = np.zeros(len(sub), dtype=np.int64)
                for ring_lat, ring_lon in rings:
                    acc += points_in_polygon(
                        lat_hp[sub], lon_hp[sub], ring_lat, ring_lon
                    )
                hit = (acc % 2).astype(bool)
                if hit.any():
                    out_rows.append(sub[hit])
                    out_pids.append(np.full(int(hit.sum()), pid, np.int64))
        if not out_rows:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_rows), np.concatenate(out_pids)


class PIPJoin:
    """map_batches actor: emits one output row per (point, containing
    polygon) pair — the join explode form. Pass ``keep_unmatched=True`` for
    a left join with null boundary_id."""

    def __init__(self, polygons_ref, lat_col="lat_hp", lon_col="lon_hp",
                 keep_unmatched: bool = False,
                 raster_shift: int = DEFAULT_RASTER_SHIFT):
        import ray

        polygons = (
            ray.get(polygons_ref)
            if isinstance(polygons_ref, ray.ObjectRef)
            else polygons_ref
        )
        self.index = PolygonIndex(polygons, raster_shift)
        self.lat_col = lat_col
        self.lon_col = lon_col
        self.keep_unmatched = keep_unmatched

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = np.asarray(batch[self.lat_col].combine_chunks(), np.int64)
        lon = np.asarray(batch[self.lon_col].combine_chunks(), np.int64)
        rows, pids = self.index.query(lat, lon)
        if self.keep_unmatched:
            matched = np.zeros(batch.num_rows, dtype=bool)
            matched[rows] = True
            un = np.flatnonzero(~matched)
            rows = np.concatenate([rows, un])
            pids_arr = np.concatenate([pids, np.full(len(un), -1)])
            order = np.argsort(rows, kind="stable")
            rows, pids_arr = rows[order], pids_arr[order]
            pids_pa = pa.array(pids_arr, pa.int64(), mask=pids_arr < 0)
        else:
            order = np.argsort(rows, kind="stable")
            rows, pids_arr = rows[order], pids[order]
            pids_pa = pa.array(pids_arr, pa.int64())
        out = batch.take(pa.array(rows, pa.int64()))
        return out.append_column("boundary_id", pids_pa)
