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


# --- .bnd boundary artifacts (BoundarySaver / BoundaryUtil analogue) ---------


def save_boundary_artifact(
    polygons, out_dir: str, raster_shift: int = DEFAULT_RASTER_SHIFT
) -> None:
    """``BoundarySaver`` analogue (``reader/osm/boundary/BoundarySaver
    .java:41-120``): persist the boundary set keyed by RASTER cell so a
    later run loads only the cells its probe points touch (the property
    that makes the reference's ``LocationHook`` scale — it reads one
    ``bounds_<lon>_<lat>.bnd`` file per touched cell).

    Layout: ``cells.parquet`` maps cell key -> polygon index (one row
    per overlapped cell, sorted by cell for row-group pruning) and
    ``polys.parquet`` holds each polygon's rings once. Unlike the
    reference we store polygons unclipped and de-duplicated rather than
    clipped per cell: containment stays bit-exact with the in-memory
    index and the artifact is smaller; the lazy per-cell load path is
    the same.
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    cell_rows = []
    pidx, pid_col, ring_col, lat_col, lon_col = [], [], [], [], []
    for idx, (pid, rings) in enumerate(polygons):
        bb_lat = np.concatenate([np.asarray(r[0], np.int64) for r in rings])
        bb_lon = np.concatenate([np.asarray(r[1], np.int64) for r in rings])
        for cy in range(
            int(bb_lat.min()) >> raster_shift,
            (int(bb_lat.max()) >> raster_shift) + 1,
        ):
            for cx in range(
                int(bb_lon.min()) >> raster_shift,
                (int(bb_lon.max()) >> raster_shift) + 1,
            ):
                cell_rows.append(((cy << 32) | (cx & 0xFFFFFFFF), idx))
        for ri, (la, lo) in enumerate(rings):
            pidx.append(idx)
            pid_col.append(pid)
            ring_col.append(ri)
            lat_col.append(np.asarray(la, np.int64).tolist())
            lon_col.append(np.asarray(lo, np.int64).tolist())
    cell_rows.sort()
    cells = pa.table(
        {
            "cell": pa.array([c for c, _ in cell_rows], pa.int64()),
            "poly_idx": pa.array([i for _, i in cell_rows], pa.int64()),
        }
    )
    pq.write_table(cells, f"{out_dir}/cells.parquet", row_group_size=4096)
    polys = pa.table(
        {
            "poly_idx": pa.array(pidx, pa.int64()),
            "poly_id": pa.array(pid_col, pa.int64()),
            "ring_idx": pa.array(ring_col, pa.int64()),
            "lat": pa.array(lat_col, pa.list_(pa.int64())),
            "lon": pa.array(lon_col, pa.list_(pa.int64())),
        }
    )
    pq.write_table(polys, f"{out_dir}/polys.parquet", row_group_size=1024)


class LazyPIPJoin:
    """map_batches actor: the ``PIPJoin`` explode join, but the boundary
    set lives in a saved artifact (``BoundaryUtil.loadBoundaryFile``
    analogue) and only the RASTER cells touched by the current batch are
    read — with an in-actor cell cache, so a 100-TB probe stream never
    materialises the whole boundary table anywhere."""

    def __init__(
        self,
        artifact_dir: str,
        lat_col: str = "lat_hp",
        lon_col: str = "lon_hp",
        raster_shift: int = DEFAULT_RASTER_SHIFT,
        keep_unmatched: bool = False,
    ):
        self.dir = artifact_dir
        self.lat_col = lat_col
        self.lon_col = lon_col
        self.raster_shift = raster_shift
        self.keep_unmatched = keep_unmatched
        self.cell_map: dict[int, list[int]] = {}
        self.loaded_cells: set[int] = set()
        self.polys: dict[int, tuple[int, list, tuple]] = {}

    def _load_cells(self, need: set[int]) -> None:
        import pyarrow.parquet as pq

        todo = sorted(need - self.loaded_cells)
        if not todo:
            return
        self.loaded_cells.update(todo)
        cells = pq.read_table(
            f"{self.dir}/cells.parquet",
            filters=[("cell", "in", todo)],
        )
        for c in todo:
            self.cell_map.setdefault(c, [])
        cc = np.asarray(cells["cell"], np.int64)
        ii = np.asarray(cells["poly_idx"], np.int64)
        for c, i in zip(cc, ii):
            self.cell_map[int(c)].append(int(i))
        miss = sorted(set(ii.tolist()) - set(self.polys))
        if not miss:
            return
        pt = pq.read_table(
            f"{self.dir}/polys.parquet",
            filters=[("poly_idx", "in", miss)],
        )
        by_idx: dict[int, list] = {}
        pid_of: dict[int, int] = {}
        for i in range(pt.num_rows):
            idx = int(pt["poly_idx"][i].as_py())
            pid_of[idx] = int(pt["poly_id"][i].as_py())
            la = np.asarray(pt["lat"][i].as_py(), np.int64)
            lo = np.asarray(pt["lon"][i].as_py(), np.int64)
            by_idx.setdefault(idx, []).append((la, lo))
        for idx, rings in by_idx.items():
            bb = (
                min(r[0].min() for r in rings),
                min(r[1].min() for r in rings),
                max(r[0].max() for r in rings),
                max(r[1].max() for r in rings),
            )
            self.polys[idx] = (pid_of[idx], rings, bb)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..geom.pip import points_in_polygon

        lat = np.asarray(batch[self.lat_col].combine_chunks(), np.int64)
        lon = np.asarray(batch[self.lon_col].combine_chunks(), np.int64)
        cy = lat >> self.raster_shift
        cx = lon >> self.raster_shift
        cell = (cy << 32) | (cx & 0xFFFFFFFF)
        self._load_cells(set(np.unique(cell).tolist()))

        order = np.argsort(cell, kind="stable")
        out_rows, out_pids = [], []
        i, n = 0, len(order)
        while i < n:
            j = i
            key = int(cell[order[i]])
            while j < n and int(cell[order[j]]) == key:
                j += 1
            rows = order[i:j]
            i = j
            for idx in self.cell_map.get(key, ()):
                pid, rings, bb = self.polys[idx]
                la, lo = lat[rows], lon[rows]
                cand = (
                    (la >= bb[0]) & (la <= bb[2])
                    & (lo >= bb[1]) & (lo <= bb[3])
                )
                if not cand.any():
                    continue
                sub = rows[cand]
                acc = np.zeros(len(sub), np.int64)
                for rla, rlo in rings:
                    acc += points_in_polygon(lat[sub], lon[sub], rla, rlo)
                hit = (acc % 2).astype(bool)
                if hit.any():
                    out_rows.append(sub[hit])
                    out_pids.append(
                        np.full(int(hit.sum()), pid, np.int64)
                    )
        if out_rows:
            rows = np.concatenate(out_rows)
            pids = np.concatenate(out_pids)
        else:
            rows = np.empty(0, np.int64)
            pids = np.empty(0, np.int64)
        if self.keep_unmatched:
            matched = np.zeros(batch.num_rows, bool)
            matched[rows] = True
            un = np.flatnonzero(~matched)
            rows = np.concatenate([rows, un])
            pids = np.concatenate([pids, np.full(len(un), -1)])
            order = np.argsort(rows, kind="stable")
            rows, pids = rows[order], pids[order]
            pids_pa = pa.array(pids, pa.int64(), mask=pids < 0)
        else:
            order = np.argsort(rows, kind="stable")
            rows, pids = rows[order], pids[order]
            pids_pa = pa.array(pids, pa.int64())
        return batch.take(pa.array(rows, pa.int64())).append_column(
            "boundary_id", pids_pa
        )
