"""Clipping stages (map_batches over Arrow batches).

Two uses, mirroring the reference:

- ``clip_to_bbox``: ingest-time clip of every feature to the job bounding
  box (the reference clips at the tile boundary in
  ``StyledConverter.addLine`` via ``AreaClipper``/``LineClipper``; elements
  fully outside are dropped like ``UnusedElementsRemoverHook``);
- ``ClipToCell``: sink-time clip of each feature to its assigned cell so
  per-tile outputs are self-contained (the analogue of
  ``MapArea.splitIntoAreas`` → ``ShapeSplitter.clipToBounds`` for elements
  crossing subdivision edges; the reference only forces this for oversized
  elements — we apply it at the sink and keep the owning-cell rule from the
  center assignment, so each source feature appears exactly once unclipped
  semantics-wise: fragments carry ``part`` indexes).

Fast path: a vectorized bbox check skips features entirely inside; only
crossing features take the per-feature Python path (rare at sane cell
sizes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.area import Area
from ..geom.clip import (
    clip_polyline,
    clip_segments_np,
    sutherland_hodgman,
    sutherland_hodgman_batch,
)

# rings up to this many vertices go through the batched SH kernel; larger
# ones (rare) take the scalar path
_SH_BATCH_MAX_VERTS = 64
from ..schema import KIND_LINE, KIND_POINT, KIND_SHAPE
from ..util import list_column_parts, list_minmax


def _geom_table(batch: pa.Table, idx: np.ndarray, out_lat, out_lon,
                out_part) -> pa.Table:
    """Rebuild a FEATURES sub-table from selected rows + new geometry."""
    taken = batch.drop_columns(["lat_hp", "lon_hp"]).take(pa.array(idx))
    lengths = np.asarray([len(a) for a in out_lat], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    flat_lat = np.concatenate(out_lat) if out_lat else np.empty(0, np.int64)
    flat_lon = np.concatenate(out_lon) if out_lon else np.empty(0, np.int64)
    lat_arr = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(flat_lat, pa.int32())
    )
    lon_arr = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(flat_lon, pa.int32())
    )
    taken = taken.append_column("lat_hp", lat_arr)
    taken = taken.append_column("lon_hp", lon_arr)
    return taken.append_column(
        "part", pa.array(np.asarray(out_part, np.int32()), pa.int32())
    )


def _clip_batch_to_rects(batch: pa.Table, rects: np.ndarray) -> pa.Table:
    """Clip each feature row to its own hp rect (n×4 array of
    min_lat, min_lon, max_lat, max_lon). Returns a new table where crossing
    lines/shapes are replaced by their clipped parts (``part`` column).

    Three tiers, fastest first: rows fully inside their rect are taken
    zero-copy; crossing 2-point lines go through the vectorized Liang-Barsky
    kernel with per-row rects; only crossing multi-point lines and shapes
    take the per-feature Python path.
    """
    if "part" in batch.column_names:  # re-clipping (bbox then cell)
        batch = batch.drop_columns(["part"])
    n = batch.num_rows
    out_cols = list(batch.column_names) + ["part"]
    if n == 0:
        return batch.append_column("part", pa.array([], pa.int32()))
    kind = np.asarray(batch["kind"].combine_chunks(), dtype=np.int64)
    lat_vals, lat_off = list_column_parts(batch["lat_hp"])
    lon_vals, lon_off = list_column_parts(batch["lon_hp"])
    lat_min, lat_max = list_minmax(batch["lat_hp"])
    lon_min, lon_max = list_minmax(batch["lon_hp"])
    npts = (lat_off[1:] - lat_off[:-1]).astype(np.int64)

    inside = (
        (lat_min >= rects[:, 0])
        & (lat_max <= rects[:, 2])
        & (lon_min >= rects[:, 1])
        & (lon_max <= rects[:, 3])
    )
    lat64 = lat_vals.astype(np.int64)
    lon64 = lon_vals.astype(np.int64)
    tables: list[pa.Table] = []

    if inside.all():
        return batch.append_column(
            "part", pa.array(np.zeros(n, np.int32), pa.int32())
        )
    ins_idx = np.nonzero(inside)[0]
    if len(ins_idx):
        t = batch.take(pa.array(ins_idx))
        t = t.append_column(
            "part", pa.array(np.zeros(len(ins_idx), np.int32), pa.int32())
        )
        tables.append(t.select(out_cols))

    # vectorized path: crossing 2-point lines (the common case when ways are
    # pre-split into segments) — one Liang-Barsky kernel call per batch
    seg = (~inside) & (kind == KIND_LINE) & (npts == 2)
    if seg.any():
        si = np.nonzero(seg)[0]
        s = lat_off[si]
        r = rects[si]
        keep, cx0, cy0, cx1, cy1 = clip_segments_np(
            lon64[s], lat64[s], lon64[s + 1], lat64[s + 1],
            (r[:, 0], r[:, 1], r[:, 2], r[:, 3]),
        )
        if keep.any():
            ki = si[keep]
            m = len(ki)
            flat_lat = np.empty(2 * m, np.int64)
            flat_lat[0::2] = cy0[keep]
            flat_lat[1::2] = cy1[keep]
            flat_lon = np.empty(2 * m, np.int64)
            flat_lon[0::2] = cx0[keep]
            flat_lon[1::2] = cx1[keep]
            taken = batch.drop_columns(["lat_hp", "lon_hp"]).take(pa.array(ki))
            offsets = pa.array(np.arange(0, 2 * m + 2, 2, np.int32), pa.int32())
            taken = taken.append_column(
                "lat_hp",
                pa.ListArray.from_arrays(offsets, pa.array(flat_lat, pa.int32())),
            )
            taken = taken.append_column(
                "lon_hp",
                pa.ListArray.from_arrays(offsets, pa.array(flat_lon, pa.int32())),
            )
            taken = taken.append_column(
                "part", pa.array(np.zeros(m, np.int32), pa.int32())
            )
            tables.append(taken.select(out_cols))

    # batched path: crossing shapes, grouped by (stripped) vertex count and
    # run through the padded-matrix Sutherland-Hodgman kernel
    first = lat_off[:-1]
    last = lat_off[1:] - 1
    closed = (npts >= 2) & (lat_vals[first] == lat_vals[np.maximum(last, 0)]) \
        & (lon_vals[first] == lon_vals[np.maximum(last, 0)])
    eff = npts - closed.astype(np.int64)
    shp = (
        (~inside) & ~seg & (kind == KIND_SHAPE)
        & (eff >= 3) & (eff <= _SH_BATCH_MAX_VERTS)
    )
    if shp.any():
        for k in np.unique(eff[shp]):
            gi = np.nonzero(shp & (eff == k))[0]
            gather = lat_off[gi][:, None] + np.arange(k)[None, :]
            cla, clo, cnt = sutherland_hodgman_batch(
                lat64[gather], lon64[gather],
                np.full(len(gi), k, np.int64), rects[gi],
            )
            keepg = cnt >= 3
            if not keepg.any():
                continue
            ki = gi[keepg]
            cla, clo, cnt = cla[keepg], clo[keepg], cnt[keepg]
            valid = np.arange(cla.shape[1])[None, :] < cnt[:, None]
            offsets = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32)
            taken = batch.drop_columns(["lat_hp", "lon_hp"]).take(pa.array(ki))
            taken = taken.append_column(
                "lat_hp",
                pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    pa.array(cla[valid].astype(np.int32)),
                ),
            )
            taken = taken.append_column(
                "lon_hp",
                pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    pa.array(clo[valid].astype(np.int32)),
                ),
            )
            taken = taken.append_column(
                "part", pa.array(np.zeros(len(ki), np.int32), pa.int32())
            )
            tables.append(taken.select(out_cols))

    # per-feature Python path: crossing multi-point lines + oversized /
    # degenerate shapes
    slow = (~inside) & ~seg & ~shp & (kind != KIND_POINT)
    if slow.any():
        sel_rows: list[int] = []
        out_lat: list[np.ndarray] = []
        out_lon: list[np.ndarray] = []
        out_part: list[int] = []
        for i in np.nonzero(slow)[0]:
            rect = tuple(int(v) for v in rects[i])
            la = lat64[lat_off[i] : lat_off[i + 1]]
            lo = lon64[lon_off[i] : lon_off[i + 1]]
            if kind[i] == KIND_LINE:
                for part, (pla, plo) in enumerate(clip_polyline(la, lo, rect)):
                    sel_rows.append(i)
                    out_lat.append(pla)
                    out_lon.append(plo)
                    out_part.append(part)
            elif kind[i] == KIND_SHAPE:
                res = sutherland_hodgman(la, lo, rect)
                if res is not None:
                    sel_rows.append(i)
                    out_lat.append(res[0])
                    out_lon.append(res[1])
                    out_part.append(0)
        if sel_rows:
            tables.append(
                _geom_table(
                    batch, np.asarray(sel_rows, np.int64),
                    out_lat, out_lon, out_part,
                ).select(out_cols)
            )

    if not tables:
        empty = batch.slice(0, 0)
        empty = empty.drop_columns(["lat_hp", "lon_hp"])
        empty = empty.append_column("lat_hp", pa.array([], pa.list_(pa.int32())))
        empty = empty.append_column("lon_hp", pa.array([], pa.list_(pa.int32())))
        return empty.append_column("part", pa.array([], pa.int32())).select(
            out_cols
        )
    return pa.concat_tables(tables) if len(tables) > 1 else tables[0]


def clip_to_bbox(ds, bbox: Area):
    """Clip every feature to the job bbox (drops outside features)."""
    rect = np.asarray(bbox.hp_bounds(), dtype=np.int64)

    def fn(batch: pa.Table) -> pa.Table:
        rects = np.broadcast_to(rect, (batch.num_rows, 4))
        return _clip_batch_to_rects(batch, rects)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


class ClipToCell:
    """Actor-pool/map_batches callable: clip each feature to the bounds of
    its assigned ``cell`` column (tile self-containment at the sink)."""

    def __init__(self, cell_bounds_hp: dict[int, tuple[int, int, int, int]]):
        n = max(cell_bounds_hp) + 1
        self.rects = np.zeros((n, 4), dtype=np.int64)
        for c, r in cell_bounds_hp.items():
            self.rects[c] = r

    def __call__(self, batch: pa.Table) -> pa.Table:
        cells = np.asarray(batch["cell"].combine_chunks(), dtype=np.int64)
        return _clip_batch_to_rects(batch, self.rects[cells])


def cell_bounds_hp(tree) -> dict[int, tuple[int, int, int, int]]:
    return {leaf: tree.bounds[leaf].hp_bounds() for leaf in tree.leaves()}
