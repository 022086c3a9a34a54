"""Per-resolution-level filter chain (map_batches over Arrow batches).

The reference applies, per subdivision and zoom level, the chain
``MapBuilder.java:1160-1256``: RoundCoordsFilter → SizeFilter →
DouglasPeuckerFilter → LineSplitterFilter → RemoveEmpty/
RemoveObsoletePointsFilter → LinePreparerFilter. The engine fuses the chain
into ONE ``map_batches`` function per level (avoiding a materialization per
filter) and runs levels independently.

Semantics per feature at resolution ``res`` (shift = 24 - res):

- snap coords to the level grid (``RoundCoordsFilter``);
- drop features whose rounded bbox collapses below ``min_size`` shifted
  units (``SizeFilter.java:59``; lines/shapes only);
- Douglas-Peucker with ``filter_dist * 2**shift`` metres tolerance at
  shift>0 (``DouglasPeuckerFilter.init``; resolution 24 is untouched,
  ``doFilter``'s early return);
- drop consecutive duplicates / degenerate results (<2 points for lines,
  <3 for shapes — ``RemoveEmpty``/``RemoveObsoletePointsFilter``);
- split lines longer than 250 points (``LineSplitterFilter``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.polyfilters import (
    MAX_POINTS_IN_LINE,
    dedupe_consecutive,
    round_coords,
    split_long_line,
)
from ..geom.simplify import douglas_peucker
from ..schema import KIND_LINE, KIND_POINT, KIND_SHAPE
from ..util import list_column_parts

DEFAULT_LEVELS = ((0, 24), (1, 22), (2, 20), (3, 18), (4, 16))
# LevelInfo.DEFAULT_LEVELS "0:24, 1:22, 2:20, 3:18, 4:16" (general/LevelInfo.java:40)


class SimplifyLevel:
    """map_batches callable for one zoom level."""

    def __init__(self, resolution: int, filter_dist: float = 5.4 / 2,
                 min_size: int = 1):
        self.res = resolution
        self.shift = 24 - resolution
        self.allowed = filter_dist * (1 << self.shift)
        self.min_size = min_size << self.shift  # map units

    def __call__(self, batch: pa.Table) -> pa.Table:
        kind = np.asarray(batch["kind"].combine_chunks(), dtype=np.int64)
        lat_vals, lat_off = list_column_parts(batch["lat_hp"])
        lon_vals, lon_off = list_column_parts(batch["lon_hp"])
        lat64 = lat_vals.astype(np.int64)
        lon64 = lon_vals.astype(np.int64)
        # vectorized grid snap over ALL coordinates at once
        lat_r, lon_r = round_coords(lat64, lon64, self.shift)

        sel_rows: list[int] = []
        out_lat: list[np.ndarray] = []
        out_lon: list[np.ndarray] = []
        out_part: list[int] = []
        min_size_hp = self.min_size << 6
        for i in range(batch.num_rows):
            la = lat_r[lat_off[i] : lat_off[i + 1]]
            lo = lon_r[lon_off[i] : lon_off[i + 1]]
            if kind[i] == KIND_POINT:
                sel_rows.append(i)
                out_lat.append(la[:1])
                out_lon.append(lo[:1])
                out_part.append(0)
                continue
            keep = dedupe_consecutive(la, lo)
            la, lo = la[keep], lo[keep]
            need = 2 if kind[i] == KIND_LINE else 3
            if len(la) < need:
                continue
            # SizeFilter: drop if bbox smaller than min dimension at level
            if self.shift > 0:
                dy = int(la.max() - la.min())
                dx = int(lo.max() - lo.min())
                if dy < min_size_hp and dx < min_size_hp:
                    continue
                dpkeep = douglas_peucker(la, lo, self.allowed)
                la, lo = la[dpkeep], lo[dpkeep]
                keep2 = dedupe_consecutive(la, lo)
                la, lo = la[keep2], lo[keep2]
                if len(la) < need:
                    continue
            if kind[i] == KIND_LINE and len(la) > MAX_POINTS_IN_LINE:
                for part, (s, e) in enumerate(split_long_line(len(la))):
                    sel_rows.append(i)
                    out_lat.append(la[s:e])
                    out_lon.append(lo[s:e])
                    out_part.append(part)
            else:
                sel_rows.append(i)
                out_lat.append(la)
                out_lon.append(lo)
                out_part.append(0)

        idx = pa.array(sel_rows, pa.int64())
        taken = batch.drop_columns(["lat_hp", "lon_hp"]).take(idx)
        lengths = np.asarray([len(a) for a in out_lat], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
        flat_lat = (
            np.concatenate(out_lat) if out_lat else np.empty(0, np.int64)
        )
        flat_lon = (
            np.concatenate(out_lon) if out_lon else np.empty(0, np.int64)
        )
        taken = taken.append_column(
            "lat_hp",
            pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(flat_lat, pa.int32())
            ),
        )
        taken = taken.append_column(
            "lon_hp",
            pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(flat_lon, pa.int32())
            ),
        )
        return taken.append_column(
            "simplify_part", pa.array(out_part, pa.int32())
        ).append_column(
            "resolution", pa.array(np.full(len(sel_rows), self.res), pa.int16())
        )


def simplify_at_level(ds, resolution: int, **kw):
    return ds.map_batches(SimplifyLevel(resolution, **kw), batch_format="pyarrow", batch_size=None)
