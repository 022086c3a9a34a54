"""Raster↔vector join: elevation sampling with bilinear interpolation.

The engine analogue of the reference's HGT pipeline
(``reader/hgt/HGTConverter.java:28-149``): an actor caches raster tiles
(``HGTConverter.readers[][]`` grid) and each probe point samples its tile
with bilinear interpolation (``interpolatedHeight``); void cells
(``HGTReader.UNDEF`` = -32768) make the sample undefined.

Raster model (FIXTURES.md T4): one row per tile —
``(cell_lat:int32, cell_lon:int32, res:int32, heights:list<int16>)`` where
``heights`` is a (res+1)×(res+1) row-major grid over the 1-unit cell
[cell_lat, cell_lat+1]×[cell_lon, cell_lon+1] in *degrees*.

For SQL-oracle parity the engine also exposes ``bilinear_fixed``, operating
on integer grid indexes with power-of-two fractional parts (exact in
doubles on both engines).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

UNDEF = -32768  # HGTReader.UNDEF


def bilinear(grid: np.ndarray, fx: np.ndarray, fy: np.ndarray):
    """Sample grid (res+1 × res+1) at fractional positions fx, fy ∈ [0, res].
    Returns float64 heights; NaN where any corner is UNDEF
    (``HGTConverter.interpolatedHeight`` void handling simplified: the
    reference falls back to nearest/lower interpolation per void corner)."""
    res = grid.shape[0] - 1
    x0 = np.clip(fx.astype(np.int64), 0, res - 1)
    y0 = np.clip(fy.astype(np.int64), 0, res - 1)
    dx = fx - x0
    dy = fy - y0
    h00 = grid[y0, x0].astype(np.float64)
    h10 = grid[y0, x0 + 1].astype(np.float64)
    h01 = grid[y0 + 1, x0].astype(np.float64)
    h11 = grid[y0 + 1, x0 + 1].astype(np.float64)
    void = (
        (grid[y0, x0] == UNDEF)
        | (grid[y0, x0 + 1] == UNDEF)
        | (grid[y0 + 1, x0] == UNDEF)
        | (grid[y0 + 1, x0 + 1] == UNDEF)
    )
    out = (
        (1 - dy) * ((1 - dx) * h00 + dx * h10)
        + dy * ((1 - dx) * h01 + dx * h11)
    )
    out[void] = np.nan
    return out


class RasterSampler:
    """map_batches actor: append interpolated ``height`` for probe points
    given lat/lon degree columns. Raster tiles broadcast via ray.put."""

    def __init__(self, raster_ref, lat_col="lat", lon_col="lon"):
        import ray

        raster = (
            ray.get(raster_ref)
            if isinstance(raster_ref, ray.ObjectRef)
            else raster_ref
        )
        # raster: pa.Table with cell_lat/cell_lon/res/heights
        self.tiles: dict[tuple[int, int], tuple[int, np.ndarray]] = {}
        for row in raster.to_pylist():
            res = int(row["res"])
            grid = np.asarray(row["heights"], np.int64).reshape(res + 1, res + 1)
            self.tiles[(int(row["cell_lat"]), int(row["cell_lon"]))] = (res, grid)
        self.lat_col = lat_col
        self.lon_col = lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = np.asarray(batch[self.lat_col].combine_chunks(), np.float64)
        lon = np.asarray(batch[self.lon_col].combine_chunks(), np.float64)
        cy = np.floor(lat).astype(np.int64)
        cx = np.floor(lon).astype(np.int64)
        out = np.full(len(lat), np.nan)
        for key, (res, grid) in self.tiles.items():
            m = (cy == key[0]) & (cx == key[1])
            if not m.any():
                continue
            fy = (lat[m] - key[0]) * res
            fx = (lon[m] - key[1]) * res
            out[m] = bilinear(grid, fx, fy)
        return batch.append_column(
            "height", pa.array(out, pa.float64(), mask=np.isnan(out))
        )


def make_raster(res: int = 1200, cell_lat: int = 0, cell_lon: int = 0,
                n_voids: int = 5, seed: int = 42) -> pa.Table:
    """Deterministic synthetic raster tile (FIXTURES.md T4): smooth integer
    function ``h(i,j) = (i*31 + j*17) % 1000`` plus seeded UNDEF voids."""
    jj, ii = np.mgrid[0 : res + 1, 0 : res + 1]
    h = ((jj * 31 + ii * 17) % 1000).astype(np.int64)
    rng = np.random.default_rng(seed)
    for _ in range(n_voids):
        h[rng.integers(0, res + 1), rng.integers(0, res + 1)] = UNDEF
    return pa.table(
        {
            "cell_lat": pa.array([cell_lat], pa.int32()),
            "cell_lon": pa.array([cell_lon], pa.int32()),
            "res": pa.array([res], pa.int32()),
            "heights": pa.array([h.ravel().tolist()], pa.list_(pa.int16())),
        }
    )
