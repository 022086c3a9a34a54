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


def cubic_interpolation(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Catmull-Rom cubic over 4 samples p[...,0..3] at fraction q —
    term-for-term the reference's ``cubicInterpolation``
    (``HGTConverter.java:656-658``)."""
    p0, p1, p2, p3 = (p[..., i] for i in range(4))
    return p1 + 0.5 * q * (
        p2 - p0 + q * (
            2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3 + q * (
                3.0 * (p1 - p2) + p3 - p0
            )
        )
    )


def bicubic(grid: np.ndarray, fx: np.ndarray, fy: np.ndarray):
    """Bicubic (Catmull-Rom) sampling mirroring
    ``HGTConverter.bicubicInterpolation`` (``HGTConverter.java:667-675``):
    4 column cubics in qy then one cubic across in qx, over the 4×4
    neighbourhood [x−1..x+2]×[y−1..y+2]. Vectorized over probe points.

    Points whose 4×4 window leaves the grid, or touches an UNDEF cell,
    return NaN (the reference falls back to bilinear there —
    ``fillArray``/``gridValuesUsable``; callers should do the same).
    """
    res = grid.shape[0] - 1
    x0 = np.clip(fx.astype(np.int64), 0, res - 1)
    y0 = np.clip(fy.astype(np.int64), 0, res - 1)
    qx = fx - x0
    qy = fy - y0
    ok = (x0 >= 1) & (x0 <= res - 2) & (y0 >= 1) & (y0 <= res - 2)
    x0c = np.clip(x0, 1, max(res - 2, 1))
    y0c = np.clip(y0, 1, max(res - 2, 1))
    # window[point, i(=x offset), j(=y offset)] with offsets -1..2;
    # reference indexes p[x][y]
    oi = np.arange(-1, 3)
    win = grid[
        (y0c[:, None, None] + oi[None, None, :]),
        (x0c[:, None, None] + oi[None, :, None]),
    ].astype(np.float64)
    void = (win == UNDEF).any(axis=(1, 2))
    cols = cubic_interpolation(win, qy[:, None])  # cubic in qy per x-offset
    out = cubic_interpolation(cols, qx)
    out[~ok | void] = np.nan
    return out


def sample_heights(grid: np.ndarray, fx, fy, method: str = "bicubic"):
    """``HGTConverter.getElevation`` dispatch: bicubic where the full 4×4
    window is available and void-free, bilinear fallback otherwise
    (``useComplexInterpolation`` + ``fillArray`` failure path), rounded
    half-up like ``Math.round``."""
    fx = np.asarray(fx, np.float64)
    fy = np.asarray(fy, np.float64)
    if method == "bilinear":
        out = bilinear(grid, fx, fy)
    else:
        out = bicubic(grid, fx, fy)
        fb = np.isnan(out)
        if fb.any():
            out[fb] = bilinear(grid, fx[fb], fy[fb])
    res = np.floor(out + 0.5)  # Math.round (half up), NaN stays NaN
    return res
