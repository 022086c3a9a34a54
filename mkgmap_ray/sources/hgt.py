"""SRTM ``.hgt`` binary raster source.

Format (``reader/hgt/HGTReader.java``): big-endian int16 samples in a
(res+1)×(res+1) grid covering one 1°×1° cell, stored NORTH-to-south —
``ele(x, y) = buffer.getShort(2*((res-y)*(res+1)+x))`` with y counted
from the SOUTH edge (``HGTReader.java:234-243``); res is derived from the
file size (``calcRes``); voids are -32768 (``UNDEF``). File name encodes
the cell corner (``N51E000.hgt``).
"""

from __future__ import annotations

import math
import os
import re

import numpy as np

UNDEF = -32768

_NAME_RE = re.compile(r"([NS])(\d{2})([EW])(\d{3})\.hgt$", re.IGNORECASE)


def hgt_cell_of(path: str) -> tuple[int, int]:
    """(lat, lon) integer degrees of the cell's south-west corner."""
    m = _NAME_RE.search(os.path.basename(path))
    if not m:
        raise ValueError(f"not an hgt file name: {path!r}")
    lat = int(m.group(2)) * (1 if m.group(1).upper() == "N" else -1)
    lon = int(m.group(4)) * (1 if m.group(3).upper() == "E" else -1)
    return lat, lon


def calc_res(n_bytes: int) -> int:
    """``HGTReader.calcRes``: res from byte size ((res+1)^2 int16s)."""
    side = math.isqrt(n_bytes // 2)
    if 2 * side * side != n_bytes:
        raise ValueError(f"not a square hgt payload: {n_bytes} bytes")
    return side - 1


def read_hgt_bytes(data: bytes) -> np.ndarray:
    """.hgt payload → (res+1, res+1) int16 grid indexed [y, x] with y
    counted from the SOUTH edge (the reference's ``ele(x, y)`` order)."""
    res = calc_res(len(data))
    north_first = np.frombuffer(data, dtype=">i2").reshape(res + 1, res + 1)
    return north_first[::-1].astype(np.int16)  # flip: row 0 = south edge


def write_hgt(path: str, grid_south_first: np.ndarray) -> None:
    """Fixture writer: south-first [y, x] grid → .hgt bytes."""
    g = np.asarray(grid_south_first, np.int16)
    assert g.shape[0] == g.shape[1]
    with open(path, "wb") as f:
        f.write(g[::-1].astype(">i2").tobytes())


def read_hgt_tiles(paths: list[str]):
    """Ray Data source: .hgt files → one row per tile with the grid as a
    flat int32 list plus cell coordinates and resolution (the
    ``HGTConverter.readers[][]`` load step as a dataset)."""
    import pyarrow as pa
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        cells_lat, cells_lon, ress, grids = [], [], [], []
        for path, payload in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            lat, lon = hgt_cell_of(path)
            grid = read_hgt_bytes(payload)
            cells_lat.append(lat)
            cells_lon.append(lon)
            ress.append(grid.shape[0] - 1)
            grids.append(grid.astype(np.int32).ravel().tolist())
        return pa.table(
            {
                "cell_lat": pa.array(cells_lat, pa.int32()),
                "cell_lon": pa.array(cells_lon, pa.int32()),
                "res": pa.array(ress, pa.int32()),
                "heights": pa.array(grids, pa.list_(pa.int32())),
            }
        )

    return rd.read_binary_files(paths, include_paths=True).map_batches(
        parse, batch_format="pyarrow", batch_size=None
    )
