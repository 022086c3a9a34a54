"""Geometry feature sources.

- ``features_from_images``: geo-tagged image rows → point FEATURES (the
  image+caption table is the engine's primary payload per BASELINE.json;
  each image is a POI-like point feature, ``image_id`` joins the payload
  back at sinks).
- ``synthetic_ways``: deterministic line/shape features (roads grid,
  buildings, bbox-crossing ways, >250-point ways) — the engine's
  ``test-map:`` generator analogue
  (``reader/test/ElementTestDataSource.java``).
- ``derive_features_*``: deterministic, SQL-expressible derivation of
  features from the driver's TPC-H-ish parquet tables (see
  ``pipelines/derive.py`` for the exact formulas mirrored in oracle SQL).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.coords import DELTA_SHIFT, deg_to_mu
from ..schema import KIND_LINE, KIND_POINT, KIND_SHAPE


def features_from_images(images: pa.Table, id_offset: int = 0) -> pa.Table:
    """Point features at each image's (lat, lon) degrees."""
    n = images.num_rows
    lat_mu = deg_to_mu(np.asarray(images["lat"], dtype=np.float64))
    lon_mu = deg_to_mu(np.asarray(images["lon"], dtype=np.float64))
    offsets = pa.array(np.arange(n + 1, dtype=np.int32))
    return pa.table(
        {
            "feature_id": pa.array(np.arange(n, dtype=np.int64) + id_offset),
            "kind": pa.array(np.zeros(n, dtype=np.int8)),
            "lat_hp": pa.ListArray.from_arrays(
                offsets, pa.array((lat_mu << DELTA_SHIFT).astype(np.int32))
            ),
            "lon_hp": pa.ListArray.from_arrays(
                offsets, pa.array((lon_mu << DELTA_SHIFT).astype(np.int32))
            ),
            "image_id": images["image_id"],
        }
    )


def synthetic_ways(
    n_lines: int,
    n_shapes: int,
    seed: int = 42,
    bbox_mu=(0, 0, 1 << 16, 1 << 16),
    id_offset: int = 1 << 40,
) -> pa.Table:
    """Deterministic line/shape features inside (and crossing) ``bbox_mu``.

    Every 10th line is a random walk with 300 points (exercises the
    250-point splitter); every 7th line crosses the bbox border (exercises
    clipping); shapes are closed polygons of 4-12 vertices."""
    rng = np.random.default_rng(seed)
    min_lat, min_lon, max_lat, max_lon = bbox_mu
    span_lat, span_lon = max_lat - min_lat, max_lon - min_lon

    ids, kinds, rows_lat, rows_lon, image_ids = [], [], [], [], []
    fid = id_offset
    for i in range(n_lines):
        npts = 300 if i % 10 == 0 else int(rng.integers(2, 12))
        cy = rng.integers(min_lat, max_lat)
        cx = rng.integers(min_lon, max_lon)
        if i % 7 == 0:  # start outside the bbox to exercise the clipper
            cy = min_lat - span_lat // 10
        step = max(span_lat // 200, 1)
        la = cy + np.cumsum(rng.integers(-step, step + 1, npts))
        lo = cx + np.cumsum(rng.integers(-step, step + 1, npts))
        ids.append(fid)
        kinds.append(KIND_LINE)
        rows_lat.append((la.astype(np.int64) << DELTA_SHIFT).tolist())
        rows_lon.append((lo.astype(np.int64) << DELTA_SHIFT).tolist())
        image_ids.append(None)
        fid += 1
    for i in range(n_shapes):
        nv = int(rng.integers(4, 13))
        cy = rng.integers(min_lat + span_lat // 20, max_lat - span_lat // 20)
        cx = rng.integers(min_lon + span_lon // 20, max_lon - span_lon // 20)
        r = int(rng.integers(span_lat // 100, span_lat // 20))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        la = (cy + r * np.sin(ang)).astype(np.int64)
        lo = (cx + r * np.cos(ang)).astype(np.int64)
        ids.append(fid)
        kinds.append(KIND_SHAPE)
        rows_lat.append((la << DELTA_SHIFT).tolist())
        rows_lon.append((lo << DELTA_SHIFT).tolist())
        image_ids.append(None)
        fid += 1

    return pa.table(
        {
            "feature_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.int8()),
            "lat_hp": pa.array(rows_lat, pa.list_(pa.int32())),
            "lon_hp": pa.array(rows_lon, pa.list_(pa.int32())),
            "image_id": pa.array(image_ids, pa.string()),
        }
    )
