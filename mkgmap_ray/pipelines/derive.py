"""Deterministic derivation of geo features from the driver's parquet
tables (region/nation/.../lineitem/events).

The driver's correctness gate compares every Ray query against DuckDB SQL
over the SAME tables, so each derivation here is integer arithmetic that a
SQL oracle mirrors verbatim (multiplicative hashes mod 2**16; no floats).
The constants below are referenced by ``__ray_entry__.oracle_sql``.

Coordinates are 24-bit map units in a 65536×65536-unit square (≈1.4°×1.4°,
the reference's ``MAX_DIVISION_SIZE``-scale tile, ``MapSplitter.java:44``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.coords import DELTA_SHIFT
from ..schema import KIND_LINE, KIND_POINT, KIND_SHAPE

SPAN = 1 << 16  # map units
A_LAT = 48271  # minstd multipliers — SQL-mirrorable integer hashes
A_LON = 16807
CLIP_RECT_MU = (16384, 16384, 49152, 49152)  # (min_lat, min_lon, max_lat, max_lon)

# fixed grid for the SQL-oracle cell assignment: 16×16 cells of 4096 units
GRID_SHIFT = 12
GRID_N = SPAN >> GRID_SHIFT


def event_points_np(event_id: np.ndarray):
    """lat/lon map units of event-derived points (mirrored in SQL)."""
    eid = event_id.astype(np.int64)
    lat = (eid * A_LAT) % SPAN
    lon = (eid * A_LON) % SPAN
    return lat, lon


def lineitem_segments_np(orderkey, partkey, suppkey, linenumber):
    """Segment endpoints (map units) per lineitem row (mirrored in SQL)."""
    ok = orderkey.astype(np.int64)
    pk = partkey.astype(np.int64)
    sk = suppkey.astype(np.int64)
    ln = linenumber.astype(np.int64)
    y0 = (ok * A_LAT + ln * 977) % SPAN
    x0 = (ok * A_LON + ln * 661) % SPAN
    y1 = y0 + (pk % 8192) - 4096
    x1 = x0 + ((sk * 131) % 8192) - 4096
    return x0, y0, x1, y1


def order_triangles_np(orderkey):
    """Triangle vertices (map units) per order (mirrored in SQL)."""
    ok = orderkey.astype(np.int64)
    cy = (ok * A_LAT) % SPAN
    cx = (ok * A_LON) % SPAN
    r = 256 + ok % 1024
    # vertices: (cy+r, cx), (cy-r, cx+r), (cy-r, cx-r)
    return cy, cx, r


def features_from_testdata(sf_dir: str) -> pa.Table:
    """events → points, lineitem → 2-point lines, orders → triangle shapes.

    Feature ids are disjoint: events ``eid``, lineitem ``2^40 + ok*8+ln``,
    orders ``2^41 + ok``.
    """
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id"])
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    )
    od = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])

    eid = np.asarray(ev["event_id"], dtype=np.int64)
    plat, plon = event_points_np(eid)

    ok = np.asarray(li["l_orderkey"], dtype=np.int64)
    ln = np.asarray(li["l_linenumber"], dtype=np.int64)
    x0, y0, x1, y1 = lineitem_segments_np(
        ok,
        np.asarray(li["l_partkey"], dtype=np.int64),
        np.asarray(li["l_suppkey"], dtype=np.int64),
        ln,
    )

    ook = np.asarray(od["o_orderkey"], dtype=np.int64)
    cy, cx, r = order_triangles_np(ook)

    ne, nl, ns = len(eid), len(ok), len(ook)
    # lineitem (orderkey, linenumber) is NOT unique in the synthetic data —
    # use the row position for a unique feature id (ids never appear in the
    # SQL oracles, which key on the geometry columns themselves)
    ids = np.concatenate(
        [eid, (1 << 40) + np.arange(nl, dtype=np.int64), (1 << 41) + ook]
    )
    kinds = np.concatenate(
        [
            np.full(ne, KIND_POINT, np.int8),
            np.full(nl, KIND_LINE, np.int8),
            np.full(ns, KIND_SHAPE, np.int8),
        ]
    )
    # flat coordinate arrays: 1 pt per event, 2 per lineitem, 3 per order
    flat_lat = np.concatenate(
        [
            plat,
            np.stack([y0, y1], axis=1).ravel(),
            np.stack([cy + r, cy - r, cy - r], axis=1).ravel(),
        ]
    ) << DELTA_SHIFT
    flat_lon = np.concatenate(
        [
            plon,
            np.stack([x0, x1], axis=1).ravel(),
            np.stack([cx, cx + r, cx - r], axis=1).ravel(),
        ]
    ) << DELTA_SHIFT
    lengths = np.concatenate(
        [np.full(ne, 1), np.full(nl, 2), np.full(ns, 3)]
    )
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)

    return pa.table(
        {
            "feature_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.int8()),
            "lat_hp": pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(flat_lat.astype(np.int32))
            ),
            "lon_hp": pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(flat_lon.astype(np.int32))
            ),
            "image_id": pa.array([None] * len(ids), pa.string()),
        }
    )


def _mk_features(ids, kinds, flat_lat_mu, flat_lon_mu, pts_per_row: int):
    """FEATURES-schema Arrow table from fixed-arity per-row geometry
    (map-unit flats are shifted to hp here)."""
    n = len(ids)
    offsets = pa.array(
        np.arange(0, pts_per_row * (n + 1), pts_per_row, dtype=np.int32)
    )
    return pa.table(
        {
            "feature_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
            "kind": pa.array(np.full(n, kinds, np.int8), pa.int8()),
            "lat_hp": pa.ListArray.from_arrays(
                offsets,
                pa.array((flat_lat_mu << DELTA_SHIFT).astype(np.int32)),
            ),
            "lon_hp": pa.ListArray.from_arrays(
                offsets,
                pa.array((flat_lon_mu << DELTA_SHIFT).astype(np.int32)),
            ),
            "image_id": pa.array([None] * n, pa.string()),
        }
    )


# key salt per replica copy — spreads replicated geometry deterministically
_REPEAT_SALT = 10_000_019


def _events_to_features(batch: pa.Table, repeat: int = 1) -> pa.Table:
    eid0 = np.asarray(batch["event_id"].combine_chunks(), np.int64)
    parts = []
    for k in range(repeat):
        eid = eid0 + k * _REPEAT_SALT
        lat, lon = event_points_np(eid)
        parts.append(_mk_features(eid, KIND_POINT, lat, lon, 1))
    return parts[0] if repeat == 1 else pa.concat_tables(parts)


def _lineitem_to_features(batch: pa.Table, repeat: int = 1) -> pa.Table:
    ok0 = np.asarray(batch["l_orderkey"].combine_chunks(), np.int64)
    pk = np.asarray(batch["l_partkey"].combine_chunks(), np.int64)
    sk = np.asarray(batch["l_suppkey"].combine_chunks(), np.int64)
    ln = np.asarray(batch["l_linenumber"].combine_chunks(), np.int64)
    parts = []
    for k in range(repeat):
        ok = ok0 + k * _REPEAT_SALT
        x0, y0, x1, y1 = lineitem_segments_np(ok, pk, sk, ln)
        # content-derived id (block-independent): duplicate source tuples
        # yield identical geometry, so a shared id is harmless downstream
        ids = (1 << 40) + (
            ((ok * 8 + ln) * 1_000_003 + pk * 2_654_435_761 + sk * 97)
            & ((1 << 39) - 1)
        )
        flat_lat = np.stack([y0, y1], axis=1).ravel()
        flat_lon = np.stack([x0, x1], axis=1).ravel()
        parts.append(_mk_features(ids, KIND_LINE, flat_lat, flat_lon, 2))
    return parts[0] if repeat == 1 else pa.concat_tables(parts)


def _orders_to_features(batch: pa.Table, repeat: int = 1) -> pa.Table:
    ook0 = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
    parts = []
    for k in range(repeat):
        ook = ook0 + k * _REPEAT_SALT
        cy, cx, r = order_triangles_np(ook)
        flat_lat = np.stack([cy + r, cy - r, cy - r], axis=1).ravel()
        flat_lon = np.stack([cx, cx + r, cx - r], axis=1).ravel()
        parts.append(
            _mk_features((1 << 41) + ook, KIND_SHAPE, flat_lat, flat_lon, 3)
        )
    return parts[0] if repeat == 1 else pa.concat_tables(parts)


def features_dataset(sf_dir: str, repeat: int = 1):
    """Streaming FEATURES derivation: three parquet sources → per-batch
    geometry synthesis → union. Never materializes on the driver (the
    100-TB path; ``features_from_testdata`` is the small driver-side twin
    used in unit tests).

    ``repeat`` > 1 deterministically replicates each source row into
    ``repeat`` distinct features (salted keys) — used by the scaling
    benchmark to reach a compute-dominant input size from small testdata.

    Read blocks are sized by OUTPUT rows (source rows × ``repeat``), not
    source bytes: downstream map tasks (assign/clip) are one task per
    block, so without this a high ``repeat`` leaves a handful of huge,
    skewed tasks (round-4 measurement: 24 clip tasks, max 31 s vs mean
    2.6 s — utilization ~25%). ``MKGMAP_FEATURE_BLOCK_ROWS`` sets the
    target output rows per block (default 150k).
    """
    import functools
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    target = int(os.environ.get("MKGMAP_FEATURE_BLOCK_ROWS", 150_000))

    def _read(name: str, columns, fan: int):
        path = f"{sf_dir}/{name}.parquet"
        rows = pq.ParquetFile(path).metadata.num_rows * repeat * fan
        n_blocks = max(4, min(1024, rows // max(target, 1)))
        return rd.read_parquet(
            path, columns=columns, override_num_blocks=n_blocks
        )

    ev = _read("events", ["event_id"], 1).map_batches(
        functools.partial(_events_to_features, repeat=repeat),
        batch_format="pyarrow", batch_size=None,
    )
    li = _read(
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"], 1,
    ).map_batches(
        functools.partial(_lineitem_to_features, repeat=repeat),
        batch_format="pyarrow", batch_size=None,
    )
    od = _read("orders", ["o_orderkey"], 1).map_batches(
        functools.partial(_orders_to_features, repeat=repeat),
        batch_format="pyarrow", batch_size=None,
    )
    return ev.union(li, od)
