"""Way assembly: the node→way hash join plus line-splitting filters.

The reference resolves each way's node refs against an id→Coord map built
from ALL nodes (``reader/osm/ElementSaver.java:49,95-106``). Columnar
equivalent: the node table is broadcast once per worker via ``ray.put``
(sorted-id arrays + ``np.searchsorted`` probe — the "broadcast small side"
join), and each refs batch resolves vectorized. For node tables too big to
broadcast, the same probe runs after a hash-partition shuffle of both
sides on ``node_id`` (``groupby`` co-location); the broadcast path is the
default because OSM node payloads per tile-job fit worker memory by
construction (mkgmap holds them all in heap).

``split_ranges_np`` mirrors ``filters/LineSplitterFilter.java:42-76``:
lines over 250 points split into ≥50%-full chunks sharing boundary points.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.polyfilters import MAX_POINTS_IN_LINE, split_long_line


def make_node_index(node_ids: np.ndarray, lat: np.ndarray, lon: np.ndarray):
    """Sorted-array hash-map stand-in (id → lat/lon), ready for ray.put."""
    order = np.argsort(node_ids, kind="stable")
    return (
        node_ids[order].astype(np.int64),
        lat[order].astype(np.int64),
        lon[order].astype(np.int64),
    )


class NodeJoin:
    """map_batches callable: resolve ``node_id`` refs against the broadcast
    node index; adds ``resolved`` (bool as int8), ``lat``, ``lon`` (0 when
    unresolved — the reference drops ways with missing nodes via
    ``is_complete``)."""

    def __init__(self, index_ref):
        import ray

        self.ids, self.lat, self.lon = ray.get(index_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = np.asarray(batch["node_id"].combine_chunks(), np.int64)
        if len(self.ids) == 0:
            hit = np.zeros(len(refs), dtype=bool)
            lat = lon = np.zeros(len(refs), np.int64)
        else:
            pos = np.clip(np.searchsorted(self.ids, refs), 0, len(self.ids) - 1)
            hit = self.ids[pos] == refs
            lat = np.where(hit, self.lat[pos], 0)
            lon = np.where(hit, self.lon[pos], 0)
        batch = batch.append_column(
            "resolved", pa.array(hit.astype(np.int8), pa.int8())
        )
        batch = batch.append_column("lat", pa.array(lat, pa.int64()))
        return batch.append_column("lon", pa.array(lon, pa.int64()))


def split_counts_np(n_points: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized chunk count + output point count of the line splitter:
    closed form of the ``split_long_line`` loop (each full step consumes
    ``max-1`` points while ≥ 1.5×max remain; the tail yields 2 chunks when
    more than max points remain, else 1). Returns (n_parts, n_out_points)
    where consecutive chunks share a boundary point."""
    n = np.asarray(n_points, np.int64)
    mx = MAX_POINTS_IN_LINE
    k = np.maximum(0, -(-(n - (mx + mx // 2 - 1)) // (mx - 1)))  # ceil
    rem = n - k * (mx - 1)
    parts = k + np.where(rem > mx, 2, 1)
    parts = np.where(n <= mx, 1, parts)
    return parts, n + parts - 1


def split_counts_oracle(n_points: int) -> tuple[int, int]:
    """Loop-based oracle for ``split_counts_np`` (calls the real range
    splitter)."""
    ranges = split_long_line(n_points)
    return len(ranges), sum(e - s for s, e in ranges)
