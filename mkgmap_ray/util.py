"""Arrow helpers shared by the stages (no Ray imports)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_column_parts(col) -> tuple[np.ndarray, np.ndarray]:
    """Return (flat_values, offsets) of a list column as numpy arrays.

    Accepts a ChunkedArray or Array of list<numeric>. Offsets have length
    n+1. Zero-copy where Arrow allows.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ListArray) or isinstance(col, pa.LargeListArray):
        offsets = np.asarray(col.offsets)
        values = np.asarray(col.values)
        # account for a sliced array whose offsets don't start at 0
        return values, offsets.astype(np.int64)
    raise TypeError(f"not a list column: {type(col)}")


def list_lengths(col) -> np.ndarray:
    values, offsets = list_column_parts(col)
    return offsets[1:] - offsets[:-1]


def list_minmax(col) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (min, max) of a list<numeric> column; rows must be non-empty."""
    values, offsets = list_column_parts(col)
    starts = offsets[:-1]
    if len(values) == 0 or len(starts) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    vmin = np.minimum.reduceat(values, starts)
    vmax = np.maximum.reduceat(values, starts)
    return vmin.astype(np.int64), vmax.astype(np.int64)


def rebuild_list_array(values: np.ndarray, offsets: np.ndarray,
                       value_type=pa.int32()) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(values, type=value_type)
    )


def pool_concurrency(frac: float = 0.5, lo: int = 1) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster: (1, frac×CPUs).
    Lazy ray import so pure-geometry callers never pull in Ray."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (lo, max(2, int(cpus * frac)))


def stateful_map_batches(ds, cls, fn_kwargs=None, **kw):
    """``map_batches`` with a stateful class UDF, cluster-size aware.

    This is THE routing helper for every stateful stage in the engine —
    all actor-pool call sites (queries, text stats, style apply, image
    decode) go through it rather than passing ``fn_constructor_kwargs``
    + ``concurrency`` directly, so the 1-CPU fallback below applies
    everywhere.

    Normal clusters get the actor-pool form (setup once per actor in
    ``__init__``). On a ≤1-CPU cluster an actor pool DEADLOCKS the
    streaming executor: the pool's actor pins the only CPU while the
    upstream task operator (e.g. ReadParquet) waits for one, so nothing
    ever feeds the actor. There we construct the instance once on the
    driver and pass it as a plain callable — Ray Data runs it in the
    task pool (the UDF ships to the object store once), and the single
    CPU time-slices tasks normally."""
    import ray

    fn_kwargs = fn_kwargs or {}
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    if cpus <= 1:
        kw.pop("concurrency", None)
        return ds.map_batches(cls(**fn_kwargs), **kw)
    kw.setdefault("concurrency", pool_concurrency())
    return ds.map_batches(cls, fn_constructor_kwargs=fn_kwargs, **kw)
