"""Block-range tile writer: the engine's partitioned parquet sink.

Layout: after range-clustering by ``tile_id`` (sort), each sorted block
writes ONE parquet file ``tiles/part-{lo:08d}-{hi:08d}-{digest}.parquet``
covering the contiguous tile range [lo, hi] — file count is bounded by
the block count (not the tile count; the one-dir-per-tile hive layout
exploded into tens of thousands of tiny files whose re-read dominated
the benchmarked pipeline), while the layout stays resumable at tile
granularity via the lineage manifest.

The writer RETURNS per-tile aggregates of exactly the rows it wrote, so
the write and the manifest stats are ONE pass over the expensive
pipeline — the reference OverviewBuilder's invariant (stats describe
the bytes on disk) without a second-stage read.

File names carry a content digest so identical re-runs overwrite their
own files idempotently.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _content_digest(batch: pa.Table) -> str:
    h = hashlib.sha1()
    h.update(str(batch.num_rows).encode())
    for col in batch.columns:
        for chunk in col.chunks if isinstance(col, pa.ChunkedArray) else [col]:
            for buf in chunk.buffers():
                if buf is not None:
                    h.update(memoryview(buf)[: 1 << 16])
                    h.update(str(len(buf)).encode())
    return h.hexdigest()[:12]


def parse_part_range(name: str) -> tuple[int, int] | None:
    base = os.path.basename(name)
    if not (base.startswith("part-") and base.endswith(".parquet")):
        return None
    bits = base[5:-8].split("-")
    if len(bits) < 2:
        return None
    try:
        return int(bits[0]), int(bits[1])
    except ValueError:
        return None


def count_kind_stats(batch: pa.Table, uniq: np.ndarray,
                     inv: np.ndarray) -> dict[str, tuple[str, np.ndarray]]:
    """Per-tile feature counts by kind — the geo pipeline's stat set
    (the analogue of the reference functional tests' per-level counts)."""
    kind = np.asarray(batch["kind"].combine_chunks(), np.int64)
    out = {}
    for k, name in ((0, "n_points"), (1, "n_lines"), (2, "n_shapes")):
        out[name] = (
            "sum",
            np.bincount(inv, weights=kind == k, minlength=len(uniq)).astype(
                np.int64
            ),
        )
    return out


class QuarantineGuard:
    """``--keep-going`` per-tile failure quarantine (the reference skips
    a failed map and reports it, ``main/Main.java:566-575``): wraps any
    per-batch transform over tile-assigned rows. A failing batch is
    retried one TILE at a time; tiles that still fail are dropped from
    THIS run and recorded as quarantine lineage entries in the manifest
    (``RunManifest.write_quarantine``) so the run completes and a later
    run retries them (quarantined tiles never get ``_done`` markers).
    The guard runs inside the task, so the recovery is per-partition
    and parallel — no driver round trip."""

    def __init__(self, fn, out_dir: str, tile_col: str = "tile_id"):
        self.fn = fn
        self.out_dir = out_dir
        self.tile_col = tile_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        try:
            return self.fn(batch)
        except Exception:
            from ..state.manifest import RunManifest

            man = RunManifest(self.out_dir)
            tid = np.asarray(batch[self.tile_col].combine_chunks(), np.int64)
            goods: list[pa.Table] = []
            for t in np.unique(tid):
                sub = batch.filter(pa.array(tid == t))
                try:
                    goods.append(self.fn(sub))
                except Exception as e:  # noqa: BLE001 — quarantine & go on
                    man.write_quarantine(int(t), repr(e))
            if goods:
                return pa.concat_tables(goods)
            # every tile failed: derive the output schema from an empty
            # probe so the stream's schema stays stable
            return self.fn(batch.slice(0, 0))


class BlockTileWriter:
    """map_batches callable over a tile_id-sorted stream: writes each
    block as one range file and emits per-tile partial aggregates.

    ``stats_fn(batch, uniq, inv) -> {col: (op, per-uniq int64 array)}``
    with op ∈ sum|min|max; ``stat_ops`` must list the same columns (used
    for empty batches and the driver combine)."""

    def __init__(self, out_dir: str, stats_fn=None,
                 stat_ops: dict[str, str] | None = None):
        self.tiles_dir = os.path.join(out_dir, "tiles")
        os.makedirs(self.tiles_dir, exist_ok=True)
        self.stats_fn = stats_fn
        self.stat_ops = stat_ops or {}

    def _empty(self) -> pa.Table:
        cols = {
            "tile_id": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
        }
        for name in self.stat_ops:
            cols[name] = pa.array([], pa.int64())
        cols["file"] = pa.array([], pa.string())
        return pa.table(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._empty()
        tid = np.asarray(batch["tile_id"].combine_chunks(), np.int64)
        lo, hi = int(tid.min()), int(tid.max())
        digest = _content_digest(batch)
        basename = f"part-{lo:08d}-{hi:08d}-{digest}.parquet"
        path = os.path.join(self.tiles_dir, basename)
        pq.write_table(batch, path)

        uniq, inv = np.unique(tid, return_inverse=True)
        stat_arrays: dict[str, np.ndarray] = {
            "n_rows": np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        }
        if self.stats_fn is not None:
            for name, (_op, arr) in self.stats_fn(batch, uniq, inv).items():
                stat_arrays[name] = arr.astype(np.int64)

        # the marker is written by THIS task, right after its parquet —
        # lineage stays one parallel pass, never a per-tile driver loop
        from ..state.manifest import RunManifest

        RunManifest(os.path.dirname(self.tiles_dir)).write_block_marker(
            basename,
            {
                int(t): {
                    name: int(arr[i]) for name, arr in stat_arrays.items()
                }
                for i, t in enumerate(uniq)
            },
        )

        cols = {"tile_id": pa.array(uniq, pa.int64())}
        for name, arr in stat_arrays.items():
            cols[name] = pa.array(arr, pa.int64())
        cols["file"] = pa.array([basename] * len(uniq))
        return pa.table(cols)


def combine_tile_partials(parts_iter, stat_ops: dict[str, str] | None = None):
    """Driver combine of the writer's per-block partials (bounded by
    tiles × blocks). Returns (pandas DataFrame with one row per tile,
    dict tile_id -> list of contributing files)."""
    import pandas as pd

    stat_ops = stat_ops or {}
    acc = [b for b in parts_iter]
    cols = ["tile_id", "n_rows", *stat_ops]
    if not acc or sum(b.num_rows for b in acc) == 0:
        return pd.DataFrame(columns=cols).astype("int64"), {}
    t = pa.concat_tables(acc)
    tid = np.asarray(t["tile_id"].combine_chunks(), np.int64)
    files = t["file"].to_pylist()
    order = np.argsort(tid, kind="stable")
    tid_s = tid[order]
    starts = np.flatnonzero(np.r_[True, tid_s[1:] != tid_s[:-1]])
    out = {"tile_id": tid_s[starts]}
    for name, op in (("n_rows", "sum"), *stat_ops.items()):
        v = np.asarray(t[name].combine_chunks(), np.int64)[order]
        if op == "sum":
            out[name] = np.add.reduceat(v, starts)
        elif op == "min":
            out[name] = np.minimum.reduceat(v, starts)
        elif op == "max":
            out[name] = np.maximum.reduceat(v, starts)
        else:
            raise ValueError(f"unknown stat op {op!r}")
    file_of: dict[int, list[str]] = {}
    for i in order:
        file_of.setdefault(int(tid[i]), []).append(files[i])
    return pd.DataFrame(out).astype("int64"), file_of
