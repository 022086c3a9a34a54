"""The flagship tiling pipeline: features → split tree → tile assignment →
per-cell clip → per-level simplify → partitioned tile output with lineage.

The Ray-Data expression of the reference's per-tile compile
(``main/MapMaker.makeMap`` → ``build/MapBuilder.makeMapAreas``,
``MapBuilder.java:740-814``): the split tree IS ``MapSplitter``'s
subdivision, the ``cell`` column IS ``MapArea.pickArea``'s assignment, and
the per-tile parquet + ``_done`` marker are the ``.img`` + TDB analogue.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..geom.area import Area
from ..grid import SplitTree
from ..splitter import SplitLimits
from ..stages.assign import assign_cells, build_split_tree, narrow_stats
from ..stages.clipstage import ClipToCell, cell_bounds_hp, clip_to_bbox
from ..stages.simplifystage import simplify_at_level
from ..state.manifest import RunManifest, tree_digest


def build_tiles(
    features_ds,
    shift: int = 0,
    limits: SplitLimits = SplitLimits(),
    bounds: Area | None = None,
    clip: bool = True,
):
    """features Dataset → (tiled Dataset with cell/tile_id [+clip parts],
    tile metadata Arrow table, SplitTree)."""
    if bounds is not None:
        features_ds = clip_to_bbox(features_ds, bounds)
    tree = build_split_tree(narrow_stats(features_ds), shift, limits, bounds)
    assigned, meta = assign_cells(features_ds, tree)
    if clip:
        # bounded batches: clip intermediates (per-part coordinate lists)
        # are several times the input width — whole-block batches pay the
        # slow-first-touch cost documented in BASELINE.md
        import os as _os

        assigned = assigned.map_batches(
            ClipToCell(cell_bounds_hp(tree)), batch_format="pyarrow",
            batch_size=int(_os.environ.get("MKGMAP_ASSIGN_BATCH", 100_000)),
        )
    return assigned, meta, tree


def _tile_ids_np(batch: pa.Table) -> np.ndarray:
    """tile_id column as int64, tolerating the string/dictionary form a
    hive-partitioned parquet read gives back."""
    col = batch["tile_id"].combine_chunks()
    if not pa.types.is_integer(col.type):
        col = col.cast(pa.int64())
    return np.asarray(col, np.int64)


def clean_stale_partitions(out_dir: str, done: set[int],
                           man: "RunManifest | None" = None) -> set[int]:
    """Delete range files that touch any tile WITHOUT a ``_done`` marker
    (leftovers of a failed/invalidated run) and DEMOTE marked tiles whose
    data lived in a deleted file, iterating to a fixpoint. Returns the
    effective done set — exactly the tiles whose bytes are still fully on
    disk. Without this, rewriting a tile would append new files next to
    stale ones and the range would hold duplicate rows."""
    import os

    from ..stages.tilewriter import parse_part_range

    tiles_dir = f"{out_dir}/tiles"
    done = set(done)
    if not os.path.isdir(tiles_dir):
        return done
    files = {
        name: rng
        for name in os.listdir(tiles_dir)
        if (rng := parse_part_range(name)) is not None
    }
    # broken pairs first: parquet without marker (crashed mid-block) and
    # marker without parquet are both invalid
    if man is not None:
        marked = set()
        for mpath, data in man.iter_block_markers():
            if data["file"] in files:
                marked.add(data["file"])
            else:
                os.remove(mpath)
        for name in list(files):
            if name not in marked:
                os.remove(os.path.join(tiles_dir, name))
                del files[name]
    changed = True
    demoted: set[int] = set()
    while changed:
        changed = False
        for name, (lo, hi) in list(files.items()):
            if all(t in done for t in range(lo, hi + 1)):
                continue
            os.remove(os.path.join(tiles_dir, name))
            if man is not None:
                man.remove_marker_for(name)
            del files[name]
            demote = [t for t in range(lo, hi + 1) if t in done]
            for t in demote:
                done.discard(t)
                demoted.add(t)
            if demote:
                changed = True
    # one batched marker rewrite for ALL demoted tiles (a per-tile
    # unmark_tile here re-parsed every marker per demotion — round-2
    # VERDICT 4); the fixpoint above only consults in-memory state, so
    # deferring the file rewrites is safe
    if man is not None and demoted:
        man.unmark_tiles(demoted)
    return done


def read_written_tiles(out_dir: str, columns: list[str], exclude=None):
    """Second-stage Dataset over the range files a run wrote
    (column-pruned; ``exclude`` drops tiles completed by a PREVIOUS run so
    summaries cover only this run's work) — the OverviewBuilder read."""
    import os

    import ray.data as rd

    tiles_dir = f"{out_dir}/tiles"
    if not os.path.isdir(tiles_dir) or not os.listdir(tiles_dir):
        return rd.from_arrow(
            pa.table({c: pa.array([], pa.int64()) for c in columns})
        )
    ds = rd.read_parquet(tiles_dir, columns=columns)
    if exclude:
        done_arr = np.asarray(sorted(exclude), np.int64)

        def drop(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pa.array(~np.isin(_tile_ids_np(batch), done_arr))
            )

        ds = ds.map_batches(drop, batch_format="pyarrow", batch_size=None)
    return ds


def tile_summary(assigned_ds) -> "pa.Table":
    """Per-tile feature counts by kind — the engine's analogue of the
    reference functional tests' per-level point/line counts
    (``test/func/SimpleTest.java:69-73``). Partial-aggregated per batch
    (bincount) so ≤ tiles × blocks rows reach the driver, then a numpy
    sort/reduceat combine — cheaper than an all-to-all groupby at this
    cardinality (partials are bounded by tile count, not feature count)."""

    def partial(batch: pa.Table) -> pa.Table:
        tile = _tile_ids_np(batch)
        kind = np.asarray(batch["kind"].combine_chunks(), np.int64)
        uniq, inv = np.unique(tile, return_inverse=True)
        out = {"tile_id": pa.array(uniq, pa.int64())}
        for k, name in ((0, "n_points"), (1, "n_lines"), (2, "n_shapes")):
            out[name] = pa.array(
                np.bincount(inv, weights=(kind == k), minlength=len(uniq)).astype(
                    np.int64
                ),
                pa.int64(),
            )
        return pa.table(out)

    parts = assigned_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    cols = {c: [] for c in ("tile_id", "n_points", "n_lines", "n_shapes")}
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for c in cols:
            cols[c].append(np.asarray(b[c].combine_chunks(), np.int64))
    if not cols["tile_id"] or sum(len(a) for a in cols["tile_id"]) == 0:
        return pa.table(
            {c: pa.array([], pa.int64())
             for c in ("tile_id", "n_points", "n_lines", "n_shapes")}
        )
    tid = np.concatenate(cols["tile_id"])
    order = np.argsort(tid, kind="stable")
    tid = tid[order]
    starts = np.flatnonzero(np.r_[True, tid[1:] != tid[:-1]])
    out = {"tile_id": pa.array(tid[starts], pa.int64())}
    for c in ("n_points", "n_lines", "n_shapes"):
        v = np.concatenate(cols[c])[order]
        out[c] = pa.array(np.add.reduceat(v, starts), pa.int64())
    return pa.table(out)


def write_tiles(
    assigned_ds,
    meta: pa.Table,
    tree: SplitTree,
    out_dir: str,
    resume: bool = True,
    input_desc: str = "",
    rows_hint: int | None = None,
    keep_going: bool = False,
) -> dict:
    """Write tile-range parquet files with lineage manifest + resume.

    Single pass: rows range-cluster by ``tile_id`` (sort — the one
    shuffle a partitioned sink needs), then each sorted block writes ONE
    range file and returns its per-tile count partials
    (``BlockTileWriter``), so the expensive assign/clip pipeline executes
    exactly once and the manifest counts describe the bytes on disk.
    Completed tiles (``_done`` markers from a previous run with the same
    tree digest) are filtered out before the shuffle.
    """
    from ..stages.tilewriter import (
        BlockTileWriter,
        combine_tile_partials,
        count_kind_stats,
    )

    man = RunManifest(out_dir)
    digest = tree_digest(tree.pack())
    prev = man.read_job()
    done: set[int] = set()
    if resume and prev and prev.get("tree_digest") == digest:
        done = man.completed_tiles()
    done = clean_stale_partitions(out_dir, done, man)
    # tiles quarantined by a PREVIOUS run are being retried now — drop
    # their stale lineage entries (entries present after the write then
    # unambiguously belong to this run's failures)
    man.clear_quarantine(set(man.quarantined_tiles()) - done)
    if not resume:
        import shutil

        shutil.rmtree(f"{out_dir}/tiles", ignore_errors=True)
        done = set()

    man.write_job(
        {
            "input": input_desc,
            "tree_digest": digest,
            "n_tiles": meta.num_rows,
            "shift": tree.shift,
        }
    )

    if done:
        done_arr = np.asarray(sorted(done), dtype=np.int64)

        def drop_done(batch: pa.Table) -> pa.Table:
            tid = np.asarray(batch["tile_id"].combine_chunks(), np.int64)
            keep = ~np.isin(tid, done_arr)
            return batch.filter(pa.array(keep))

        to_write = assigned_ds.map_batches(drop_done, batch_format="pyarrow", batch_size=None)
    else:
        to_write = assigned_ds

    stat_ops = {"n_points": "sum", "n_lines": "sum", "n_shapes": "sum"}
    # the sort is the pipeline's one all-to-all: every byte dropped here
    # is moved twice less. `cell` duplicates tile_id (meta maps tiles →
    # cells); the writer and all tile readers only use tile_id. A
    # per-batch projection (not Dataset.schema()) keeps the plan lazy.
    def _drop_cell(batch: pa.Table) -> pa.Table:
        if "cell" in batch.column_names:
            return batch.drop_columns(["cell"])
        return batch

    to_write = to_write.map_batches(
        _drop_cell, batch_format="pyarrow", batch_size=None
    )
    # The sort's reduce side fetches O(maps × reducers) slices, so its
    # cost explodes with input block count (write phase 553-572 s at
    # 81.8M rows / ~550 blocks, under EITHER shuffle mode, with only
    # ~68 s of sort compute). Cap the fan with a minimal-movement
    # coalesce (repartition(shuffle=False)) to ~640k-row blocks before
    # sorting; pull-based sort then stays in its fast regime (11.7 s
    # for 20M rows / 136 blocks on the isolated clone).
    # MKGMAP_PUSH_SHUFFLE=1 re-enables the push-based shuffle.
    from ray.data import DataContext

    _push = os.environ.get("MKGMAP_PUSH_SHUFFLE", "0") == "1"
    _ctx = DataContext.get_current()
    if hasattr(_ctx, "shuffle_strategy"):
        # Ray ≥2.4x spells it shuffle_strategy; the use_push_based_shuffle
        # alias is deprecated and will vanish
        try:
            from ray.data.context import ShuffleStrategy

            _ctx.shuffle_strategy = (
                ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
                if _push
                else ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
            )
        except ImportError:
            _ctx.use_push_based_shuffle = _push
    else:
        _ctx.use_push_based_shuffle = _push
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    est_rows = rows_hint if rows_hint else meta.num_rows * 150
    n_sort_blocks = int(
        max(16, 2 * cpus, min(512, est_rows // 640_000 + 1))
    )
    writer = BlockTileWriter(out_dir, count_kind_stats, stat_ops)
    if keep_going:
        # --keep-going (main/Main.java:566-575): a failing tile is
        # quarantined in the manifest and the run completes without it
        from ..stages.tilewriter import QuarantineGuard

        writer = QuarantineGuard(writer, out_dir)
    parts = (
        to_write.repartition(n_sort_blocks)
        .sort("tile_id")
        .map_batches(
            writer,
            batch_format="pyarrow", batch_size=None,
        )
    )
    # lineage markers are written by the writer tasks themselves (one per
    # range file, in parallel); the driver only combines the summary
    summary, _file_of = combine_tile_partials(
        parts.iter_batches(batch_size=None, batch_format="pyarrow"),
        stat_ops,
    )
    # any quarantine entry present now was written by THIS run's guard
    # (stale entries for retried tiles were cleared before the write):
    # a tile sorted across two blocks may have failed in one and written
    # in the other — demote it so resume retries the whole tile
    quarantined = man.quarantined_tiles()
    if quarantined:
        man.unmark_tiles(quarantined.keys())
        summary = summary[~summary["tile_id"].isin(quarantined)]
    if os.environ.get("MKGMAP_BENCH_PHASES"):
        import sys

        print(parts.stats(), file=sys.stderr, flush=True)
    return {
        "n_tiles": meta.num_rows,
        "written_tiles": len(summary),
        "skipped_tiles": len(done),
        "quarantined_tiles": sorted(quarantined),
        "tree_digest": digest,
        "summary": pa.Table.from_pandas(summary, preserve_index=False),
    }


def simplify_levels(assigned_ds, levels=((0, 24), (1, 22), (2, 20), (3, 18), (4, 16))):
    """Union of per-level simplified datasets (each tagged ``resolution``).
    Levels run as independent streaming branches of the same input."""
    out = None
    for _level, res in levels:
        d = simplify_at_level(assigned_ds, res)
        out = d if out is None else out.union(d)
    return out


def overview_features(assigned_ds, meta: pa.Table, resolution: int = 16):
    """The OverviewBuilder FEATURE MERGE
    (``combiners/OverviewBuilder.java:88-407``): build the overview map's
    content from the per-tile outputs —

    - one coverage polygon per tile (the 0x4a analogue,
      ``addMapCoverageArea``: the tile bbox);
    - the low-res feature merge (``readPoints/readLines/readShapes``):
      every feature rounded to the overview ``resolution`` (the filters'
      +half-and-mask), kept iff its surviving point count passes the
      reference's degenerate checks — points always, lines need ≥2
      distinct rounded points, shapes ≥3;
    - a background row (0x4b analogue, ``addBackground`` when
      ``hasBackground`` is false): the overall bounds, ``tile_id = -1``;
    - ``calcLevels``'s max-resolution rule: start at 16 and decrement
      while any coverage polygon's max dimension exceeds
      ``0xffff << (24 - res)``.

    Partial-aggregated per batch (survivor counts + rounded-coordinate
    checksums per tile); only per-tile rows reach the driver. Returns an
    int64 pandas DataFrame (tile_id, bounds, n_points, n_lines,
    n_shapes, coord_sum, max_res)."""
    import pandas as pd

    from ..geom.coords import DELTA_SHIFT
    from ..splitter import predicted_num_points
    from ..util import list_column_parts

    shift = 24 - resolution
    half = np.int64(1 << (shift - 1)) if shift > 0 else np.int64(0)
    mask = ~np.int64((1 << shift) - 1) if shift > 0 else ~np.int64(0)
    min_pts = np.array([1, 2, 3], np.int64)  # by kind

    def partial(batch: pa.Table) -> pa.Table:
        tile = _tile_ids_np(batch)
        kind = np.asarray(batch["kind"].combine_chunks(), np.int64)
        lat, lat_off = list_column_parts(batch["lat_hp"])
        lon, _ = list_column_parts(batch["lon_hp"])
        lat_mu = np.asarray(lat, np.int64) >> DELTA_SHIFT
        lon_mu = np.asarray(lon, np.int64) >> DELTA_SHIFT
        off = np.asarray(lat_off, np.int64)
        n_pred = predicted_num_points(lat_mu, lon_mu, off, resolution)
        keep = n_pred >= min_pts[kind]
        rsum_flat = ((lat_mu + half) & mask) + ((lon_mu + half) & mask)
        if len(rsum_flat):
            idx = np.minimum(off[:-1], len(rsum_flat) - 1)
            csum_rows = np.where(
                np.diff(off) > 0, np.add.reduceat(rsum_flat, idx), 0
            )
        else:
            csum_rows = np.zeros(len(tile), np.int64)
        uniq, inv = np.unique(tile, return_inverse=True)
        out = {"tile_id": pa.array(uniq, pa.int64())}
        for k, name in ((0, "n_points"), (1, "n_lines"), (2, "n_shapes")):
            out[name] = pa.array(
                np.bincount(
                    inv, weights=keep & (kind == k), minlength=len(uniq)
                ).astype(np.int64),
                pa.int64(),
            )
        out["coord_sum"] = pa.array(
            np.bincount(
                inv, weights=np.where(keep, csum_rows, 0),
                minlength=len(uniq),
            ).astype(np.int64),
            pa.int64(),
        )
        return pa.table(out)

    parts = assigned_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    cols = {c: [] for c in ("tile_id", "n_points", "n_lines", "n_shapes",
                            "coord_sum")}
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for c in cols:
            cols[c].append(np.asarray(b[c].combine_chunks(), np.int64))
    meta_pd = meta.to_pandas()
    if cols["tile_id"] and sum(len(a) for a in cols["tile_id"]):
        tid = np.concatenate(cols["tile_id"])
        order = np.argsort(tid, kind="stable")
        tid = tid[order]
        starts = np.flatnonzero(np.r_[True, tid[1:] != tid[:-1]])
        agg = pd.DataFrame({"tile_id": tid[starts]})
        for c in ("n_points", "n_lines", "n_shapes", "coord_sum"):
            v = np.concatenate(cols[c])[order]
            agg[c] = np.add.reduceat(v, starts)
    else:
        agg = pd.DataFrame(
            {c: np.empty(0, np.int64) for c in cols}
        )
    out = meta_pd[["tile_id", "min_lat", "min_lon", "max_lat", "max_lon"]]
    out = out.merge(agg, on="tile_id", how="left").fillna(0)
    # calcLevels (OverviewBuilder.java:117-143): the 0x4a coverage dims
    # bound the writable top resolution
    dims = np.maximum(
        out["max_lat"].to_numpy(np.int64) - out["min_lat"].to_numpy(np.int64),
        out["max_lon"].to_numpy(np.int64) - out["min_lon"].to_numpy(np.int64),
    )
    max_dim = int(dims.max(initial=0))
    max_res = resolution
    while max_dim > (0xFFFF << (24 - max_res)):
        max_res -= 1
    # background 0x4b over the overall bounds (addBackground)
    bg = pd.DataFrame(
        [{
            "tile_id": -1,
            "min_lat": int(out["min_lat"].min()),
            "min_lon": int(out["min_lon"].min()),
            "max_lat": int(out["max_lat"].max()),
            "max_lon": int(out["max_lon"].max()),
            "n_points": 0, "n_lines": 0, "n_shapes": 0, "coord_sum": 0,
        }]
    )
    out = pd.concat([bg, out], ignore_index=True)
    out["max_res"] = max_res
    return out.astype("int64")


def overview_from_tiles(out_dir: str):
    """The combiner pass (``combiners/OverviewBuilder.java:88-393``): a
    SECOND-stage Dataset over the per-tile parquet outputs of a finished
    run — re-read each tile partition, count features per (kind,
    resolution-bucket), and cross-check against the run's lineage
    manifest. Returns (overview pandas DataFrame, manifest total counts).

    Reading `tiles/` as one partitioned dataset keeps the combiner
    streaming (the reference re-reads each produced ``.img`` serially)."""
    import ray.data as rd

    from ..state.manifest import RunManifest

    ds = rd.read_parquet(f"{out_dir}/tiles")

    def partial(batch: pa.Table) -> pa.Table:
        kind = np.asarray(batch["kind"].combine_chunks(), np.int64)
        uniq, cnt = np.unique(kind, return_counts=True)
        return pa.table(
            {
                "kind": pa.array(uniq, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    acc: dict[int, int] = {}
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        ks = np.asarray(b["kind"].combine_chunks(), np.int64)
        ns = np.asarray(b["n"].combine_chunks(), np.int64)
        for k, nv in zip(ks.tolist(), ns.tolist()):
            acc[k] = acc.get(k, 0) + nv

    import pandas as pd

    agg = RunManifest(out_dir).aggregate_counts()
    manifest_totals = {
        k: agg.get(k, 0) for k in ("n_points", "n_lines", "n_shapes")
    }
    overview = pd.DataFrame(
        sorted(acc.items()), columns=["kind", "n"]
    ).astype("int64")
    return overview, manifest_totals
