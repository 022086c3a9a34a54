"""Tile assignment: narrow projection → refinement loop → cell column.

The distributed counterpart of ``build/MapSplitter.java`` +
``build/MapArea.pickArea``:

1. ``narrow_stats`` (map_batches, Arrow in/out): per feature compute the
   center (``MapLine.getLocation`` bbox-midpoint rule), the point count and
   the ``MapArea.addSize`` byte estimate — a ~40-byte row regardless of
   geometry size, the engine's projection pushdown.
2. ``build_split_tree``: driver loop — every pass assigns features to the
   current leaves with a vectorized tree walk and aggregates per-leaf stats
   as *partial aggregates inside map_batches* (one tiny table per batch,
   summed on the driver; no all-to-all shuffle), then splits every violating
   leaf (``MapSplitter.addAreasToList`` policy). Passes = tree depth
   (O(log n)), each pass touches only the narrow projection.
3. ``assign_cells``: map_batches adding ``cell`` (leaf node id) and
   ``tile_id`` (dense leaf rank) to the full feature table; the packed tree
   (a few KB of numpy arrays) rides the task closure — broadcast once per
   task, not per batch.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..geom.area import Area
from ..geom.coords import DELTA_SHIFT
from ..grid import SplitTree, assign_nodes, feature_centers
from ..splitter import (
    STAT_COLS,
    SplitLimits,
    b_wider,
    decide_split,
    element_stats,
)
from ..util import list_lengths, list_minmax


def narrow_stats_batch(batch: pa.Table) -> pa.Table:
    """Arrow batch of FEATURES → narrow per-feature stats table."""
    kind = np.asarray(batch["kind"].combine_chunks(), dtype=np.int64)
    lat_min_hp, lat_max_hp = list_minmax(batch["lat_hp"])
    lon_min_hp, lon_max_hp = list_minmax(batch["lon_hp"])
    n_points = list_lengths(batch["lat_hp"]).astype(np.int64)

    # centers are computed from MAP-UNIT bboxes (MapLine.getLocation uses the
    # map-unit bbox midpoint, then pickArea shifts back to hp)
    lat_c, lon_c = feature_centers(
        kind,
        lat_min_hp >> DELTA_SHIFT,
        lat_max_hp >> DELTA_SHIFT,
        lon_min_hp >> DELTA_SHIFT,
        lon_max_hp >> DELTA_SHIFT,
    )
    n_pt, n_ln, n_sh, est, n_split = element_stats(kind, n_points)
    # int32 throughout: lat/lon hp fit in ±2^30, stats are tiny — halves
    # the bytes every refinement scan touches (feature_id is not needed)
    return pa.table(
        {
            "lat_c": pa.array(lat_c.astype(np.int32), pa.int32()),
            "lon_c": pa.array(lon_c.astype(np.int32), pa.int32()),
            "n_pt": pa.array(n_pt.astype(np.int32), pa.int32()),
            "n_ln": pa.array(n_ln.astype(np.int32), pa.int32()),
            "n_sh": pa.array(n_sh.astype(np.int32), pa.int32()),
            "est": pa.array(est.astype(np.int32), pa.int32()),
            "n_split": pa.array(n_split.astype(np.int32), pa.int32()),
        }
    )


def narrow_stats(features_ds):
    return features_ds.map_batches(narrow_stats_batch, batch_format="pyarrow", batch_size=None)


def _partial_agg_fn(packed):
    """Build the per-batch partial aggregator for the current tree."""

    def agg(batch: pa.Table) -> pa.Table:
        lat = np.asarray(batch["lat_c"].combine_chunks(), np.int64)
        lon = np.asarray(batch["lon_c"].combine_chunks(), np.int64)
        leaf = assign_nodes(packed, lat, lon)
        uniq, inv = np.unique(leaf, return_inverse=True)
        out = {"node": pa.array(uniq, pa.int64())}
        for c in STAT_COLS:
            vals = np.asarray(batch[c].combine_chunks(), np.int64)
            out[c] = pa.array(np.bincount(inv, weights=vals, minlength=len(uniq))
                              .astype(np.int64), pa.int64())
        return pa.table(out)

    return agg


def compute_bounds(narrow_ds) -> Area:
    """Global map-unit bbox of all feature centers (``initialArea``)."""
    agg = narrow_ds.aggregate(
        *(
            a
            for col in ("lat_c", "lon_c")
            for a in _minmax_aggs(col)
        )
    )
    return Area(
        int(agg["min(lat_c)"]) >> DELTA_SHIFT,
        int(agg["min(lon_c)"]) >> DELTA_SHIFT,
        (int(agg["max(lat_c)"]) >> DELTA_SHIFT) + 1,
        (int(agg["max(lon_c)"]) >> DELTA_SHIFT) + 1,
    )


def _minmax_aggs(col):
    from ray.data.aggregate import Max, Min

    return (Min(col), Max(col))


def _round_pof2_np(val: np.ndarray, shift: int) -> np.ndarray:
    if shift <= 0:
        return val
    half = 1 << (shift - 1)
    return ((val + half) >> shift) << shift


def _descend_terminals(
    lat_mu, lon_mu, node_bounds, shift: int, min_dim: int,
    max_levels: int | None = None,
):
    """Vectorized descent of the deterministic *potential* split tree.

    Split positions never depend on feature stats — only the DECISION to
    split does (``MapSplitter.addAreasToList`` always halves along the
    longer axis at ``Area.split``'s aligned midpoint). So each feature
    center can be walked down to its terminal potential cell (too small to
    divide, or cut collapse) in one pass; the refinement loop then only
    needs stats per terminal cell, not a rescan per depth level.

    ``node_bounds``: (n,4) map-unit (ymin, xmin, ymax, xmax) of each
    feature's initial leaf. Returns terminal (ymin, xmin) per feature —
    disjoint terminal rects have unique min corners, so that's the cell key
    (descent rules are feature-independent, so a reached node is never an
    ancestor of another reached node).

    ``max_levels`` caps the number of halvings (each loop pass advances
    every live feature one level), bounding the result cardinality to
    ``2^max_levels`` cells per input node — the round-based refinement
    relies on this to keep the driver-side aggregate small.
    """
    ymin = node_bounds[:, 0].copy()
    xmin = node_bounds[:, 1].copy()
    ymax = node_bounds[:, 2].copy()
    xmax = node_bounds[:, 3].copy()
    done = np.zeros(len(ymin), dtype=bool)
    lim = min_dim << shift
    level = 0
    while max_levels is None or level < max_levels:
        level += 1
        w = xmax - xmin
        h = ymax - ymin
        done |= np.maximum(w, h) <= lim
        todo = ~done
        if not todo.any():
            break
        wider = w > h
        use_x = todo & wider
        use_y = todo & ~wider
        cut_x = _round_pof2_np(xmin + w // 2, shift)
        cut_y = _round_pof2_np(ymin + h // 2, shift)
        ok_x = use_x & (cut_x > xmin) & (cut_x < xmax)
        ok_y = use_y & (cut_y > ymin) & (cut_y < ymax)
        done |= (use_x & ~ok_x) | (use_y & ~ok_y)  # cut collapse → terminal
        right = ok_x & (lon_mu >= cut_x)
        left = ok_x & ~right
        xmin[right] = cut_x[right]
        xmax[left] = cut_x[left]
        top = ok_y & (lat_mu >= cut_y)
        bot = ok_y & ~top
        ymin[top] = cut_y[top]
        ymax[bot] = cut_y[bot]
    return ymin, xmin


_KEY_OFF = 1 << 24  # map units are 24-bit signed; bias keys positive


def build_split_tree(
    narrow_ds,
    shift: int,
    limits: SplitLimits = SplitLimits(),
    bounds: Area | None = None,
    levels_per_round: int = int(os.environ.get("MKGMAP_REFINE_LEVELS", 4)),
    max_rounds: int = 16,
) -> SplitTree:
    """Run the MapSplitter refinement against a Ray Dataset of narrow
    per-feature stats, in rounds.

    Split POSITIONS are data-independent (always the aligned midpoint of
    the longer axis); only split DECISIONS need stats. Each round therefore
    does one distributed scan that descends every feature center
    ``levels_per_round`` potential levels below its current active leaf and
    aggregates stats per reached potential cell (``_descend_terminals``
    with a level cap). The driver then recurses the split decisions
    (``decide_split`` — shared with the iterative oracle ``refine``) over
    that compact aggregate; frontier leaves that still violate the limits
    carry into the next round. Driver-side cardinality per round is ≤
    ``2^levels_per_round × active leaves`` — bounded by the output tile
    count, not the feature count, so this holds at 10^12 features.
    """
    trace = os.environ.get("MKGMAP_BENCH_PHASES")
    if trace:
        import sys
        import time as _t

        _tp = _t.perf_counter()
    narrow_ds = prepare_narrow(narrow_ds)
    if trace:
        print(f"[narrow] prepare {_t.perf_counter()-_tp:.1f}s",
              file=sys.stderr, flush=True)
        _tp = _t.perf_counter()
    if bounds is None:
        bounds = compute_bounds(narrow_ds)
    if trace:
        print(f"[narrow] bounds {_t.perf_counter()-_tp:.1f}s",
              file=sys.stderr, flush=True)
    tree = SplitTree.root(bounds, shift)
    tree.split_max_size(limits.max_division_size)
    n_initial = tree.n_nodes()
    refine_tree(narrow_ds, tree, limits, levels_per_round, max_rounds)
    return tree.canonicalize(n_initial)


NARROW_SPILL_BYTES_ENV = "MKGMAP_NARROW_SPILL_BYTES"
NARROW_SPILL_DIR_ENV = "MKGMAP_SPILL_DIR"
_NARROW_SPILL_FLOOR = 2 << 30  # never spill below 2 GiB of narrow stats


def _default_spill_bytes() -> int:
    """Default spill threshold: a quarter of the OBJECT STORE, floored at
    2 GiB. The original fixed 2 GiB default spilled the repeat=96 scaling
    workload (~2.4 GB of narrow int32s) onto this box's ONE disk, whose
    bandwidth does not grow with CPUs — the 2→8-cpu efficiency collapsed
    to 0.49 because every refinement round re-read the projection from
    disk. The object store DOES grow with nodes on a real cluster, so
    sizing the threshold to it keeps refinement re-reads zero-copy until
    memory genuinely runs short; cross-node runs should also point
    ``MKGMAP_SPILL_DIR`` at storage whose bandwidth scales."""
    import ray

    store = int(ray.cluster_resources().get("object_store_memory", 0))
    return max(_NARROW_SPILL_FLOOR, store // 4)


def _spill_narrow(ds, n_blocks: int):
    """Write the narrow projection to parquet ONCE (a streaming pass —
    blocks leave the object store as soon as they are written) and hand
    back a lazy read: every refinement round then re-scans from disk, so
    the object-store peak during refinement is the in-flight block set,
    independent of feature count. On a multi-node cluster
    ``MKGMAP_SPILL_DIR`` must point at shared storage (object store /
    NFS); the default is a local temp dir (single-node)."""
    import tempfile

    import ray

    import atexit
    import shutil

    d = tempfile.mkdtemp(
        prefix="mkgmap_narrow_", dir=os.environ.get(NARROW_SPILL_DIR_ENV)
    )
    # spill dirs are run-scoped scratch: reclaim on interpreter exit (the
    # dataset's lifetime is the refinement loop, which has no close hook)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    ds.write_parquet(d)
    # size-based split (not one block per CPU): re-scan blocks must stay
    # in the small-object regime where plasma writes scale (r4)
    total = sum(
        os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
    )
    n_blocks = max(n_blocks, total // (24 * 1024 * 1024) + 1)
    out = ray.data.read_parquet(d, override_num_blocks=n_blocks)
    out._mkgmap_spill_dir = d
    return out


def prepare_narrow(narrow_ds):
    """Prepare the narrow stats projection for repeated per-round scans.

    Small inputs (≤ ``MKGMAP_NARROW_SPILL_BYTES``, default 2 GiB)
    repartition + materialize in the object store — fastest for the
    per-round re-reads. Larger inputs spill to parquet once and re-scan
    from disk each round (``_spill_narrow``), bounding the object-store
    footprint of refinement to the in-flight blocks; set the env var to
    0 to force the spill path with NO transient materialization at all
    (the projection is streamed straight to parquet).

    Blocks stay SMALL (the map outputs, ~target_max_block_size each):
    round 3 repartitioned to one block per CPU, but at repeat=96 that
    makes ~600 MB plasma objects — the object-size regime where this
    host's store writes stop scaling across workers (BASELINE.md r4) —
    and caps scan-task parallelism at the block count. The driver-side
    combine stays bounded by the second-level ``merge_partials`` pass,
    not by block count, so the repartition bought nothing."""
    import ray

    if getattr(narrow_ds, "_mkgmap_prepared", False):
        return narrow_ds
    n_blocks = max(1, int(ray.cluster_resources().get("CPU", 32)))
    env = os.environ.get(NARROW_SPILL_BYTES_ENV)
    spill_bytes = int(env) if env is not None else _default_spill_bytes()
    if spill_bytes == 0:
        out = _spill_narrow(narrow_ds, n_blocks)
    else:
        mat = narrow_ds.materialize()
        if (mat.size_bytes() or 0) > spill_bytes:
            out = _spill_narrow(mat, n_blocks)
        else:
            out = mat
    out._mkgmap_prepared = True
    try:
        out._mkgmap_nrows = out.count()
    except Exception:
        out._mkgmap_nrows = None
    return out


def refine_tree(
    narrow_ds,
    tree: SplitTree,
    limits: SplitLimits = SplitLimits(),
    levels_per_round: int = int(os.environ.get("MKGMAP_REFINE_LEVELS", 4)),
    max_rounds: int = 16,
) -> None:
    """The round-based distributed refinement loop, operating IN PLACE on
    an existing tree from its current leaves (used by both the one-level
    ``build_split_tree`` and the per-zoom continuation
    ``continue_split_tree``). ``narrow_ds`` must be prepared
    (``prepare_narrow``)."""
    min_dim = limits.min_dimension
    t_shift = tree.shift
    active: list[int] = tree.leaves()
    trace = os.environ.get("MKGMAP_BENCH_PHASES")

    for round_no in range(max_rounds):
        if not active:
            break
        if trace:
            import sys
            import time as _t

            _t0 = _t.perf_counter()
        packed = tree.pack()
        is_active = np.zeros(tree.n_nodes(), dtype=bool)
        is_active[active] = True
        node_bounds = np.asarray(
            [[a.min_lat, a.min_lon, a.max_lat, a.max_lon]
             for a in tree.bounds],
            np.int64,
        )
        levels = levels_per_round

        def partial(batch: pa.Table) -> pa.Table:
            lat = np.asarray(batch["lat_c"].combine_chunks(), np.int64)
            lon = np.asarray(batch["lon_c"].combine_chunks(), np.int64)
            leaf = assign_nodes(packed, lat, lon)
            m = is_active[leaf]
            empty = pa.table(
                {
                    "key": pa.array([], pa.int64()),
                    "leaf": pa.array([], pa.int64()),
                    "lat_r": pa.array([], pa.int64()),
                    "lon_r": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in STAT_COLS},
                }
            )
            if not m.any():
                return empty
            lat, lon, leaf = lat[m], lon[m], leaf[m]
            tymin, txmin = _descend_terminals(
                lat >> DELTA_SHIFT, lon >> DELTA_SHIFT,
                node_bounds[leaf], t_shift, min_dim, max_levels=levels,
            )
            key = ((tymin + _KEY_OFF) << 26) | (txmin + _KEY_OFF)
            uniq, first, inv = np.unique(
                key, return_index=True, return_inverse=True
            )
            out = {
                "key": pa.array(uniq, pa.int64()),
                "leaf": pa.array(leaf[first], pa.int64()),
                # any member center works as the cell representative: the
                # cell is a rect fully inside whatever node covers it
                "lat_r": pa.array(lat[first], pa.int64()),
                "lon_r": pa.array(lon[first], pa.int64()),
            }
            for c in STAT_COLS:
                vals = np.asarray(batch[c].combine_chunks(), np.int64)[m]
                out[c] = pa.array(
                    np.bincount(inv, weights=vals, minlength=len(uniq))
                    .astype(np.int64),
                    pa.int64(),
                )
            return pa.table(out)

        acc: dict[str, list] = {
            c: [] for c in ("key", "leaf", "lat_r", "lon_r", *STAT_COLS)
        }
        # bounded scan batches: a whole 10M-row block as ONE batch makes
        # every round first-touch ~2-3 GB of fresh numpy intermediates per
        # task (this box faults anon pages slowly — see BASELINE.md);
        # streaming fixed-size batches lets the allocator REUSE pages
        # across batches. Cell partials stay bounded: cells-per-batch ≤
        # min(batch rows, 2^levels × active leaves).
        # 400k rows ≈ 3 MB int32 temporaries per scan batch: far enough
        # under the 32 MB glibc mmap threshold that every per-batch numpy
        # intermediate reuses already-faulted heap pages. On this host
        # page faults cost ~20× the copy and SERIALIZE across workers
        # (round-4 measurement: fresh-alloc 0.6 GB/s vs 11.4 GB/s
        # pre-touched; 4-proc aggregate no better than 1), so staying on
        # the fast allocation path is what makes scan time scale with
        # CPUs (round-2 scans 31 s → 6.5 s at 4 cpus, repeat=24).
        scan_rows = int(os.environ.get("MKGMAP_REFINE_BATCH", 400_000))

        def merge_partials(batch: pa.Table) -> pa.Table:
            # second-level combine: bounded scan batches each emit their
            # own per-cell partials, so late rounds stream tens of
            # millions of partial rows; re-uniquing 8M-row slices here
            # keeps the DRIVER combine bounded by cells × surviving
            # slices instead of cells × scan batches
            k = np.asarray(batch["key"].combine_chunks(), np.int64)
            uniq, first, inv = np.unique(
                k, return_index=True, return_inverse=True
            )
            if len(uniq) == len(k):
                return batch
            out = {"key": pa.array(uniq, pa.int64())}
            for c in ("leaf", "lat_r", "lon_r"):
                out[c] = pa.array(
                    np.asarray(batch[c].combine_chunks(), np.int64)[first],
                    pa.int64(),
                )
            for c in STAT_COLS:
                vals = np.asarray(batch[c].combine_chunks(), np.int64)
                out[c] = pa.array(
                    np.bincount(inv, weights=vals, minlength=len(uniq))
                    .astype(np.int64),
                    pa.int64(),
                )
            return pa.table(out)

        parts_ds = narrow_ds.map_batches(
            partial, batch_format="pyarrow", batch_size=scan_rows
        )
        # the second combine level only pays for itself when a round
        # streams MANY scan batches (its extra stage barrier costs
        # ~0.3-0.5 s per round on this box — pure overhead at sf0.1,
        # where the whole input is a handful of scan batches)
        nrows = getattr(narrow_ds, "_mkgmap_nrows", None)
        if nrows is None or nrows > 4 * scan_rows:
            # slice size ~1M: several parallel combine tasks with
            # sub-mmap-threshold temporaries (an 8M-row slice was ONE
            # ~450 MB serial task on this host's slow-fault kernel)
            parts_ds = parts_ds.map_batches(
                merge_partials, batch_format="pyarrow",
                batch_size=int(
                    os.environ.get("MKGMAP_MERGE_BATCH", 1_000_000)
                ),
            )
        for b in parts_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            for c in acc:
                acc[c].append(np.asarray(b[c].combine_chunks(), np.int64))
        if trace:
            _t1 = _t.perf_counter()
        if not acc["key"] or sum(len(a) for a in acc["key"]) == 0:
            break
        # streaming per-slice combine into a running unique-key table.
        # The round-3 form concatenated ALL collected partials (31M rows
        # ≈ 2.2 GB at repeat=96) then argsorted — a serial driver term
        # of 35-110 s dominated by large fresh allocations on this
        # host's slow-fault kernel. Here every allocation is bounded by
        # the DISTINCT cell count (≤ active × 2^levels), and slices
        # fold in one at a time. leaf/lat_r/lon_r are functions of the
        # key, so any occurrence is representative.
        n_collected = 0
        run_key = None
        run_first: dict[str, np.ndarray] = {}
        run_stats: dict[str, np.ndarray] = {}
        for si in range(len(acc["key"])):
            k = acc["key"][si]
            if len(k) == 0:
                continue
            n_collected += len(k)
            u, first, inv = np.unique(
                k, return_index=True, return_inverse=True
            )
            sl_first = {c: acc[c][si][first] for c in ("leaf", "lat_r", "lon_r")}
            sl_stats = {
                c: np.bincount(
                    inv, weights=acc[c][si], minlength=len(u)
                ).astype(np.int64)
                for c in STAT_COLS
            }
            if run_key is None:
                run_key = u
                run_first = sl_first
                run_stats = sl_stats
                continue
            pos = np.searchsorted(run_key, u)
            pos_c = np.minimum(pos, len(run_key) - 1)
            exists = run_key[pos_c] == u
            for c in STAT_COLS:
                np.add.at(run_stats[c], pos_c[exists], sl_stats[c][exists])
            new = ~exists
            if new.any():
                merged = np.concatenate([run_key, u[new]])
                order = np.argsort(merged, kind="stable")
                run_key = merged[order]
                for c in ("leaf", "lat_r", "lon_r"):
                    run_first[c] = np.concatenate(
                        [run_first[c], sl_first[c][new]]
                    )[order]
                for c in STAT_COLS:
                    run_stats[c] = np.concatenate(
                        [run_stats[c], sl_stats[c][new]]
                    )[order]
        if run_key is None:
            break
        key = run_key
        cell_leaf = run_first["leaf"]
        lat_mu = run_first["lat_r"] >> DELTA_SHIFT
        lon_mu = run_first["lon_r"] >> DELTA_SHIFT
        cols = run_stats

        # group cell indices by their active leaf
        order = np.argsort(cell_leaf, kind="stable")
        sorted_leaf = cell_leaf[order]
        starts = np.flatnonzero(
            np.r_[True, sorted_leaf[1:] != sorted_leaf[:-1]]
        )
        ends = np.r_[starts[1:], len(sorted_leaf)]

        new_active: list[int] = []

        def recurse(node: int, idx: np.ndarray, depth_left: int) -> None:
            stats = [int(cols[c][idx].sum()) for c in STAT_COLS]
            n_pt, n_ln, n_sh, est, n_split = stats
            if not decide_split(
                tree.bounds[node], t_shift, limits, n_pt, n_ln, est, n_split
            ):
                return
            if depth_left == 0:
                new_active.append(node)  # needs finer stats next round
                return
            wide = b_wider(tree, node)
            ok = tree.split_node(node, 2, 1) if wide else tree.split_node(
                node, 1, 2
            )
            if not ok:
                return  # alignment collapse: stays a leaf
            c0 = tree.child_off[node]
            if wide:
                cut = tree.bounds[c0].max_lon
                hi = lon_mu[idx] >= cut
            else:
                cut = tree.bounds[c0].max_lat
                hi = lat_mu[idx] >= cut
            recurse(c0, idx[~hi], depth_left - 1)
            recurse(c0 + 1, idx[hi], depth_left - 1)

        for s, e in zip(starts, ends):
            leaf = int(sorted_leaf[s])
            recurse(leaf, order[s:e], levels)
        if trace:
            print(
                f"[round {round_no}] scan {_t1-_t0:.1f}s driver "
                f"{_t.perf_counter()-_t1:.1f}s cells {len(key)} "
                f"active {len(active)}->{len(new_active)} "
                f"nodes {tree.n_nodes()}",
                file=sys.stderr, flush=True,
            )
        active = new_active


def continue_split_tree(
    narrow_ds,
    parent_tree: SplitTree,
    shift: int,
    limits: SplitLimits = SplitLimits(),
    levels_per_round: int = int(os.environ.get("MKGMAP_REFINE_LEVELS", 4)),
    max_rounds: int = 16,
) -> SplitTree:
    """One zoom level's subdivision derived from the PARENT level's areas
    (``MapBuilder.makeMapAreas``, ``MapBuilder.java:788-813``: each parent
    ``MapArea`` is fed to a fresh ``MapSplitter`` at the child zoom).
    Split positions are area-determined, so the child tree is the parent
    tree continued: copy structure, adopt the finer shift, apply the
    per-area max-size grid (``splitMaxSize`` at the child resolution),
    then refine every leaf under the child limits."""
    tree = parent_tree.copy_with_shift(shift)
    for leaf in list(tree.leaves()):
        tree.split_max_size_leaf(leaf, limits.max_division_size)
    refine_tree(narrow_ds, tree, limits, levels_per_round, max_rounds)
    return tree


def build_level_trees(
    narrow_ds,
    shifts: tuple[int, ...] = (8, 6, 4, 2, 0),
    limits: SplitLimits = SplitLimits(),
    bounds: Area | None = None,
) -> list[SplitTree]:
    """Per-zoom subdivision quadtrees, coarsest first (default levels
    4:16 … 0:24 → shifts 8,6,4,2,0): level k+1's tree continues level k's
    (the reference's across-level quadtree). Returns one tree per shift;
    the last (shift 0) is the full-detail subdivision."""
    narrow_ds = prepare_narrow(narrow_ds)
    if bounds is None:
        bounds = compute_bounds(narrow_ds)
    trees: list[SplitTree] = []
    tree: SplitTree | None = None
    for shift in shifts:
        if tree is None:
            t = SplitTree.root(bounds, shift)
            t.split_max_size(limits.max_division_size)
            refine_tree(narrow_ds, t, limits)
            tree = t
        else:
            tree = continue_split_tree(narrow_ds, tree, shift, limits)
        trees.append(tree)
    return trees


class CellAssigner:
    """map_batches callable adding ``cell`` and ``tile_id`` columns to the
    full FEATURES table (``MapArea.pickArea`` center rule)."""

    def __init__(self, packed, leaf_rank: dict[int, int]):
        self.packed = packed
        n = int(max(leaf_rank)) + 1 if leaf_rank else 1
        self.rank = np.full(n, -1, dtype=np.int64)
        for node, r in leaf_rank.items():
            self.rank[node] = r

    def __call__(self, batch: pa.Table) -> pa.Table:
        kind = np.asarray(batch["kind"].combine_chunks(), dtype=np.int64)
        lat_min_hp, lat_max_hp = list_minmax(batch["lat_hp"])
        lon_min_hp, lon_max_hp = list_minmax(batch["lon_hp"])
        lat_c, lon_c = feature_centers(
            kind,
            lat_min_hp >> DELTA_SHIFT,
            lat_max_hp >> DELTA_SHIFT,
            lon_min_hp >> DELTA_SHIFT,
            lon_max_hp >> DELTA_SHIFT,
        )
        leaf = assign_nodes(self.packed, lat_c, lon_c)
        batch = batch.append_column("cell", pa.array(leaf, pa.int64()))
        return batch.append_column(
            "tile_id", pa.array(self.rank[leaf], pa.int64())
        )


def assign_cells(features_ds, tree: SplitTree):
    """Return (dataset with cell/tile_id columns, tile metadata table)."""
    leaves = tree.leaves()
    leaf_rank = {n: i for i, n in enumerate(leaves)}
    packed = tree.pack()
    # bounded batches for the same reason as the refinement scan: feature
    # rows carry coordinate lists, so whole-block batches first-touch GBs
    # of intermediates per task on this box (see BASELINE.md)
    ds = features_ds.map_batches(
        CellAssigner(packed, leaf_rank), batch_format="pyarrow",
        batch_size=int(os.environ.get("MKGMAP_ASSIGN_BATCH", 100_000)),
    )
    meta = pa.table(
        {
            "tile_id": pa.array(range(len(leaves)), pa.int64()),
            "cell": pa.array(leaves, pa.int64()),
            "min_lat": pa.array([tree.bounds[n].min_lat for n in leaves], pa.int32()),
            "min_lon": pa.array([tree.bounds[n].min_lon for n in leaves], pa.int32()),
            "max_lat": pa.array([tree.bounds[n].max_lat for n in leaves], pa.int32()),
            "max_lon": pa.array([tree.bounds[n].max_lon for n in leaves], pa.int32()),
        }
    )
    return ds, meta
