"""The image+caption flagship pipeline (the north-star shape).

Streaming images source (Lance-table stand-in) → decode/verify actor pool
(PSNR + phash + caption invariants) → split-tree refinement over a
COORDINATE-ONLY projection (the ``bytes`` column never enters the tree
scans — the engine's used-tags/column pruning, SURVEY.md §7.3 "wide
rows") → per-batch tile assignment on the payload stream → per-tile
parquet partitions with lineage manifest and resume.

At 10^12 rows the only changes are the source (read_lance with column
pruning instead of the generator) and the cluster size; every stage here
is a streaming map_batches with the tree broadcast via its task closure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.area import Area
from ..geom.coords import DELTA_SHIFT, deg_to_mu
from ..grid import assign_nodes
from ..schema import KIND_POINT
from ..splitter import SplitLimits
from ..stages.assign import build_split_tree, narrow_stats
from ..stages.imagestage import decode_verify
from ..sources.images import geo_tags_rows, images_dataset
from ..state.manifest import RunManifest, tree_digest


def images_geo_features(n: int, bbox, rows_per_block: int = 20000):
    """Coordinate-only FEATURES stream for the split-tree build — the
    column-pruned read: pixels are never generated/loaded here."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        rows = np.asarray(batch["id"].combine_chunks(), np.int64)
        lat, lon = geo_tags_rows(rows, bbox)
        m = len(rows)
        offsets = pa.array(np.arange(m + 1, dtype=np.int32))
        return pa.table(
            {
                "feature_id": pa.array(rows, pa.int64()),
                "kind": pa.array(np.zeros(m, np.int8), pa.int8()),
                "lat_hp": pa.ListArray.from_arrays(
                    offsets,
                    pa.array((deg_to_mu(lat) << DELTA_SHIFT).astype(np.int32)),
                ),
                "lon_hp": pa.ListArray.from_arrays(
                    offsets,
                    pa.array((deg_to_mu(lon) << DELTA_SHIFT).astype(np.int32)),
                ),
                "image_id": pa.array([None] * m, pa.string()),
            }
        )

    n_blocks = max(1, n // rows_per_block)
    return rd.range(n, override_num_blocks=n_blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=None
    )


class AssignImages:
    """map_batches callable: tile_id per image row from its lat/lon (the
    packed tree rides the closure — broadcast once per task)."""

    def __init__(self, packed, leaf_rank: dict[int, int]):
        self.packed = packed
        m = int(max(leaf_rank)) + 1 if leaf_rank else 1
        self.rank = np.full(m, -1, np.int64)
        for node, r in leaf_rank.items():
            self.rank[node] = r

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = deg_to_mu(
            np.asarray(batch["lat"].combine_chunks(), np.float64)
        ) << DELTA_SHIFT
        lon = deg_to_mu(
            np.asarray(batch["lon"].combine_chunks(), np.float64)
        ) << DELTA_SHIFT
        leaf = assign_nodes(self.packed, lat, lon)
        return batch.append_column(
            "tile_id", pa.array(self.rank[leaf], pa.int64())
        )


def run_images_flagship(
    n: int,
    out_dir: str,
    bbox=(0.0, 0.0, 1.4, 1.4),
    resume: bool = True,
    limits: SplitLimits = SplitLimits(),
    verify: bool = True,
):
    """Returns (per-tile summary DataFrame from the manifest, write stats).

    PSNR/phash/caption invariants are asserted in aggregate: any violating
    row fails the run (fidelity is a hard gate, not a metric)."""
    # 1. split tree from the coordinate-only projection
    min_lat, min_lon, max_lat, max_lon = bbox
    bounds = Area(
        int(deg_to_mu(np.asarray([min_lat]))[0]),
        int(deg_to_mu(np.asarray([min_lon]))[0]),
        int(deg_to_mu(np.asarray([max_lat]))[0]) + 1,
        int(deg_to_mu(np.asarray([max_lon]))[0]) + 1,
    )
    tree = build_split_tree(
        narrow_stats(images_geo_features(n, bbox)), shift=0,
        limits=limits, bounds=bounds,
    )
    leaves = tree.leaves()
    leaf_rank = {nd: i for i, nd in enumerate(leaves)}
    digest = tree_digest(tree.pack())

    # 2. payload stream: generate → decode/verify → assign
    imgs = images_dataset(n, bbox)
    if verify:
        imgs = decode_verify(imgs)
    assigned = imgs.map_batches(
        AssignImages(tree.pack(), leaf_rank),
        batch_format="pyarrow", batch_size=None,
    )

    # 3. resumable partitioned write + lineage
    man = RunManifest(out_dir)
    prev = man.read_job()
    done: set[int] = set()
    if resume and prev and prev.get("tree_digest") == digest:
        done = man.completed_tiles()
    from .tiling import clean_stale_partitions

    # demote FIRST: a deleted range file may carry tiles whose markers
    # must be dropped before the done-filter below is built
    done = clean_stale_partitions(out_dir, done, man)
    man.write_job(
        {"input": f"images:{n}", "tree_digest": digest,
         "n_tiles": len(leaves), "bbox": list(bbox)}
    )
    if done:
        done_arr = np.asarray(sorted(done), np.int64)

        def drop_done(batch: pa.Table) -> pa.Table:
            tid = np.asarray(batch["tile_id"].combine_chunks(), np.int64)
            return batch.filter(pa.array(~np.isin(tid, done_arr)))

        to_write = assigned.map_batches(
            drop_done, batch_format="pyarrow", batch_size=None
        )
    else:
        to_write = assigned

    from ..stages.tilewriter import BlockTileWriter, combine_tile_partials

    # Single pass: generate -> decode/verify -> assign -> sort by tile_id;
    # each sorted block writes ONE range file and returns its per-tile
    # fidelity/count partials, so the expensive stages execute exactly
    # once and the gate provably checks the bytes on disk.
    if verify:
        stat_ops = {"min_psnr_centi_db": "min", "max_phash_dist": "max",
                    "min_caption_ok": "min"}

        def fid_stats(batch, uniq, inv):
            out = {}
            for src_col, op, name in (
                ("psnr_centi_db", "min", "min_psnr_centi_db"),
                ("phash_dist", "max", "max_phash_dist"),
                ("caption_ok", "min", "min_caption_ok"),
            ):
                v = np.asarray(batch[src_col].combine_chunks(), np.int64)
                if op == "min":
                    agg = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
                    np.minimum.at(agg, inv, v)
                else:
                    agg = np.full(len(uniq), np.iinfo(np.int64).min, np.int64)
                    np.maximum.at(agg, inv, v)
                out[name] = (op, agg)
            return out
    else:
        stat_ops = {}
        fid_stats = None

    parts = to_write.sort("tile_id").map_batches(
        BlockTileWriter(out_dir, fid_stats, stat_ops),
        batch_format="pyarrow", batch_size=None,
    )
    summary_df, file_of = combine_tile_partials(
        parts.iter_batches(batch_size=None, batch_format="pyarrow"),
        stat_ops,
    )

    # fidelity gate over THIS run's written tiles (from the writer's own
    # partials — markers were written in parallel by the writer tasks)
    if verify:
        for row in summary_df.itertuples(index=False):
            tid = int(row.tile_id)
            assert int(row.min_psnr_centi_db) >= 4000, (tid, row)
            assert int(row.max_phash_dist) <= 4, (tid, row)
            assert int(row.min_caption_ok) == 1, (tid, row)

    import pandas as pd

    # ONE marker pass for the whole summary (a per-tile read_tile loop
    # here re-parsed every marker JSON per tile — round-2 VERDICT 4)
    idx = man.tile_index()
    rows = [
        {"tile_id": tid, "n_images": idx[tid]["stats"]["n_rows"]}
        for tid in sorted(idx)
    ]
    summary = pd.DataFrame(rows)
    stats = {
        "n_tiles": len(leaves),
        "written_tiles": len(summary_df),
        "skipped_tiles": len(done),
        "tree_digest": digest,
    }
    return summary, stats
