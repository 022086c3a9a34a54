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

    from .tiling import _tile_ids_np, clean_stale_partitions, read_written_tiles

    clean_stale_partitions(out_dir, done)
    # Single execution: write the tile partitions FIRST, then derive the
    # per-tile fidelity/count aggregates from a column-pruned second-stage
    # read of the files just written (generate → decode/verify → assign runs
    # exactly once, and the gate provably checks the bytes on disk — the
    # ``bytes`` column is never re-read).
    # range-cluster by the partition key before the hive write (one file
    # per block×tile run; pyarrow caps fragments at 1024 partitions)
    to_write.sort("tile_id").write_parquet(
        f"{out_dir}/tiles", partition_cols=["tile_id"]
    )

    stat_cols = ["tile_id"] + (
        ["psnr_centi_db", "phash_dist", "caption_ok"] if verify else []
    )

    def partial(batch: pa.Table) -> pa.Table:
        tid = _tile_ids_np(batch)
        uniq, inv = np.unique(tid, return_inverse=True)
        out = {
            "tile_id": pa.array(uniq, pa.int64()),
            "n_images": pa.array(
                np.bincount(inv, minlength=len(uniq)).astype(np.int64),
                pa.int64(),
            ),
        }
        if verify:
            psnr = np.asarray(
                batch["psnr_centi_db"].combine_chunks(), np.int64
            )
            mn = np.full(len(uniq), 1 << 30, np.int64)
            np.minimum.at(mn, inv, psnr)
            out["min_psnr_centi_db"] = pa.array(mn, pa.int64())
            pd_ = np.asarray(batch["phash_dist"].combine_chunks(), np.int64)
            mx = np.zeros(len(uniq), np.int64)
            np.maximum.at(mx, inv, pd_)
            out["max_phash_dist"] = pa.array(mx, pa.int64())
            co = np.asarray(batch["caption_ok"].combine_chunks(), np.int64)
            mc = np.ones(len(uniq), np.int64)
            np.minimum.at(mc, inv, co)
            out["min_caption_ok"] = pa.array(mc, pa.int64())
        return pa.table(out)

    parts = read_written_tiles(out_dir, stat_cols, exclude=done).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    acc: dict[int, dict] = {}
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for row in b.to_pylist():
            cur = acc.setdefault(
                row["tile_id"],
                {"n_images": 0, "min_psnr_centi_db": 1 << 30,
                 "max_phash_dist": 0, "min_caption_ok": 1},
            )
            cur["n_images"] += row["n_images"]
            if verify:
                cur["min_psnr_centi_db"] = min(
                    cur["min_psnr_centi_db"], row["min_psnr_centi_db"])
                cur["max_phash_dist"] = max(
                    cur["max_phash_dist"], row["max_phash_dist"])
                cur["min_caption_ok"] = min(
                    cur["min_caption_ok"], row["min_caption_ok"])

    for tid, agg in acc.items():
        if verify:
            assert agg["min_psnr_centi_db"] >= 4000, (tid, agg)
            assert agg["max_phash_dist"] <= 4, (tid, agg)
            assert agg["min_caption_ok"] == 1, (tid, agg)
        b = tree.bounds[leaves[tid]]
        man.mark_tile(
            tid,
            {"counts": {"n_images": agg["n_images"]},
             "fidelity": {k: int(v) for k, v in agg.items()},
             "bounds": [b.min_lat, b.min_lon, b.max_lat, b.max_lon],
             "tree_digest": digest},
        )

    import pandas as pd

    rows = []
    for tid in sorted(man.completed_tiles()):
        import json
        import os

        with open(os.path.join(out_dir, "_done", f"tile_{tid}.json")) as f:
            lin = json.load(f)
        rows.append(
            {"tile_id": tid, "n_images": lin["counts"]["n_images"]}
        )
    summary = pd.DataFrame(rows)
    stats = {
        "n_tiles": len(leaves),
        "written_tiles": len(acc),
        "skipped_tiles": len(done),
        "tree_digest": digest,
    }
    return summary, stats
