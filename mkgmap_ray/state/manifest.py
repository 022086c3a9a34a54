"""Per-partition lineage manifest + resumable tile output layout.

Output layout (the "resumable output" contract):

    out_dir/
      manifest.json                 # job-level: input, tree digest
      tiles/part-<lo>-<hi>-<digest>.parquet  # one file per sorted block,
                                             # covering tile range [lo, hi]
      _done/part-<lo>-<hi>-<digest>.json     # that file's marker: per-tile
                                             # stats of the rows it holds

Markers are written BY THE WRITER TASKS immediately after their parquet
file (parallel, one per block — round 2 originally wrote one JSON per
TILE from the driver, a serial term that grew with data size and broke
the scaling bench). A tile is complete iff every marker listing it still
has its parquet on disk; a crash leaves a parquet-without-marker or
marker-without-parquet, both removed by the stale sweep, and the next
run rewrites exactly the missing tiles (the range demotion in
``clean_stale_partitions``). Range files are content-addressed, so
identical rewrites are idempotent.

Per-tile stats combine across markers by name prefix: ``n_*``/``sum_*``
add, ``min_*`` min, ``max_*`` max.
"""

from __future__ import annotations

import hashlib
import json
import os


def tree_digest(packed: dict) -> str:
    h = hashlib.sha256()
    for k in sorted(packed):
        h.update(k.encode())
        h.update(packed[k].tobytes())
    return h.hexdigest()[:16]


def combine_stat(name: str, a: int, b: int) -> int:
    if name.startswith("min_"):
        return min(a, b)
    if name.startswith("max_"):
        return max(a, b)
    return a + b


class RunManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.done_dir = os.path.join(out_dir, "_done")
        os.makedirs(self.done_dir, exist_ok=True)

    # --- job level --------------------------------------------------------
    def write_job(self, meta: dict) -> None:
        path = os.path.join(self.out_dir, "manifest.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1, default=str)
        os.replace(tmp, path)

    def read_job(self) -> dict | None:
        path = os.path.join(self.out_dir, "manifest.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    # --- block markers ----------------------------------------------------
    def marker_path(self, parquet_basename: str) -> str:
        return os.path.join(
            self.done_dir, parquet_basename.replace(".parquet", ".json")
        )

    def write_block_marker(self, parquet_basename: str,
                           tiles: dict[int, dict]) -> None:
        path = self.marker_path(parquet_basename)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {"file": parquet_basename,
                 "tiles": {str(t): s for t, s in tiles.items()}},
                f,
            )
        os.replace(tmp, path)

    def iter_block_markers(self):
        for name in sorted(os.listdir(self.done_dir)):
            if not (name.startswith("part-") and name.endswith(".json")):
                continue
            path = os.path.join(self.done_dir, name)
            try:
                with open(path) as f:
                    yield path, json.load(f)
            except (json.JSONDecodeError, OSError):
                continue

    def completed_tiles(self) -> set[int]:
        """Tiles whose every listed marker has its parquet on disk (the
        stale sweep removes broken pairs first, so after it this is just
        the union of marker tile lists)."""
        tiles_dir = os.path.join(self.out_dir, "tiles")
        out: set[int] = set()
        for _path, data in self.iter_block_markers():
            if os.path.exists(os.path.join(tiles_dir, data["file"])):
                out.update(int(t) for t in data["tiles"])
        return out

    def read_tile(self, tile_id: int) -> dict | None:
        """Combined lineage for one tile across its range files:
        {"stats": combined per-tile stats, "files": [parquet names]}."""
        stats: dict[str, int] = {}
        files: list[str] = []
        key = str(tile_id)
        for _path, data in self.iter_block_markers():
            s = data["tiles"].get(key)
            if s is None:
                continue
            files.append(data["file"])
            for name, v in s.items():
                if name in stats:
                    stats[name] = combine_stat(name, stats[name], int(v))
                else:
                    stats[name] = int(v)
        if not files:
            return None
        return {"stats": stats, "files": files}

    def unmark_tile(self, tile_id: int) -> None:
        """Drop one tile from every marker listing it (marker removed
        when empty) — used when its range files are being invalidated."""
        key = str(tile_id)
        for path, data in self.iter_block_markers():
            if key not in data["tiles"]:
                continue
            del data["tiles"][key]
            if data["tiles"]:
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "w") as f:
                    json.dump(data, f)
                os.replace(tmp, path)
            else:
                os.remove(path)

    def remove_marker_for(self, parquet_basename: str) -> None:
        path = self.marker_path(parquet_basename)
        if os.path.exists(path):
            os.remove(path)

    def aggregate_counts(self) -> dict[str, int]:
        """Whole-output combined stats over every completed tile (the
        OverviewBuilder cross-check face)."""
        tiles_dir = os.path.join(self.out_dir, "tiles")
        out: dict[str, int] = {}
        for _path, data in self.iter_block_markers():
            if not os.path.exists(os.path.join(tiles_dir, data["file"])):
                continue
            for s in data["tiles"].values():
                for name, v in s.items():
                    if name in out:
                        out[name] = combine_stat(name, out[name], int(v))
                    else:
                        out[name] = int(v)
        return out

    def tiles_dir(self) -> str:
        return os.path.join(self.out_dir, "tiles")
