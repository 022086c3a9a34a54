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

    # --- quarantine (--keep-going, main/Main.java:566-575) -----------------
    def write_quarantine(self, tile_id: int, error: str) -> None:
        """Record a failed tile's lineage entry: the run continues, the
        tile's rows are dropped for THIS run, and a later run retries it
        (quarantined tiles are never marked done)."""
        path = os.path.join(self.done_dir, f"quarantine-{tile_id:08d}.json")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"tile_id": int(tile_id), "error": error}, f)
        os.replace(tmp, path)

    def quarantined_tiles(self) -> dict[int, str]:
        out: dict[int, str] = {}
        for name in sorted(os.listdir(self.done_dir)):
            if not (name.startswith("quarantine-") and name.endswith(".json")):
                continue
            try:
                with open(os.path.join(self.done_dir, name)) as f:
                    data = json.load(f)
                out[int(data["tile_id"])] = data.get("error", "")
            except (json.JSONDecodeError, OSError):
                continue
        return out

    def clear_quarantine(self, tile_ids=None) -> None:
        """Drop quarantine entries — all of them, or only the given tiles
        (a successful rewrite clears the lineage record)."""
        wanted = None if tile_ids is None else {int(t) for t in tile_ids}
        for name in os.listdir(self.done_dir):
            if not (name.startswith("quarantine-") and name.endswith(".json")):
                continue
            if wanted is None or int(name[11:-5]) in wanted:
                os.remove(os.path.join(self.done_dir, name))

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

    def tile_index(self, require_file: bool = True) -> dict[int, dict]:
        """ONE pass over the block markers → ``{tile_id: {"stats":
        combined per-tile stats, "files": [parquet names]}}``. Replaces
        per-tile ``read_tile`` loops: those re-listed and re-parsed every
        marker per call — O(tiles × markers) driver JSON work, the
        round-2 verdict's next serial scaling term."""
        tiles_dir = os.path.join(self.out_dir, "tiles")
        out: dict[int, dict] = {}
        for _path, data in self.iter_block_markers():
            if require_file and not os.path.exists(
                os.path.join(tiles_dir, data["file"])
            ):
                continue
            for t_str, s in data["tiles"].items():
                t = int(t_str)
                e = out.get(t)
                if e is None:
                    out[t] = {
                        "stats": {k: int(v) for k, v in s.items()},
                        "files": [data["file"]],
                    }
                    continue
                e["files"].append(data["file"])
                st = e["stats"]
                for name, v in s.items():
                    st[name] = (
                        combine_stat(name, st[name], int(v))
                        if name in st else int(v)
                    )
        return out

    def read_tile(self, tile_id: int) -> dict | None:
        """Combined lineage for ONE tile (single marker pass). Callers
        that need many tiles must use ``tile_index`` instead."""
        return self.tile_index(require_file=False).get(int(tile_id))

    def unmark_tiles(self, tile_ids) -> None:
        """Drop a BATCH of tiles from every marker listing any of them
        (markers removed when empty; each marker rewritten at most once).
        Used when range files are being invalidated."""
        keys = {str(int(t)) for t in tile_ids}
        if not keys:
            return
        for path, data in self.iter_block_markers():
            hit = keys & data["tiles"].keys()
            if not hit:
                continue
            for k in hit:
                del data["tiles"][k]
            if data["tiles"]:
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "w") as f:
                    json.dump(data, f)
                os.replace(tmp, path)
            else:
                os.remove(path)

    def unmark_tile(self, tile_id: int) -> None:
        self.unmark_tiles([tile_id])

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
