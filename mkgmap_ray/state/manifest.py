"""Per-partition lineage manifest + resumable tile output layout.

Output layout (the "resumable output" contract):

    out_dir/
      manifest.json            # job-level: input, tree digest, tile list
      tiles/part-<lo>-<hi>-<digest>.parquet  # one file per sorted block,
                                             # covering tile range [lo, hi]
      _done/tile_<k>.json      # per-tile completion marker + lineage
                               # (records the contributing range files)

A rerun loads ``_done`` markers and skips completed tiles (the reference
reruns whole jobs; resumability is an explicit north-rule requirement —
SURVEY.md §4 "checkpoint/resume").

Markers are written AFTER the range files are fully written, so a crash
mid-run leaves unmarked tiles; the next run deletes range files touching
any unmarked tile (demoting marked tiles that shared those files) and
rewrites exactly the missing work. Range files are content-addressed, so
identical rewrites are idempotent.
"""

from __future__ import annotations

import hashlib
import json
import os
import time


def tree_digest(packed: dict) -> str:
    h = hashlib.sha256()
    for k in sorted(packed):
        h.update(k.encode())
        h.update(packed[k].tobytes())
    return h.hexdigest()[:16]


class RunManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.done_dir = os.path.join(out_dir, "_done")
        os.makedirs(self.done_dir, exist_ok=True)

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

    def completed_tiles(self) -> set[int]:
        out = set()
        for name in os.listdir(self.done_dir):
            if name.startswith("tile_") and name.endswith(".json"):
                out.add(int(name[5:-5]))
        return out

    def mark_tile(self, tile_id: int, lineage: dict) -> None:
        path = os.path.join(self.done_dir, f"tile_{tile_id}.json")
        tmp = path + ".tmp"
        lineage = {"tile_id": tile_id, "completed_at": time.time(), **lineage}
        with open(tmp, "w") as f:
            json.dump(lineage, f, default=str)
        os.replace(tmp, path)

    def unmark_tile(self, tile_id: int) -> None:
        path = os.path.join(self.done_dir, f"tile_{tile_id}.json")
        if os.path.exists(path):
            os.remove(path)

    def read_tile(self, tile_id: int) -> dict | None:
        path = os.path.join(self.done_dir, f"tile_{tile_id}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def tiles_dir(self) -> str:
        return os.path.join(self.out_dir, "tiles")
