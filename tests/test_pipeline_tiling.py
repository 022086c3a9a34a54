"""End-to-end tiling pipeline over Ray: assignment invariants, clipping
containment, resumable write."""

import os

import numpy as np
import pyarrow as pa
import pytest

from mkgmap_ray.geom.area import Area
from mkgmap_ray.pipelines.derive import features_from_testdata
from mkgmap_ray.pipelines.tiling import build_tiles, tile_summary, write_tiles

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiled(ray_session):
    import ray.data as rd

    table = features_from_testdata(SF_DIR)
    ds = rd.from_arrow(table).repartition(4)
    bounds = Area(-8192, -8192, (1 << 16) + 8192, (1 << 16) + 8192)
    assigned, meta, tree = build_tiles(ds, shift=0, bounds=bounds, clip=True)
    return assigned.materialize(), meta, tree, table


def test_every_row_has_a_tile(tiled):
    assigned, meta, tree, table = tiled
    df = assigned.to_pandas()
    assert (df["tile_id"] >= 0).all()
    assert df["cell"].isin([l for l in tree.leaves()]).all()


def test_clipped_geometry_inside_cell(tiled):
    assigned, meta, tree, _ = tiled
    df = assigned.to_pandas()
    bounds = {int(r["cell"]): (r["min_lat"], r["min_lon"], r["max_lat"], r["max_lon"])
              for r in meta.to_pylist()}
    for _, row in df.sample(min(len(df), 400), random_state=0).iterrows():
        min_lat, min_lon, max_lat, max_lon = bounds[int(row["cell"])]
        la = np.asarray(row["lat_hp"]) >> 6
        lo = np.asarray(row["lon_hp"]) >> 6
        assert (la >= min_lat - 1).all() and (la <= max_lat + 1).all()
        assert (lo >= min_lon - 1).all() and (lo <= max_lon + 1).all()


def test_owner_uniqueness_unclipped(ray_session):
    """Without sink clipping each feature appears exactly once."""
    import ray.data as rd

    table = features_from_testdata(SF_DIR)
    ds = rd.from_arrow(table)
    assigned, meta, tree = build_tiles(ds, shift=0, clip=False)
    df = assigned.to_pandas()
    assert len(df) == table.num_rows
    assert df["feature_id"].is_unique


def test_summary_counts(tiled):
    assigned, meta, tree, table = tiled
    s = tile_summary(assigned).to_pandas()
    kinds = pa.table({"kind": table["kind"]}).to_pandas()["kind"]
    # clipping can split lines into parts and drop outside-bbox pieces, but
    # points inside the bbox must be conserved exactly
    import duckdb  # noqa: F401  (just to show counts are checkable)

    assert s["n_points"].sum() <= (kinds == 0).sum()
    assert s["n_points"].sum() > 0 and s["n_lines"].sum() > 0


def test_resumable_write(tiled, tmp_path):
    assigned, meta, tree, _ = tiled
    out = str(tmp_path / "tiles_out")
    r1 = write_tiles(assigned, meta, tree, out, input_desc="sf0.001")
    assert r1["written_tiles"] > 0 and r1["skipped_tiles"] == 0
    # every written tile is recoverable from the block markers
    from mkgmap_ray.state.manifest import RunManifest

    assert len(RunManifest(out).completed_tiles()) == r1["written_tiles"]

    r2 = write_tiles(assigned, meta, tree, out, input_desc="sf0.001")
    assert r2["skipped_tiles"] == r1["written_tiles"]
    assert r2["written_tiles"] == 0


def test_keep_going_quarantines_failed_tile(ray_session, tmp_path):
    """--keep-going (main/Main.java:566-575): a tile whose per-tile
    transform raises is quarantined with a lineage entry and the run
    COMPLETES; the quarantined tile is never marked done, and a later
    run (poison gone) retries and clears it."""
    import ray.data as rd

    from mkgmap_ray.stages.tilewriter import QuarantineGuard
    from mkgmap_ray.state.manifest import RunManifest

    table = features_from_testdata(SF_DIR)
    ds = rd.from_arrow(table)
    assigned, meta, tree = build_tiles(ds, shift=0, clip=False)
    out = str(tmp_path / "tiles_out")
    # poison a tile that actually has features
    s = tile_summary(assigned).to_pandas()
    poison = int(s["tile_id"].iloc[1])

    def poisoned_clip(batch):
        tid = np.asarray(batch["tile_id"].combine_chunks(), np.int64)
        if (tid == poison).any():
            raise ValueError(f"poisoned clip for tile {poison}")
        return batch

    guarded = assigned.map_batches(
        QuarantineGuard(poisoned_clip, out),
        batch_format="pyarrow", batch_size=None,
    )
    r = write_tiles(guarded, meta, tree, out, resume=False,
                    keep_going=True)
    man = RunManifest(out)
    q = man.quarantined_tiles()
    assert list(q) == [poison]
    assert "poisoned clip" in q[poison]
    assert r["quarantined_tiles"] == [poison]
    assert r["written_tiles"] > 0  # the run completed without the tile
    assert poison not in man.completed_tiles()

    # retry without the poison: the tile writes, quarantine clears
    r2 = write_tiles(assigned, meta, tree, out)
    assert poison in man.completed_tiles()
    assert man.quarantined_tiles() == {}
    assert r2["quarantined_tiles"] == []


def test_quarantine_guard_all_tiles_fail(tmp_path):
    """When every tile in a batch fails, the guard still returns a
    schema-stable (empty-probe) table and records every tile."""
    from mkgmap_ray.stages.tilewriter import QuarantineGuard
    from mkgmap_ray.state.manifest import RunManifest

    out = str(tmp_path / "q_out")

    def always_fail(batch):
        if batch.num_rows:
            raise RuntimeError("boom")
        return pa.table({"tile_id": pa.array([], pa.int64())})

    batch = pa.table({"tile_id": pa.array([3, 3, 7], pa.int64())})
    res = QuarantineGuard(always_fail, out)(batch)
    assert res.num_rows == 0 and res.column_names == ["tile_id"]
    q = RunManifest(out).quarantined_tiles()
    assert sorted(q) == [3, 7]
    assert all("boom" in e for e in q.values())


def test_overview_combiner_matches_manifest(ray_session, tmp_path):
    """OverviewBuilder analogue: re-read written tiles, counts must equal
    the lineage manifest totals."""
    import ray.data as rd

    from mkgmap_ray.pipelines.derive import features_from_testdata
    from mkgmap_ray.pipelines.tiling import (
        build_tiles,
        overview_from_tiles,
        write_tiles,
    )

    table = features_from_testdata(SF_DIR)
    ds = rd.from_arrow(table)
    assigned, meta, tree = build_tiles(ds, shift=0, clip=False)
    out = str(tmp_path / "tiles_out")
    write_tiles(assigned, meta, tree, out, resume=False)

    overview, man_totals = overview_from_tiles(out)
    by_kind = dict(zip(overview["kind"], overview["n"]))
    assert by_kind.get(0, 0) == man_totals["n_points"]
    assert by_kind.get(1, 0) == man_totals["n_lines"]
    assert by_kind.get(2, 0) == man_totals["n_shapes"]
    assert overview["n"].sum() == table.num_rows
