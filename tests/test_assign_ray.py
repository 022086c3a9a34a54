"""Ray integration: distributed tile assignment equals the local oracle."""

import numpy as np
import pyarrow as pa
import pytest

from mkgmap_ray.geom.area import Area
from mkgmap_ray.geom.coords import DELTA_SHIFT
from mkgmap_ray.grid import SplitTree, assign_nodes
from mkgmap_ray.splitter import SplitLimits, refine
from mkgmap_ray.stages.assign import (
    assign_cells,
    build_split_tree,
    narrow_stats,
)

from test_splitter import local_stats_fn, make_features


def features_table(feats) -> pa.Table:
    """Build a FEATURES Arrow table whose centers equal the given points.

    Points get a single coordinate; lines/shapes get a 3-point geometry whose
    map-unit bbox midpoint is exactly the given center."""
    n = len(feats["kind"])
    rows_lat, rows_lon = [], []
    for i in range(n):
        la = int(feats["lat_hp"][i]) >> DELTA_SHIFT
        lo = int(feats["lon_hp"][i]) >> DELTA_SHIFT
        if feats["kind"][i] == 0:
            rows_lat.append([la << DELTA_SHIFT])
            rows_lon.append([lo << DELTA_SHIFT])
        else:
            npts = int(feats["n_points"][i])
            # bbox [la-d, la+d] x [lo-d, lo+d] → midpoint (la, lo)
            d = 5
            la_pts = [(la - d) << DELTA_SHIFT, la << DELTA_SHIFT, (la + d) << DELTA_SHIFT]
            lo_pts = [(lo - d) << DELTA_SHIFT, (lo + d) << DELTA_SHIFT, lo << DELTA_SHIFT]
            # pad to n_points with interior repeats (keeps bbox unchanged)
            while len(la_pts) < npts:
                la_pts.append(la << DELTA_SHIFT)
                lo_pts.append(lo << DELTA_SHIFT)
            rows_lat.append(la_pts)
            rows_lon.append(lo_pts)
    return pa.table(
        {
            "feature_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(feats["kind"], pa.int8()),
            "lat_hp": pa.array(rows_lat, pa.list_(pa.int32())),
            "lon_hp": pa.array(rows_lon, pa.list_(pa.int32())),
        }
    )


def test_ray_assignment_matches_local(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(42)
    bbox = (100, 100, (1 << 16) + 100, (1 << 16) + 100)
    feats = make_features(rng, 3000, bbox_mu=bbox)
    table = features_table(feats)
    ds = rd.from_arrow(table).repartition(8)

    bounds = Area(*[b for b in (100, 100, (1 << 16) + 100, (1 << 16) + 100)])
    narrow = narrow_stats(ds)
    tree = build_split_tree(narrow, shift=0, bounds=bounds)

    # local reference tree over the same features
    local_tree = SplitTree.root(bounds, 0)
    local_tree.split_max_size()
    local_tree = refine(local_tree, local_stats_fn(feats), SplitLimits())

    assert tree.pack()["child_off"].tolist() == local_tree.pack()["child_off"].tolist()
    assert [tuple(vars(b).values()) for b in tree.bounds] == [
        tuple(vars(b).values()) for b in local_tree.bounds
    ]

    assigned, meta = assign_cells(ds, tree)
    out = assigned.to_pandas().sort_values("feature_id")
    expected = assign_nodes(local_tree.pack(), feats["lat_hp"], feats["lon_hp"])
    np.testing.assert_array_equal(out["cell"].to_numpy(), expected)

    # tile metadata covers every assigned cell exactly once
    assert meta.num_rows == len(tree.leaves())
    assert set(out["cell"]).issubset(set(meta["cell"].to_pylist()))
    assert (out["tile_id"] >= 0).all()


def test_level_trees_match_recursive_oracle(ray_session):
    """Per-zoom continuation trees (makeMapAreas parity): each level's
    leaf AREAS must equal the recursive per-parent oracle's."""
    import ray.data as rd

    from mkgmap_ray.stages.assign import build_level_trees
    from oracle_splitter import oracle_split_levels

    rng = np.random.default_rng(7)
    bbox = (100, 100, (1 << 17) + 100, (1 << 17) + 100)
    feats = make_features(rng, 4000, bbox_mu=bbox)
    table = features_table(feats)
    ds = rd.from_arrow(table).repartition(8)
    bounds = Area(*bbox)
    shifts = (8, 6, 4, 2, 0)
    # permissive limits so coarse levels actually split at every shift
    limits = SplitLimits()

    trees = build_level_trees(narrow_stats(ds), shifts, limits, bounds)

    feat_dicts = [
        {
            "kind": int(feats["kind"][i]),
            "n_points": int(feats["n_points"][i]),
            "lat_hp": int(feats["lat_hp"][i]),
            "lon_hp": int(feats["lon_hp"][i]),
        }
        for i in range(len(feats["kind"]))
    ]
    oracle_levels = oracle_split_levels(feat_dicts, bounds, shifts, limits)

    for tree, oracle in zip(trees, oracle_levels):
        got = sorted(
            (b.min_lat, b.min_lon, b.max_lat, b.max_lon)
            for b in (tree.bounds[leaf] for leaf in tree.leaves())
        )
        exp = sorted(
            (a.min_lat, a.min_lon, a.max_lat, a.max_lon)
            for a, _members in oracle
        )
        assert got == exp
    # monotone: finer levels never have fewer tiles
    counts = [len(t.leaves()) for t in trees]
    assert counts == sorted(counts)


def test_spill_path_identical_tree(ray_session, monkeypatch):
    """MKGMAP_NARROW_SPILL_BYTES=0 streams the narrow projection straight
    to parquet (no materialize) and refines from disk — the resulting
    tree must be identical to the in-memory path."""
    import ray.data as rd

    from mkgmap_ray.stages.assign import NARROW_SPILL_BYTES_ENV

    rng = np.random.default_rng(17)
    bbox = (100, 100, (1 << 16) + 100, (1 << 16) + 100)
    feats = make_features(rng, 2000, bbox_mu=bbox)
    table = features_table(feats)
    bounds = Area(100, 100, (1 << 16) + 100, (1 << 16) + 100)

    mem_tree = build_split_tree(
        narrow_stats(rd.from_arrow(table).repartition(8)),
        shift=0, bounds=bounds,
    )
    monkeypatch.setenv(NARROW_SPILL_BYTES_ENV, "0")
    spill_ds = narrow_stats(rd.from_arrow(table).repartition(8))
    spill_tree = build_split_tree(spill_ds, shift=0, bounds=bounds)

    assert spill_tree.pack()["child_off"].tolist() == \
        mem_tree.pack()["child_off"].tolist()
    assert [tuple(vars(b).values()) for b in spill_tree.bounds] == [
        tuple(vars(b).values()) for b in mem_tree.bounds
    ]
