"""Split-tree refinement vs the recursive oracle, local (no Ray)."""

import numpy as np
import pytest

from mkgmap_ray.geom.area import Area
from mkgmap_ray.geom.coords import DELTA_SHIFT
from mkgmap_ray.grid import SplitTree, assign_nodes, feature_centers, java_idiv
from mkgmap_ray.splitter import (
    STAT_COLS,
    SplitLimits,
    element_stats,
    refine,
)

from oracle_splitter import oracle_split


def make_features(rng, n, bbox_mu=(0, 0, 1 << 16, 1 << 16), clustered=True):
    min_lat, min_lon, max_lat, max_lon = bbox_mu
    # 70% uniform + 30% in dense hotspots (skew)
    n_hot = int(n * 0.3) if clustered else 0
    lat = rng.integers(min_lat, max_lat, n)
    lon = rng.integers(min_lon, max_lon, n)
    if n_hot:
        cx = (min_lat + max_lat) // 2
        cy = (min_lon + max_lon) // 2
        lat[:n_hot] = np.clip(
            rng.normal(cx, (max_lat - min_lat) / 50, n_hot), min_lat, max_lat
        ).astype(np.int64)
        lon[:n_hot] = np.clip(
            rng.normal(cy, (max_lon - min_lon) / 50, n_hot), min_lon, max_lon
        ).astype(np.int64)
    kind = rng.integers(0, 3, n)
    n_points = np.where(kind == 0, 1, rng.integers(2, 300, n))
    return {
        "lat_hp": (lat.astype(np.int64) << DELTA_SHIFT),
        "lon_hp": (lon.astype(np.int64) << DELTA_SHIFT),
        "kind": kind.astype(np.int64),
        "n_points": n_points.astype(np.int64),
    }


def local_stats_fn(feats):
    n_pt, n_ln, n_sh, est, n_split = element_stats(feats["kind"], feats["n_points"])
    cols = dict(zip(STAT_COLS, (n_pt, n_ln, n_sh, est, n_split)))

    def fn(packed):
        leaf = assign_nodes(packed, feats["lat_hp"], feats["lon_hp"])
        n = int(packed["child_off"].shape[0])
        out = {}
        for c, v in cols.items():
            out[c] = np.bincount(leaf, weights=v, minlength=n).astype(np.int64)
        return out

    return fn


BOUNDS = Area(0, 0, 1 << 16, 1 << 16)


@pytest.mark.parametrize("seed,n,shift", [(42, 2000, 0), (7, 5000, 2), (1, 300, 4)])
def test_refined_tree_matches_recursive_oracle(seed, n, shift):
    rng = np.random.default_rng(seed)
    feats = make_features(rng, n)
    tree = SplitTree.root(BOUNDS, shift)
    tree.split_max_size()
    tree = refine(tree, local_stats_fn(feats), SplitLimits())
    leaf = assign_nodes(tree.pack(), feats["lat_hp"], feats["lon_hp"])

    oracle_feats = [
        {
            "lat_hp": int(feats["lat_hp"][i]),
            "lon_hp": int(feats["lon_hp"][i]),
            "kind": int(feats["kind"][i]),
            "n_points": int(feats["n_points"][i]),
        }
        for i in range(n)
    ]
    oracle_leaves = oracle_split(oracle_feats, BOUNDS, shift)

    # same leaf areas
    engine_areas = sorted(
        (tree.bounds[l].min_lat, tree.bounds[l].min_lon,
         tree.bounds[l].max_lat, tree.bounds[l].max_lon)
        for l in tree.leaves()
    )
    oracle_areas = sorted(
        (a.min_lat, a.min_lon, a.max_lat, a.max_lon) for a, _ in oracle_leaves
    )
    assert engine_areas == oracle_areas

    # same row-for-row assignment
    oracle_assign = {}
    for a, members in oracle_leaves:
        key = (a.min_lat, a.min_lon, a.max_lat, a.max_lon)
        for i in members:
            oracle_assign[i] = key
    for i in range(n):
        b = tree.bounds[leaf[i]]
        assert oracle_assign[i] == (b.min_lat, b.min_lon, b.max_lat, b.max_lon), i


def test_limits_hold_on_refined_tree():
    rng = np.random.default_rng(3)
    feats = make_features(rng, 8000)
    tree = SplitTree.root(BOUNDS, 0)
    tree.split_max_size()
    limits = SplitLimits()
    tree = refine(tree, local_stats_fn(feats), limits)
    leaf = assign_nodes(tree.pack(), feats["lat_hp"], feats["lon_hp"])
    n_pt, n_ln, n_sh, est, n_split = element_stats(feats["kind"], feats["n_points"])
    for l in tree.leaves():
        m = leaf == l
        b = tree.bounds[l]
        splittable = n_split[m].sum() > 1 and b.max_dimension > (
            limits.min_dimension << tree.shift
        )
        if splittable:
            assert n_pt[m].sum() <= limits.max_points
            assert n_ln[m].sum() <= limits.max_lines
            assert est[m].sum() <= limits.max_rgn_size


def test_every_feature_exactly_one_leaf():
    rng = np.random.default_rng(9)
    feats = make_features(rng, 1000)
    tree = SplitTree.root(BOUNDS, 0)
    tree = refine(tree, local_stats_fn(feats), SplitLimits())
    leaf = assign_nodes(tree.pack(), feats["lat_hp"], feats["lon_hp"])
    leaves = set(tree.leaves())
    assert all(int(l) in leaves for l in leaf)


def test_java_idiv():
    assert java_idiv(-5, 2) == -2
    assert java_idiv(5, 2) == 2
    assert java_idiv(-4, 2) == -2


def test_feature_centers_points_vs_lines():
    lat_c, lon_c = feature_centers(
        np.array([0, 1]),
        np.array([100, 100]),
        np.array([100, 201]),
        np.array([50, 50]),
        np.array([50, 151]),
    )
    assert lat_c.tolist() == [100 << DELTA_SHIFT, 150 << DELTA_SHIFT]
    assert lon_c.tolist() == [50 << DELTA_SHIFT, 100 << DELTA_SHIFT]


class TestPredictFilterPoints:
    """predicted_num_points vs a scalar replay of
    PredictFilterPoints.predictedMaxNumPoints (java:18-52)."""

    @staticmethod
    def _scalar(points, resolution, preserved=None):
        shift = 24 - resolution
        if shift <= 0:
            half, mask = 0, ~0
        else:
            half, mask = 1 << (shift - 1), ~((1 << shift) - 1)
        n = 0
        last = None
        for i, (la, lo) in enumerate(points):
            r = ((la + half) & mask, (lo + half) & mask)
            if n == 0:
                n = 1
            elif r != last or (preserved is not None and preserved[i]):
                n += 1
            last = r
        return n

    def test_matches_scalar_oracle_randomized(self):
        import numpy as np

        from mkgmap_ray.splitter import predicted_num_points

        rng = np.random.default_rng(42)
        for resolution in (24, 20, 16, 12):
            lens = rng.integers(0, 12, size=60)
            offsets = np.r_[0, np.cumsum(lens)]
            total = int(offsets[-1])
            # coarse steps so rounding genuinely merges runs
            lat = rng.integers(0, 1 << 12, size=total) * rng.integers(
                1, 64, size=total
            )
            lon = rng.integers(0, 1 << 12, size=total) * rng.integers(
                1, 64, size=total
            )
            got = predicted_num_points(lat, lon, offsets, resolution)
            for i in range(len(lens)):
                pts = list(
                    zip(
                        lat[offsets[i]:offsets[i + 1]].tolist(),
                        lon[offsets[i]:offsets[i + 1]].tolist(),
                    )
                )
                assert got[i] == self._scalar(pts, resolution), (
                    i, resolution, pts,
                )

    def test_preserved_points_always_count(self):
        import numpy as np

        from mkgmap_ray.splitter import predicted_num_points

        # all points round to the same cell; preserved ones still count
        lat = np.array([0, 1, 2, 3], np.int64)
        lon = np.array([0, 1, 2, 3], np.int64)
        offsets = np.array([0, 4], np.int64)
        assert predicted_num_points(lat, lon, offsets, 16)[0] == 1
        pres = np.array([False, False, True, False])
        assert predicted_num_points(
            lat, lon, offsets, 16, preserved=pres
        )[0] == 2

    def test_empty_rows(self):
        import numpy as np

        from mkgmap_ray.splitter import predicted_num_points

        lat = np.array([100, 200], np.int64)
        lon = np.array([100, 200], np.int64)
        offsets = np.array([0, 0, 2, 2], np.int64)
        got = predicted_num_points(lat, lon, offsets, 24)
        assert got.tolist() == [0, 2, 0]
