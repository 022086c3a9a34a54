"""PIP join, kNN join and raster sampling vs brute-force oracles."""

import numpy as np
import pyarrow as pa
import pytest

from mkgmap_ray.geom.pip import points_in_rings
from mkgmap_ray.stages.knn import GridKnnIndex, KnnJoin, knn_bruteforce
from mkgmap_ray.stages.pipjoin import PIPJoin, PolygonIndex
from mkgmap_ray.stages.raster import RasterSampler, bilinear, make_raster, UNDEF


def square(cy, cx, r):
    return (
        np.array([cy - r, cy - r, cy + r, cy + r]),
        np.array([cx - r, cx + r, cx + r, cx - r]),
    )


POLYS = [
    (1, [square(1 << 20, 1 << 20, 1 << 19)]),          # big square
    (2, [square(1 << 20, 1 << 20, 1 << 17)]),          # nested smaller square
    (3, [square(3 << 20, 3 << 20, 1 << 18),            # square with a hole
         square(3 << 20, 3 << 20, 1 << 16)]),
]


class TestPolygonIndex:
    def test_matches_brute_force(self):
        rng = np.random.default_rng(4)
        lat = rng.integers(0, 4 << 20, 3000)
        lon = rng.integers(0, 4 << 20, 3000)
        idx = PolygonIndex(POLYS, raster_shift=19)
        rows, pids = idx.query(lat, lon)
        got = set(zip(rows.tolist(), pids.tolist()))
        exp = set()
        for pid, rings in POLYS:
            inside = points_in_rings(lat, lon, rings)
            for r in np.flatnonzero(inside):
                exp.add((int(r), pid))
        assert got == exp

    def test_nested_multiple_matches(self):
        idx = PolygonIndex(POLYS)
        rows, pids = idx.query(np.array([1 << 20]), np.array([1 << 20]))
        assert sorted(pids.tolist()) == [1, 2]

    def test_hole_excludes(self):
        idx = PolygonIndex(POLYS)
        rows, pids = idx.query(np.array([3 << 20]), np.array([3 << 20]))
        assert pids.tolist() == []  # center is inside the hole


class TestPIPJoinStage:
    def test_explode_and_left_join(self, ray_session):
        batch = pa.table(
            {
                "pid": pa.array([0, 1], pa.int64()),
                "lat_hp": pa.array([1 << 20, 0], pa.int64()),
                "lon_hp": pa.array([1 << 20, 0], pa.int64()),
            }
        )
        j = PIPJoin(POLYS)
        out = j(batch)
        assert out["pid"].to_pylist() == [0, 0]
        assert sorted(out["boundary_id"].to_pylist()) == [1, 2]
        j2 = PIPJoin(POLYS, keep_unmatched=True)
        out2 = j2(batch)
        assert out2.num_rows == 3
        assert out2["boundary_id"].to_pylist()[-1] is None


class TestKnn:
    def test_grid_matches_brute(self):
        rng = np.random.default_rng(11)
        n_ref, n_p = 5000, 2000
        rlat = rng.integers(0, 1 << 22, n_ref)
        rlon = rng.integers(0, 1 << 22, n_ref)
        rids = rng.permutation(n_ref).astype(np.int64)
        plat = rng.integers(-(1 << 18), (1 << 22) + (1 << 18), n_p)
        plon = rng.integers(-(1 << 18), (1 << 22) + (1 << 18), n_p)
        idx = GridKnnIndex(rids, rlat, rlon, cell_size=1 << 18)
        bid, bd2 = knn_bruteforce(plat, plon, rids, rlat, rlon)
        for i in range(n_p):
            gid, gd2 = idx.nearest(int(plat[i]), int(plon[i]))
            assert gd2 == bd2[i], i
            assert gid == bid[i], i

    def test_max_dist_filter(self):
        idx = GridKnnIndex([7], [0], [0], cell_size=100)
        assert idx.nearest(1000, 0, max_dist2=999_999) == (-1, -1)
        assert idx.nearest(1000, 0, max_dist2=1_000_000) == (7, 1_000_000)

    def test_join_stage_brute_path(self, ray_session):
        batch = pa.table(
            {
                "hid": pa.array([0, 1], pa.int64()),
                "lat_hp": pa.array([10, 500], pa.int64()),
                "lon_hp": pa.array([10, 500], pa.int64()),
            }
        )
        j = KnnJoin(([1, 2], [0, 400], [0, 400]))
        out = j(batch)
        assert out["nn_id"].to_pylist() == [1, 2]
        assert out["nn_dist2"].to_pylist() == [200, 20000]


class TestRaster:
    def test_exact_at_grid_nodes(self):
        t = make_raster(res=8, n_voids=0)
        s = RasterSampler(t)
        batch = pa.table(
            {
                "lat": pa.array([0.0, 0.5, 1.0 - 1e-9], pa.float64()),
                "lon": pa.array([0.0, 0.25, 0.75], pa.float64()),
            }
        )
        out = s(batch)
        # node (0,0): h = 0
        assert out["height"][0].as_py() == 0.0

    def test_bilinear_midpoint(self):
        grid = np.array([[0, 10], [20, 30]], dtype=np.int64)
        v = bilinear(grid, np.array([0.5]), np.array([0.5]))
        assert v[0] == (0 + 10 + 20 + 30) / 4

    def test_void_is_null(self):
        grid = np.array([[0, UNDEF], [20, 30]], dtype=np.int64)
        v = bilinear(grid, np.array([0.5]), np.array([0.5]))
        assert np.isnan(v[0])

    def test_outside_tiles_null(self):
        t = make_raster(res=8, n_voids=0)
        s = RasterSampler(t)
        batch = pa.table(
            {
                "lat": pa.array([5.0], pa.float64()),
                "lon": pa.array([5.0], pa.float64()),
            }
        )
        assert s(batch)["height"][0].as_py() is None

    def test_closed_form_oracle(self):
        # away from voids the closed form h = (j*31 + i*17) % 1000 holds
        t = make_raster(res=100, n_voids=0)
        s = RasterSampler(t)
        lat, lon = 0.25, 0.75  # exact quarter positions → fy=25, fx=75
        out = s(
            pa.table(
                {"lat": pa.array([lat]), "lon": pa.array([lon])}
            )
        )
        assert out["height"][0].as_py() == (25 * 31 + 75 * 17) % 1000


class TestBicubic:
    def test_matches_transliterated_reference(self):
        import numpy as np
        from mkgmap_ray.stages.raster import bicubic

        def cubic_ref(p, q):
            return p[1] + 0.5 * q * (
                p[2] - p[0] + q * (2.0 * p[0] - 5.0 * p[1] + 4.0 * p[2] - p[3]
                                   + q * (3.0 * (p[1] - p[2]) + p[3] - p[0])))

        def bicubic_ref(p, qx, qy):
            return cubic_ref([cubic_ref(p[i], qy) for i in range(4)], qx)

        rng = np.random.default_rng(5)
        res = 32
        grid = rng.integers(-100, 3000, (res + 1, res + 1)).astype(np.int16)
        fx = rng.uniform(1.01, res - 2.01, 100)
        fy = rng.uniform(1.01, res - 2.01, 100)
        got = bicubic(grid, fx, fy)
        for i in range(100):
            x0, y0 = int(fx[i]), int(fy[i])
            p = [[float(grid[y0 + jj, x0 + ii]) for jj in (-1, 0, 1, 2)]
                 for ii in (-1, 0, 1, 2)]
            exp = bicubic_ref(p, fx[i] - x0, fy[i] - y0)
            assert abs(got[i] - exp) < 1e-9

    def test_void_and_border_fallback(self):
        import numpy as np
        from mkgmap_ray.stages.raster import UNDEF, sample_heights

        grid = np.full((9, 9), 100, np.int16)
        grid[5, 5] = UNDEF
        out = sample_heights(
            grid, np.asarray([5.3, 0.5, 2.5]), np.asarray([5.3, 0.5, 2.5])
        )
        assert np.isnan(out[0])       # void window and void bilinear corner
        assert out[1] == 100.0        # border → bilinear fallback
        assert out[2] == 100.0        # interior bicubic on flat grid


class TestGridKnnBatch:
    def test_forced_grid_path_matches_brute(self, ray_session):
        """Ref count above BRUTE_THRESHOLD forces the grid index; the
        vectorized batch ring search must match brute-force exactly."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from mkgmap_ray.stages.knn import KnnJoin, knn_bruteforce

        rng = np.random.default_rng(99)
        nref = 6000  # > BRUTE_THRESHOLD=4096
        ids = rng.permutation(nref * 2)[:nref]
        rlat = rng.integers(0, 1 << 22, nref)
        rlon = rng.integers(0, 1 << 22, nref)
        probes = pa.table(
            {
                "pid": pa.array(range(2000), pa.int64()),
                "lat_hp": pa.array(
                    rng.integers(0, 1 << 22, 2000), pa.int64()
                ),
                "lon_hp": pa.array(
                    rng.integers(0, 1 << 22, 2000), pa.int64()
                ),
            }
        )
        join = KnnJoin((ids, rlat, rlon))
        assert not join.brute
        out = join(probes)
        exp_id, exp_d2 = knn_bruteforce(
            probes["lat_hp"].to_numpy(), probes["lon_hp"].to_numpy(),
            ids, rlat, rlon,
        )
        np.testing.assert_array_equal(out["nn_id"].to_numpy(), exp_id)
        np.testing.assert_array_equal(out["nn_dist2"].to_numpy(), exp_d2)


class TestFillNumbers:
    """fill_numbers_part vs a scalar transliteration of
    ExtNumbers.fillNumbers (ExtNumbers.java:208-333, prev==next==null)."""

    @staticmethod
    def _scalar(houses):
        # houses: list of (pos, house, num) for ONE (road, side)
        houses = sorted(houses)
        nums = [n for _, _, n in houses]
        lo, hi = min(nums), max(nums)
        even = any(n % 2 == 0 for n in nums)
        odd = any(n % 2 == 1 for n in nums)
        style = 3 if even and odd else (2 if even else 1)
        inc = any(b - a > 0 for a, b in zip(nums, nums[1:]))
        dec = any(b - a < 0 for a, b in zip(nums, nums[1:]))
        in_order = not (inc and dec)
        start, end = nums[0], nums[-1]
        if start == end and hi != lo:
            increasing = True
        elif (start != hi and start != lo) or (end != hi and end != lo):
            in_order = False
            increasing = start <= end
        elif start < end:
            increasing = True
        else:
            increasing = False
        if increasing:
            start, end = lo, hi
        else:
            start, end = hi, lo
        step = 1 if style == 3 else 2
        distinct = set(nums)
        has_gaps = any(
            n not in distinct for n in range(lo + step, hi, step)
        )
        return (style, start, end, len(nums), int(not in_order),
                int(has_gaps))

    def test_randomized_vs_scalar(self):
        import pandas as pd

        from mkgmap_ray.stages.housenum import fill_numbers_part

        rng = np.random.default_rng(7)
        rows = []
        for road in range(40):
            for side in (-1, 0, 1):
                k = int(rng.integers(1, 12))
                for _ in range(k):
                    rows.append(
                        (road, side, int(rng.integers(0, 50)),
                         int(rng.integers(0, 10000)),
                         int(rng.integers(1, 30)))
                    )
        g = pd.DataFrame(
            rows, columns=["road", "side", "pos", "house", "num"]
        )
        out = fill_numbers_part(g.sample(frac=1, random_state=3))
        assert len(out) == 120
        by_key = {
            (r.road, r.side): (r.style, r.start_num, r.end_num, r.n,
                               r.not_in_order, r.has_gaps)
            for r in out.itertuples()
        }
        for (road, side), grp in g.groupby(["road", "side"]):
            houses = list(
                zip(grp["pos"], grp["house"], grp["num"])
            )
            assert by_key[(road, side)] == self._scalar(houses), (
                road, side, houses,
            )

    def test_edge_cases(self):
        import pandas as pd

        from mkgmap_ray.stages.housenum import fill_numbers_part

        # single house; constant number run; strictly decreasing; gap
        g = pd.DataFrame(
            {
                "road": [1, 2, 2, 2, 3, 3, 4, 4],
                "side": [1, 1, 1, 1, 1, 1, 1, 1],
                "pos": [0, 0, 1, 2, 0, 1, 0, 1],
                "house": [10, 20, 21, 22, 30, 31, 40, 41],
                "num": [5, 7, 7, 7, 9, 3, 2, 8],
            }
        )
        out = fill_numbers_part(g).set_index("road")
        assert tuple(out.loc[1][["style", "start_num", "end_num"]]) == (1, 5, 5)
        assert tuple(out.loc[2][["style", "start_num", "end_num"]]) == (1, 7, 7)
        r3 = out.loc[3]
        assert (r3.style, r3.start_num, r3.end_num, r3.has_gaps) == (1, 9, 3, 1)
        r4 = out.loc[4]
        assert (r4.style, r4.start_num, r4.end_num, r4.has_gaps) == (2, 2, 8, 1)

    def test_empty(self):
        import pandas as pd

        from mkgmap_ray.stages.housenum import fill_numbers_part

        out = fill_numbers_part(
            pd.DataFrame(
                {c: [] for c in ("road", "side", "pos", "house", "num")}
            )
        )
        assert len(out) == 0


class TestHouseRepair:
    def _fixture(self, n=15000):
        k = np.arange(0, n, 37, dtype=np.int64)
        h = k // 37
        road, j = h // 12, h % 12
        v = road % 3
        side = np.where((v == 1) & (j >= 6), 1, -1)
        num = np.select(
            [v == 0, (v == 1) & (j < 6), v == 1, j < 6],
            [2 * j + 1, 10 + j, 8 + j, j + 1], 200000 + j,
        )
        pos = np.select(
            [(v == 1) & (j >= 6), (v == 2) & (j >= 6)],
            [500 + j * 10, 700 + j * 10], j * 10,
        )
        import pandas as pd
        return pd.DataFrame(
            {"road": road, "side": side, "pos": pos, "house": k, "num": num}
        )

    def test_repair_splits_until_plausible(self):
        from mkgmap_ray.stages.housenum import (
            MAX_DELTA,
            _implausible_keys,
            fill_numbers_part,
            repair_intervals_part,
        )

        g = self._fixture()
        out = repair_intervals_part(g)
        v = out["road"] % 3
        # clean roads untouched (single part, intervals == fillNumbers)
        assert (out[v == 0].groupby("road")["part"].max() == 0).all()
        plain = fill_numbers_part(g[g["road"] % 3 == 0]).sort_values(
            ["road", "side"]).reset_index(drop=True).astype("int64")
        rep0 = out[v == 0][plain.columns].sort_values(
            ["road", "side"]).reset_index(drop=True)
        assert rep0.equals(plain)
        # overlap-dirty roads split into single-sided parts
        p0 = out[(v == 1) & (out["part"] == 0)]
        p1 = out[(v == 1) & (out["part"] == 1)]
        assert (p0["side"] == -1).all() and (p1["side"] == 1).all()
        # delta-dirty roads now within MAX_DELTA everywhere
        assert (np.abs(out["start_num"] - out["end_num"]) <= MAX_DELTA).all()
        # every output interval is plausible
        iv = out.rename(columns={"part": "ipart"})
        assert len(_implausible_keys(iv)) == 0

    def test_repair_needs_two_passes(self):
        """The ExtNumbers loop must iterate: a two-jump road's first
        split leaves a still->MAX_DELTA part; only the second pass
        (splitting the remainder at ITS largest gap) reaches the
        fixpoint (ExtNumbers.java:394-427 while-loop semantics)."""
        import pandas as pd

        from mkgmap_ray.stages.housenum import (
            MAX_DELTA,
            repair_intervals_part,
        )

        j = np.arange(12)
        g = pd.DataFrame({
            "road": np.full(12, 3), "side": np.full(12, -1),
            "num": np.select([j < 4, j < 8],
                             [2 * j + 2, 300000 + 2 * j], 600000 + 2 * j),
            "pos": np.select([j >= 8, j >= 4],
                             [1500 + j * 10, 1000 + j * 10], j * 10),
            "house": j,
        })
        out = repair_intervals_part(g)
        assert len(out) == 3
        assert (np.abs(out["start_num"] - out["end_num"]) <= MAX_DELTA).all()
        # one pass is NOT enough — the iterative loop is load-bearing
        one = repair_intervals_part(g, max_rounds=1)
        assert (np.abs(one["start_num"] - one["end_num"]) > MAX_DELTA).any()

    def test_unsplittable_interval_kept(self):
        import pandas as pd

        from mkgmap_ray.stages.housenum import repair_intervals_part

        # two houses at the SAME position with a > MAX_DELTA span: no
        # positive gap to split at -> the reference logs and keeps it
        g = pd.DataFrame(
            {"road": [7, 7], "side": [-1, -1], "pos": [5, 5],
             "house": [1, 2], "num": [1, 200001]}
        )
        out = repair_intervals_part(g)
        assert len(out) == 1
        assert out["start_num"].iloc[0] == 1
        assert out["end_num"].iloc[0] == 200001
