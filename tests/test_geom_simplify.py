import numpy as np

from mkgmap_ray.geom.coords import deg_to_hp
from mkgmap_ray.geom.simplify import (
    douglas_peucker,
    shortest_dist_to_segment,
    _dist_m,
)


def hp(deg):
    return int(deg_to_hp(deg))


class TestDistance:
    def test_one_degree_lat_is_111km(self):
        d = _dist_m(hp(0.0), hp(0.0), hp(1.0), hp(0.0))
        assert abs(d - 111_319) < 200

    def test_lon_scaled_by_cos(self):
        d_eq = _dist_m(hp(0.0), hp(0.0), hp(0.0), hp(1.0))
        d_60 = _dist_m(hp(60.0), hp(0.0), hp(60.0), hp(1.0))
        assert abs(d_60 / d_eq - 0.5) < 0.01

    def test_point_to_segment_perpendicular(self):
        # p 0.001° above the middle of a horizontal segment at the equator
        d = shortest_dist_to_segment(
            np.array([hp(0.001)]), np.array([hp(0.5)]),
            hp(0.0), hp(0.0), hp(0.0), hp(1.0),
        )[0]
        assert abs(d - 111.3) < 1.0

    def test_point_beyond_endpoint_clamps(self):
        d = shortest_dist_to_segment(
            np.array([hp(0.0)]), np.array([hp(2.0)]),
            hp(0.0), hp(0.0), hp(0.0), hp(1.0),
        )[0]
        assert abs(d - 111_319) < 300


class TestDouglasPeucker:
    def test_straight_line_collapses(self):
        lat = np.array([hp(0.0), hp(0.1), hp(0.2), hp(0.3)])
        lon = np.array([hp(0.0), hp(0.1), hp(0.2), hp(0.3)])
        keep = douglas_peucker(lat, lon, allowed_error=50.0)
        assert keep.tolist() == [True, False, False, True]

    def test_big_kink_kept(self):
        lat = np.array([hp(0.0), hp(0.5), hp(0.0)])
        lon = np.array([hp(0.0), hp(0.5), hp(1.0)])
        keep = douglas_peucker(lat, lon, allowed_error=50.0)
        assert keep.all()

    def test_small_kink_removed(self):
        lat = np.array([hp(0.0), hp(0.0001), hp(0.0)])
        lon = np.array([hp(0.0), hp(0.5), hp(1.0)])
        # 0.0001 deg ≈ 11 m < 50 m tolerance
        keep = douglas_peucker(lat, lon, allowed_error=50.0)
        assert keep.tolist() == [True, False, True]

    def test_preserved_points_pin(self):
        lat = np.array([hp(0.0), hp(0.0001), hp(0.0), hp(0.0001), hp(0.0)])
        lon = np.array([hp(0.0), hp(0.25), hp(0.5), hp(0.75), hp(1.0)])
        preserved = np.array([False, False, True, False, False])
        keep = douglas_peucker(lat, lon, 50.0, preserved=preserved)
        assert keep.tolist() == [True, False, True, False, True]

    def test_endpoints_always_kept(self):
        rng = np.random.default_rng(3)
        lat = deg_to_hp(rng.uniform(0, 0.01, 50))
        lon = deg_to_hp(np.linspace(0, 1, 50))
        keep = douglas_peucker(lat, lon, 1e9)
        assert keep[0] and keep[-1] and keep.sum() == 2

    def test_error_bound_holds(self):
        rng = np.random.default_rng(11)
        lat = deg_to_hp(np.cumsum(rng.uniform(-0.002, 0.002, 80)))
        lon = deg_to_hp(np.linspace(0, 0.5, 80))
        tol = 30.0
        keep = douglas_peucker(lat, lon, tol)
        ki = np.flatnonzero(keep)
        # every dropped point is within tol of the simplified chain segment
        for a, b in zip(ki[:-1], ki[1:]):
            mid = slice(a + 1, b)
            if mid.stop > mid.start:
                d = shortest_dist_to_segment(
                    lat[mid], lon[mid], lat[a], lon[a], lat[b], lon[b]
                )
                assert (d <= tol + 1e-6).all()


class TestBatchDP:
    def test_matches_scalar_randomized(self):
        import numpy as np
        from mkgmap_ray.geom.simplify import (
            douglas_peucker,
            douglas_peucker_batch,
        )

        rng = np.random.default_rng(9)
        m, K = 300, 11
        counts = rng.integers(2, K + 1, m)
        lat = rng.integers(0, 1 << 20, (m, K)).astype(np.int64)
        lon = rng.integers(0, 1 << 20, (m, K)).astype(np.int64)
        for allowed in (10.0, 500.0, 20000.0):
            kb = douglas_peucker_batch(lat, lon, counts, allowed)
            for i in range(0, m, 7):
                ks = douglas_peucker(
                    lat[i, : counts[i]], lon[i, : counts[i]], allowed
                )
                assert (kb[i, : counts[i]] == ks).all(), (i, allowed)
            # padding never marked kept
            assert not kb[np.arange(K)[None, :] >= counts[:, None]].any()
