"""Line merging + ring assembly vs brute-force expectations."""

import numpy as np

from mkgmap_ray.stages.merge import join_ways, merge_lines, merge_roads


def segs_of(points, scramble_rng=None, reverse_mask=None):
    """Split a polyline (list of (y,x)) into 2-point segments."""
    out = []
    for i in range(len(points) - 1):
        (y0, x0), (y1, x1) = points[i], points[i + 1]
        out.append((np.asarray([y0, y1]), np.asarray([x0, x1])))
    if reverse_mask is not None:
        out = [
            (la[::-1], lo[::-1]) if rev else (la, lo)
            for (la, lo), rev in zip(out, reverse_mask)
        ]
    if scramble_rng is not None:
        idx = scramble_rng.permutation(len(out))
        out = [out[i] for i in idx]
    return out


class TestMergeLines:
    def test_chain_collapses(self):
        pts = [(0, i) for i in range(6)]
        merged = merge_lines(segs_of(pts))
        assert len(merged) == 1
        assert merged[0][1].tolist() == [0, 1, 2, 3, 4, 5]

    def test_scrambled_chains_merge_per_chain(self):
        rng = np.random.default_rng(7)
        lines = []
        for c in range(20):
            pts = [(c, c * 100 + i) for i in range(rng.integers(2, 8))]
            lines.extend(segs_of(pts, scramble_rng=rng))
        merged = merge_lines(lines)
        assert len(merged) == 20
        total_pts = sum(len(la) for la, _ in merged)
        # each chain ends with all its original points exactly once
        assert total_pts == sum(
            len({(int(a), int(b)) for a, b in zip(la, lo)})
            for la, lo in merged
        )

    def test_unmergeable_roads_pass_through(self):
        pts = [(0, 0), (0, 1), (0, 2)]
        segs = segs_of(pts)
        merged = merge_lines(segs, mergeable=[False, False])
        assert len(merged) == 2

    def test_disjoint_stay_separate(self):
        merged = merge_lines(
            [
                (np.asarray([0, 0]), np.asarray([0, 1])),
                (np.asarray([5, 5]), np.asarray([7, 9])),
            ]
        )
        assert len(merged) == 2


class TestJoinWays:
    def test_triangle_closes(self):
        edges = [
            (np.asarray([0, 1]), np.asarray([0, 5])),
            (np.asarray([1, 2]), np.asarray([5, 3])),
            (np.asarray([2, 0]), np.asarray([3, 0])),
        ]
        rings = join_ways(edges)
        assert len(rings) == 1
        la, lo, closed = rings[0]
        assert closed
        assert (la[0], lo[0]) == (la[-1], lo[-1])
        assert len(la) == 4

    def test_reversed_edges_still_close(self):
        edges = [
            (np.asarray([0, 1]), np.asarray([0, 5])),
            (np.asarray([2, 1]), np.asarray([3, 5])),  # reversed
            (np.asarray([2, 0]), np.asarray([3, 0])),
        ]
        rings = join_ways(edges)
        assert len(rings) == 1 and rings[0][2]

    def test_two_rings_and_open_chain(self):
        rng = np.random.default_rng(3)
        ways = []
        for c in (1, 2):  # two disjoint squares
            pts = [(c, 0), (c, 1), (c + 10, 1), (c + 10, 0), (c, 0)]
            ways.extend(segs_of(pts, scramble_rng=rng))
        ways.append((np.asarray([99, 99]), np.asarray([0, 7])))  # open
        out = join_ways(ways)
        closed = [r for r in out if r[2]]
        open_ = [r for r in out if not r[2]]
        assert len(closed) == 2 and len(open_) == 1
        assert all(len(r[0]) == 5 for r in closed)

    def test_randomized_rings_roundtrip(self):
        rng = np.random.default_rng(11)
        for trial in range(10):
            nv = int(rng.integers(3, 9))
            ys = rng.permutation(1000)[:nv]
            xs = rng.permutation(1000)[:nv] + 2000
            pts = list(zip(ys.tolist(), xs.tolist())) + [(ys[0], xs[0])]
            rev = rng.integers(0, 2, nv).astype(bool)
            ways = segs_of(pts, scramble_rng=rng, reverse_mask=rev)
            rings = join_ways(ways)
            assert len(rings) == 1, trial
            la, lo, closed = rings[0]
            assert closed and len(la) == nv + 1
            assert {(int(a), int(b)) for a, b in zip(la, lo)} == set(
                zip(ys.tolist(), xs.tolist())
            )


class TestRoadMerger:
    def test_collinear_merges(self):
        r = [
            (np.asarray([0, 0]), np.asarray([0, 10]), "a"),
            (np.asarray([0, 0]), np.asarray([10, 20]), "a"),
        ]
        out = merge_roads(r)
        assert len(out) == 1
        assert out[0][1].tolist() == [0, 10, 20]

    def test_sharp_angle_blocks(self):
        r = [
            (np.asarray([0, 0]), np.asarray([0, 1000]), "a"),
            (np.asarray([0, 5]), np.asarray([1000, 20]), "a"),
        ]
        assert len(merge_roads(r)) == 2

    def test_attrs_must_match(self):
        r = [
            (np.asarray([0, 0]), np.asarray([0, 10]), "a"),
            (np.asarray([0, 0]), np.asarray([10, 20]), "b"),
        ]
        assert len(merge_roads(r)) == 2

    def test_restriction_blocks(self):
        r = [
            (np.asarray([0, 0]), np.asarray([0, 10]), "a"),
            (np.asarray([0, 0]), np.asarray([10, 20]), "a"),
        ]
        assert len(merge_roads(r, restricted={(0, 10)})) == 2

    def test_best_angle_wins(self):
        r = [
            (np.asarray([0, 0]), np.asarray([0, 1000]), "a"),
            (np.asarray([0, 0]), np.asarray([1000, 2000]), "a"),
            (np.asarray([0, 800]), np.asarray([1000, 1800]), "a"),
        ]
        out = merge_roads(r)
        assert len(out) == 2
        assert out[0][1].tolist() == [0, 1000, 2000]  # straight continuation

    def test_no_closed_way(self):
        # two roads that would close into a loop must not merge
        r = [
            (np.asarray([0, 0]), np.asarray([0, 1000]), "a"),
            (np.asarray([0, 0]), np.asarray([1000, 0]), "a"),
        ]
        out = merge_roads(r)
        assert len(out) == 2

    def test_long_chain_linear_time(self):
        n = 500
        r = [(np.asarray([0, 0]), np.asarray([i * 10, (i + 1) * 10]), "a")
             for i in range(n)]
        out = merge_roads(r)
        assert len(out) == 1
        assert len(out[0][0]) == n + 1


class TestShapeMerge:
    def test_adjacent_squares_splice(self):
        import numpy as np

        from mkgmap_ray.geom.polyfilters import signed_area2
        from mkgmap_ray.stages.merge import merge_shapes

        def square(y0, x0, s):
            return (np.asarray([y0, y0, y0 + s, y0 + s]),
                    np.asarray([x0, x0 + s, x0 + s, x0]))

        out = merge_shapes([square(0, 0, 4), square(0, 4, 4), square(0, 20, 4)])
        assert len(out) == 2
        areas = sorted(abs(signed_area2(*r)) for r in out)
        assert areas == [32, 64]  # 2*s^2 and 2*(2s*s)

    def test_three_in_a_row_chain(self):
        import numpy as np

        from mkgmap_ray.geom.polyfilters import signed_area2
        from mkgmap_ray.stages.merge import merge_shapes

        def square(y0, x0, s):
            return (np.asarray([y0, y0, y0 + s, y0 + s]),
                    np.asarray([x0, x0 + s, x0 + s, x0]))

        out = merge_shapes([square(0, 0, 2), square(0, 2, 2), square(0, 4, 2)])
        assert len(out) == 1
        assert abs(signed_area2(*out[0])) == 2 * 6 * 2

    def test_no_shared_edge_untouched(self):
        import numpy as np

        from mkgmap_ray.stages.merge import merge_shapes

        a = (np.asarray([0, 0, 1]), np.asarray([0, 1, 0]))
        b = (np.asarray([5, 5, 6]), np.asarray([5, 6, 5]))
        out = merge_shapes([a, b])
        assert len(out) == 2


class TestCutHoles:
    def test_area_and_vertices(self):
        import numpy as np

        from mkgmap_ray.geom.mpoly import cut_holes
        from mkgmap_ray.geom.polyfilters import signed_area2

        def square(y0, x0, s):
            return (np.asarray([y0, y0, y0 + s, y0 + s]),
                    np.asarray([x0, x0 + s, x0 + s, x0]))

        outer = square(0, 0, 12)
        la, lo = cut_holes(outer, [square(2, 2, 2), square(8, 8, 2)])
        assert len(la) == 4 + 6 + 6
        assert abs(signed_area2(la, lo)) == 2 * 144 - 2 * 4 - 2 * 4

    def test_hole_orientation_normalized(self):
        import numpy as np

        from mkgmap_ray.geom.mpoly import cut_holes
        from mkgmap_ray.geom.polyfilters import signed_area2

        def square(y0, x0, s, cw=False):
            la = np.asarray([y0, y0, y0 + s, y0 + s])
            lo = np.asarray([x0, x0 + s, x0 + s, x0])
            return (la[::-1], lo[::-1]) if cw else (la, lo)

        outer = square(0, 0, 10)
        for cw in (False, True):  # either input orientation subtracts
            la, lo = cut_holes(outer, [square(3, 3, 2, cw=cw)])
            assert abs(signed_area2(la, lo)) == 2 * 100 - 2 * 4


class TestCoastline:
    def _ring(self, cs):
        import numpy as np

        return [
            (np.asarray([cs[e][0], cs[(e + 1) % len(cs)][0]]),
             np.asarray([cs[e][1], cs[(e + 1) % len(cs)][1]]))
            for e in range(len(cs))
        ]

    def test_island_lake_orientation(self):
        from mkgmap_ray.geom.area import Area
        from mkgmap_ray.stages.coastline import assemble_coastline

        ccw = self._ring([(0, 0), (0, 4), (4, 4), (4, 0)])
        cw = self._ring([(10, 10), (14, 10), (14, 14), (10, 14)])
        res = assemble_coastline(ccw + cw, Area(0, 0, 100, 100))
        assert len(res["islands"]) == 1
        assert len(res["lakes"]) == 1
        assert res["land_area2"] == 2 * 16 - 2 * 16

    def test_border_closure_walks_ccw(self):
        import numpy as np

        from mkgmap_ray.geom.area import Area
        from mkgmap_ray.stages.coastline import assemble_coastline

        # straight west->east shoreline at mid height: land = north half
        T = 64
        segs = [(np.asarray([T // 2, T // 2]), np.asarray([0, T]))]
        res = assemble_coastline(segs, Area(0, 0, T, T))
        assert len(res["land_polys"]) == 1
        la, lo = res["land_polys"][0]
        assert len(la) == 4  # 2 shoreline + 2 corners
        assert res["land_area2"] == 2 * (T * T // 2)

    def test_incomplete_chain_reported(self):
        import numpy as np

        from mkgmap_ray.geom.area import Area
        from mkgmap_ray.stages.coastline import assemble_coastline

        segs = [(np.asarray([10, 20]), np.asarray([10, 20]))]  # off-border
        res = assemble_coastline(segs, Area(0, 0, 100, 100))
        assert res["n_incomplete"] == 1
        assert not res["land_polys"]

    def test_directed_join_no_reversal(self):
        import numpy as np

        from mkgmap_ray.geom.area import Area
        from mkgmap_ray.stages.coastline import assemble_coastline

        # two segments that only connect end->start (correct direction)
        a = (np.asarray([0, 5]), np.asarray([0, 5]))
        b = (np.asarray([5, 0]), np.asarray([5, 0]))  # closes the loop
        res = assemble_coastline([a, b], Area(0, 0, 100, 100))
        # degenerate 2-point "ring" → zero area, classified cw (lake)
        assert res["n_incomplete"] == 0
