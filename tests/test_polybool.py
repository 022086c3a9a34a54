"""General boolean ops (Martinez sweep) vs closed-form rectangle algebra
and a Monte-Carlo point-membership oracle."""

import numpy as np
import pytest

from mkgmap_ray.geom.polybool import (
    DIFFERENCE, INTERSECTION, UNION, XOR, boolean_op, rings_area2,
)


def rect(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]


def area2(rings):
    return rings_area2(rings)


class TestRectAlgebra:
    def test_overlapping_rects(self):
        a, b = [rect(0, 0, 10, 10)], [rect(5, 5, 15, 15)]
        assert area2(boolean_op(a, b, INTERSECTION)) == pytest.approx(2 * 25)
        assert area2(boolean_op(a, b, UNION)) == pytest.approx(2 * 175)
        assert area2(boolean_op(a, b, DIFFERENCE)) == pytest.approx(2 * 75)
        assert area2(boolean_op(b, a, DIFFERENCE)) == pytest.approx(2 * 75)
        assert area2(boolean_op(a, b, XOR)) == pytest.approx(2 * 150)

    def test_disjoint(self):
        a, b = [rect(0, 0, 4, 4)], [rect(10, 10, 14, 14)]
        assert boolean_op(a, b, INTERSECTION) == []
        assert area2(boolean_op(a, b, UNION)) == pytest.approx(2 * 32)
        assert area2(boolean_op(a, b, DIFFERENCE)) == pytest.approx(2 * 16)

    def test_nested_difference_makes_hole(self):
        outer, inner = [rect(0, 0, 10, 10)], [rect(3, 3, 7, 7)]
        diff = boolean_op(outer, inner, DIFFERENCE)
        assert len(diff) == 2  # outer boundary + hole ring
        assert area2(diff) == pytest.approx(2 * (100 - 16))
        # intersection of nested = inner
        assert area2(boolean_op(outer, inner, INTERSECTION)) == (
            pytest.approx(2 * 16)
        )
        assert area2(boolean_op(outer, inner, UNION)) == pytest.approx(200)

    def test_shared_edge_union(self):
        a, b = [rect(0, 0, 5, 10)], [rect(5, 0, 10, 10)]
        u = boolean_op(a, b, UNION)
        assert area2(u) == pytest.approx(2 * 100)
        # the shared edge must vanish: one 4-corner ring
        assert len(u) == 1
        assert len(u[0]) == 4
        assert area2(boolean_op(a, b, INTERSECTION)) == pytest.approx(0)

    def test_identical(self):
        a = [rect(0, 0, 6, 6)]
        assert area2(boolean_op(a, a, UNION)) == pytest.approx(72)
        assert area2(boolean_op(a, a, INTERSECTION)) == pytest.approx(72)
        assert boolean_op(a, a, DIFFERENCE) == []
        assert boolean_op(a, a, XOR) == []

    def test_empty_operands(self):
        a = [rect(0, 0, 2, 2)]
        assert boolean_op([], a, UNION) and boolean_op(a, [], UNION)
        assert boolean_op([], a, INTERSECTION) == []
        assert boolean_op(a, [], DIFFERENCE)
        assert boolean_op([], a, DIFFERENCE) == []

    def test_concave_subject(self):
        # L-shape minus a square cutting the notch corner
        L = [[(0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10)]]
        sq = [rect(2, 2, 6, 6)]
        # L area = 100 - 36 = 64; overlap of sq with L:
        # sq = [2,6]x[2,6]; inside L = sq minus part with x>4 and y>4
        # = 16 - 4 = 12
        assert area2(boolean_op(L, sq, INTERSECTION)) == pytest.approx(24)
        assert area2(boolean_op(L, sq, DIFFERENCE)) == pytest.approx(
            2 * (64 - 12)
        )
        assert area2(boolean_op(L, sq, UNION)) == pytest.approx(
            2 * (64 + 16 - 12)
        )


def _convex(rng, cx, cy, r, n):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    return [
        (cx + r * np.cos(a), cy + r * np.sin(a)) for a in ang
    ]


def _member(rings, px, py):
    """Even-odd membership of (px,py) in a ring set."""
    cnt = 0
    for r in rings:
        a = np.asarray(r, np.float64)
        x, y = a[:, 0], a[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        cross = (y > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x + (py - y) * (x2 - x) / np.where(y2 == y, 1, y2 - y)
        cnt += int(np.count_nonzero(cross & (px < xi)))
    return cnt % 2 == 1


class TestMonteCarlo:
    @pytest.mark.parametrize("seed", range(8))
    def test_random_convex_pairs(self, seed):
        rng = np.random.default_rng(seed)
        a = [_convex(rng, 0, 0, 10, 7)]
        b = [_convex(rng, rng.uniform(-6, 6), rng.uniform(-6, 6), 8, 6)]
        results = {
            op: boolean_op(a, b, op)
            for op in (UNION, INTERSECTION, DIFFERENCE, XOR)
        }
        pts = rng.uniform(-20, 20, size=(300, 2))
        for px, py in pts:
            ina, inb = _member(a, px, py), _member(b, px, py)
            want = {
                UNION: ina or inb,
                INTERSECTION: ina and inb,
                DIFFERENCE: ina and not inb,
                XOR: ina != inb,
            }
            for op, rings in results.items():
                got = _member(rings, px, py)
                if got != want[op]:
                    # tolerate boundary-adjacent samples only
                    d = _min_edge_dist(a + b, px, py)
                    assert d < 1e-6, (
                        f"seed={seed} op={op} point=({px},{py}) "
                        f"got={got} want={want[op]}"
                    )


def _min_edge_dist(rings, px, py):
    best = np.inf
    for r in rings:
        a = np.asarray(r, np.float64)
        b = np.roll(a, -1, axis=0)
        d = b - a
        t = np.clip(
            ((px - a[:, 0]) * d[:, 0] + (py - a[:, 1]) * d[:, 1])
            / np.maximum((d * d).sum(1), 1e-300),
            0, 1,
        )
        proj = a + t[:, None] * d
        dist = np.hypot(proj[:, 0] - px, proj[:, 1] - py)
        best = min(best, float(dist.min()))
    return best
