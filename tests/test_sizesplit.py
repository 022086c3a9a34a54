"""Size-driven splitters + smoothing + line preparer."""

import numpy as np

from mkgmap_ray.geom.sizesplit import (
    bits_needed,
    line_preparer,
    line_size_split,
    polygon_split_filter,
    polygon_split_half,
    polygon_subdiv_size_split,
    smoothing_filter,
)


class TestLineSizeSplit:
    def test_small_line_untouched(self):
        la = np.asarray([0, 100])
        lo = np.asarray([0, 200])
        out = line_size_split(la, lo, shift=0)
        assert len(out) == 1
        np.testing.assert_array_equal(out[0][0], la)

    def test_exact_power_of_two_chunks(self):
        # one horizontal segment of length limit << k splits into 2^k
        # 2-point chunks (limit = maxSize-10 at shift 0)
        limit = 0x8000 - 10
        for k in (1, 2, 3):
            L = limit << k
            out = line_size_split(
                np.asarray([0, 0]), np.asarray([0, L]), shift=0
            )
            assert len(out) == 1 << k, k
            assert all(len(c[0]) == 2 for c in out)
            # chunks chain: each starts where the previous ended
            for a, b in zip(out, out[1:]):
                assert a[1][-1] == b[1][0]
            assert out[0][1][0] == 0 and out[-1][1][-1] == L

    def test_shift_scales_limit(self):
        # at shift 4 the limit is 0x7fff << 4; a line below it passes
        L = (0x7FFF << 4) - 1
        out = line_size_split(np.asarray([0, 0]), np.asarray([0, L]), 4)
        assert len(out) == 1


def square_ring(side, y0=0, x0=0):
    return (
        np.asarray([y0, y0, y0 + side, y0 + side]),
        np.asarray([x0, x0 + side, x0 + side, x0]),
    )


class TestPolygonSplit:
    def test_half_split_preserves_area(self):
        from mkgmap_ray.geom.polyfilters import signed_area2

        la, lo = square_ring(1000)
        parts = polygon_split_half(la, lo, shift=0)
        assert len(parts) == 2
        total = sum(abs(signed_area2(*p)) for p in parts)
        assert total == abs(signed_area2(la, lo))

    def test_point_limit_recursion(self):
        # square ring with 300 boundary points must split below 250
        t = np.linspace(0, 1, 76)[:-1]
        side = 3000
        la = np.concatenate([0 * t, t * side, side + 0 * t, side - t * side])
        lo = np.concatenate([t * side, side + 0 * t, side - t * side, 0 * t])
        la = np.round(la).astype(np.int64)
        lo = np.round(lo).astype(np.int64)
        out = polygon_split_filter(la, lo, shift=0)
        assert len(out) >= 2
        assert all(len(p[0]) < 250 for p in out)

    def test_subdiv_size_split_counts(self):
        from mkgmap_ray.geom.polyfilters import signed_area2

        for k, expect in ((0, 1), (1, 4), (2, 16)):
            side = 0xFFFF << k
            la, lo = square_ring(side)
            out = polygon_subdiv_size_split(la, lo, shift=0)
            assert len(out) == expect, k
            total = sum(abs(signed_area2(*p)) for p in out)
            assert total == abs(signed_area2(la, lo))


class TestSmoothing:
    def test_passthrough_at_full_detail_or_short(self):
        la = np.arange(10)
        lo = np.arange(10)
        out = smoothing_filter(la, lo, shift=0)
        np.testing.assert_array_equal(out[0], la)
        out = smoothing_filter(la[:5], lo[:5], shift=4)
        np.testing.assert_array_equal(out[0], la[:5])

    def test_decimates_dense_line(self):
        la = np.arange(0, 200, 2)
        lo = np.zeros(100, np.int64)
        out_la, out_lo = smoothing_filter(la, lo, shift=4)
        assert len(out_la) < len(la)
        assert out_la[0] == la[0] and out_la[-1] == la[-1]

    def test_matches_reference_loop_by_hand(self):
        # stepsize = 5<<1 = 10; deltas of 6: groups of 2 (step 6 then 18>10)
        la = np.asarray([0, 6, 12, 18, 24, 30, 36])
        lo = np.zeros(7, np.int64)
        out_la, _ = smoothing_filter(la, lo, shift=1)
        # first group: add 6 (step 6), add 12 (step 18>10) → avg (6+12)/2=9,
        # re-feed 12 from start 9 → step 3; add 18 → step 12>10 → avg 15 ...
        assert out_la[0] == 0
        assert out_la[1] == 9


class TestLinePreparer:
    def test_bits_needed(self):
        assert bits_needed(0) == 0
        assert bits_needed(1) == 1
        assert bits_needed(-1) == 1
        assert bits_needed(7) == 3
        assert bits_needed(8) == 4

    def test_rejects_degenerate(self):
        # at shift 4 these two points collapse to one
        assert line_preparer(
            np.asarray([0, 7]), np.asarray([0, 7]), 4, is_shape=False
        ) is None
        assert line_preparer(
            np.asarray([0, 100]), np.asarray([0, 100]), 0, is_shape=False
        ) is not None

    def test_no_rotation_when_two_equal_max_deltas(self):
        # rectangle: both long edges need the same bits → no gain, no move
        la = np.asarray([0, 0, 10, 10, 0])
        lo = np.asarray([0, 1000, 1000, 0, 0])
        rla, rlo = line_preparer(la, lo, 0, is_shape=True)
        np.testing.assert_array_equal(rla, la)
        np.testing.assert_array_equal(rlo, lo)

    def test_shape_rotation_removes_largest_delta(self):
        # unique largest lon delta (960, 10 bits vs 9): rotation makes it
        # the implicit closing edge so it is never encoded
        la = np.asarray([0, 0, 500, 500, 0])
        lo = np.asarray([0, 960, 460, -40, 0])
        out = line_preparer(la, lo, 0, is_shape=True)
        assert out is not None
        rla, rlo = out
        # still closed, same vertex multiset
        assert rla[0] == rla[-1] and rlo[0] == rlo[-1]
        assert sorted(zip(rla[:-1], rlo[:-1])) == sorted(
            zip(la[:-1], lo[:-1])
        )
        # start moved to the end of the 960 edge; the 960 delta is the
        # wrap-around (last) segment now
        assert (rla[0], rlo[0]) == (0, 960)
        d = np.abs(np.diff(rlo))
        assert d[-1] == 960 and (d[:-1] < 960).all()
