"""Border routing-node check vs a brute-force scalar oracle."""

import numpy as np
import pyarrow as pa

from mkgmap_ray.stages.borders import (
    BorderNodeCheck, BorderSegmentIndex, segment_intersections,
    split_boundary,
)


def brute_pairs(ry1, rx1, ry2, rx2, borders):
    """All (road, border-seg) bbox-overlap pairs, scalar."""
    segs = []
    for la, lo in borders:
        for i in range(len(la) - 1):
            segs.append((la[i], lo[i], la[i + 1], lo[i + 1]))
    out = []
    for r in range(len(ry1)):
        for b, (y1, x1, y2, x2) in enumerate(segs):
            out.append((r, b))
    return out, segs


class TestSplitBoundary:
    def test_chunks_share_vertex(self):
        la = np.arange(50)
        lo = np.arange(50) * 2
        chunks = split_boundary(la, lo, max_pts=20)
        assert [len(c[0]) for c in chunks] == [20, 20, 12]
        # consecutive chunks share their boundary vertex
        assert chunks[0][0][-1] == chunks[1][0][0]
        assert chunks[1][0][-1] == chunks[2][0][0]
        # no segment lost: total segments = 49
        assert sum(len(c[0]) - 1 for c in chunks) == 49


class TestIntersections:
    def test_crossing_and_touching(self):
        # road (0,0)->(0,10) horizontal at y=0 vs vertical border x=5
        m, iy, ix = segment_intersections(
            np.array([0]), np.array([0]), np.array([0]), np.array([10]),
            np.array([-5]), np.array([5]), np.array([5]), np.array([5]),
        )
        assert m[0] and iy[0] == 0 and ix[0] == 5
        # endpoint touch counts
        m, _, ix = segment_intersections(
            np.array([0]), np.array([0]), np.array([0]), np.array([5]),
            np.array([-5]), np.array([5]), np.array([5]), np.array([5]),
        )
        assert m[0] and ix[0] == 5
        # disjoint
        m, _, _ = segment_intersections(
            np.array([0]), np.array([0]), np.array([0]), np.array([4]),
            np.array([-5]), np.array([5]), np.array([5]), np.array([5]),
        )
        assert not m[0]
        # parallel / collinear -> no intersection reported
        m, _, _ = segment_intersections(
            np.array([0]), np.array([0]), np.array([0]), np.array([4]),
            np.array([0]), np.array([2]), np.array([0]), np.array([8]),
        )
        assert not m[0]


class TestGridIndex:
    def test_candidates_superset_of_crossings(self):
        rng = np.random.default_rng(7)
        borders = [
            (rng.integers(0, 1 << 16, 8), rng.integers(0, 1 << 16, 8))
            for _ in range(5)
        ]
        idx = BorderSegmentIndex(borders, cell_shift=12)
        ry1 = rng.integers(0, 1 << 16, 40)
        rx1 = rng.integers(0, 1 << 16, 40)
        ry2 = ry1 + rng.integers(-5000, 5000, 40)
        rx2 = rx1 + rng.integers(-5000, 5000, 40)
        pr, pb = idx.candidate_pairs(ry1, rx1, ry2, rx2)
        got = set(zip(pr.tolist(), pb.tolist()))
        # every TRUE intersection must be among candidates
        allp, segs = brute_pairs(ry1, rx1, ry2, rx2, borders)
        ar = np.array([p[0] for p in allp])
        ab = np.array([p[1] for p in allp])
        sy1 = np.array([segs[b][0] for b in ab])
        sx1 = np.array([segs[b][1] for b in ab])
        sy2 = np.array([segs[b][2] for b in ab])
        sx2 = np.array([segs[b][3] for b in ab])
        m, _, _ = segment_intersections(
            ry1[ar], rx1[ar], ry2[ar], rx2[ar], sy1, sx1, sy2, sx2
        )
        for r, b in zip(ar[m].tolist(), ab[m].tolist()):
            assert (r, b) in got


class TestBorderNodeCheck:
    def test_snap_vs_new(self, ray_session):
        import ray
        import ray.data

        # vertical border at x=50, y in [0, 100]
        borders = [(np.array([0, 100]), np.array([50, 50]))]
        ref = ray.put(borders)
        roads = pa.table(
            {
                "way_id": pa.array([1, 2, 3, 4], pa.int64()),
                "y1": pa.array([10, 20, 30, 40], pa.int64()),
                "x1": pa.array([40, 50, 0, 60], pa.int64()),
                "y2": pa.array([10, 20, 30, 40], pa.int64()),
                "x2": pa.array([60, 70, 30, 90], pa.int64()),
            }
        )
        out = (
            ray.data.from_arrow(roads)
            .map_batches(
                BorderNodeCheck,
                fn_constructor_kwargs=dict(borders_ref=ref),
                batch_format="pyarrow",
                concurrency=1,
            )
            .to_pandas()
            .sort_values("way_id")
        )
        # way 1: crosses mid-segment -> new node at x=50
        # way 2: starts exactly on the border -> snap
        # way 3: never reaches x=50 -> nothing
        # way 4: entirely past the border -> nothing
        assert out["n_cross"].tolist() == [1, 1, 0, 0]
        assert out["n_snap"].tolist() == [0, 1, 0, 0]
        assert out["n_new"].tolist() == [1, 0, 0, 0]
        assert out["sum_ix"].tolist() == [50, 50, 0, 0]
