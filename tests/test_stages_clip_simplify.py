"""Clip + simplify stages against brute-force expectations (local batches,
then the Ray path in the pipeline test)."""

import numpy as np
import pyarrow as pa

from mkgmap_ray.geom.clip import clip_polyline, sutherland_hodgman
from mkgmap_ray.geom.coords import DELTA_SHIFT
from mkgmap_ray.stages.clipstage import _clip_batch_to_rects
from mkgmap_ray.stages.simplifystage import SimplifyLevel


def mk_batch(rows):
    return pa.table(
        {
            "feature_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.int8()),
            "lat_hp": pa.array([r[2] for r in rows], pa.list_(pa.int32())),
            "lon_hp": pa.array([r[3] for r in rows], pa.list_(pa.int32())),
        }
    )


RECT = np.asarray([0, 0, 100_000, 100_000], dtype=np.int64)


class TestClipBatch:
    def test_mixed_batch(self):
        rows = [
            (1, 0, [500], [500]),  # point inside
            (2, 0, [-500], [500]),  # point outside → dropped
            (3, 1, [50_000, 50_000], [-50_000, 150_000]),  # line across
            (4, 1, [200_000, 300_000], [200_000, 300_000]),  # line outside
            (5, 2, [50_000, 150_000, 150_000, 50_000],
                   [50_000, 50_000, 150_000, 150_000]),  # shape corner overlap
        ]
        batch = mk_batch(rows)
        rects = np.broadcast_to(RECT, (batch.num_rows, 4))
        out = _clip_batch_to_rects(batch, rects)
        ids = out["feature_id"].to_pylist()
        assert ids == [1, 3, 5]
        # line clipped to box edges
        i3 = ids.index(3)
        assert out["lon_hp"][i3].as_py() == [0, 100_000]
        # shape clipped to the quarter square
        i5 = ids.index(5)
        la = out["lat_hp"][i5].as_py()
        lo = out["lon_hp"][i5].as_py()
        assert set(zip(la, lo)) == {
            (50_000, 50_000),
            (50_000, 100_000),
            (100_000, 100_000),
            (100_000, 50_000),
        }

    def test_matches_kernel_per_feature(self):
        rng = np.random.default_rng(8)
        rows = []
        for i in range(60):
            n = int(rng.integers(2, 20))
            la = rng.integers(-50_000, 150_000, n).tolist()
            lo = rng.integers(-50_000, 150_000, n).tolist()
            rows.append((i, 1, la, lo))
        batch = mk_batch(rows)
        out = _clip_batch_to_rects(
            batch, np.broadcast_to(RECT, (batch.num_rows, 4))
        )
        # group output rows by feature id and compare with clip_polyline
        got = {}
        for j in range(out.num_rows):
            fid = out["feature_id"][j].as_py()
            got.setdefault(fid, []).append(
                (out["lat_hp"][j].as_py(), out["lon_hp"][j].as_py())
            )
        for i, (_, _, la, lo) in enumerate(rows):
            exp = clip_polyline(
                np.asarray(la), np.asarray(lo), tuple(RECT.tolist())
            )
            exp_lists = [(a.tolist(), b.tolist()) for a, b in exp]
            assert got.get(i, []) == exp_lists, i


class TestSimplifyLevel:
    def test_res24_only_rounds(self):
        # at resolution 24 (shift 0) rounding snaps to 64-hp grid, no DP
        lv = SimplifyLevel(24)
        batch = mk_batch([(1, 1, [0, 130, 1000], [0, 130, 1000])])
        out = lv(batch)
        assert out["lat_hp"][0].as_py() == [0, 128, 1024]

    def test_lower_res_simplifies_collinear(self):
        lv = SimplifyLevel(20)
        la = (np.arange(10) * 4096).tolist()  # straight line
        lo = (np.arange(10) * 4096).tolist()
        out = lv(mk_batch([(1, 1, [v << DELTA_SHIFT for v in la],
                            [v << DELTA_SHIFT for v in lo])]))
        assert len(out["lat_hp"][0].as_py()) == 2

    def test_small_feature_dropped_at_low_res(self):
        lv = SimplifyLevel(16)  # shift 8 → min size 256 mu
        la = [(100 + d) << DELTA_SHIFT for d in (0, 10, 10, 0)]
        lo = [(100 + d) << DELTA_SHIFT for d in (0, 0, 10, 10)]
        out = lv(mk_batch([(1, 2, la, lo)]))
        assert out.num_rows == 0

    def test_long_line_split(self):
        lv = SimplifyLevel(24)
        n = 600
        rng = np.random.default_rng(1)
        la = (np.cumsum(rng.integers(1, 3, n)) << DELTA_SHIFT).tolist()
        lo = (np.cumsum(rng.integers(1, 3, n)) << DELTA_SHIFT).tolist()
        out = lv(mk_batch([(1, 1, la, lo)]))
        assert out.num_rows >= 2
        parts = out["simplify_part"].to_pylist()
        assert parts == list(range(len(parts)))
        for j in range(out.num_rows):
            assert len(out["lat_hp"][j].as_py()) <= 250

    def test_points_pass_through(self):
        lv = SimplifyLevel(16)
        out = lv(mk_batch([(1, 0, [64000], [64000])]))
        assert out.num_rows == 1
