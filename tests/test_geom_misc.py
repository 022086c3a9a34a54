import numpy as np
import pytest

from mkgmap_ray.geom.area import Area, round_pof2
from mkgmap_ray.geom.coords import (
    DELTA_SHIFT,
    deg_to_hp,
    deg_to_mu,
    hp_to_mu,
    mu_to_hp,
)
from mkgmap_ray.geom.pip import point_in_polygon, points_in_polygon, points_in_rings
from mkgmap_ray.geom.polyfilters import (
    remove_obsolete_points,
    round_coords,
    signed_area2,
    split_long_line,
)


class TestCoords:
    def test_roundtrip_mu_hp(self):
        mu = np.array([-100000, 0, 12345, 1 << 23])
        assert (hp_to_mu(mu_to_hp(mu)) == mu).all()

    def test_deg_to_mu_known(self):
        # 180 deg = 2^23 map units
        assert int(deg_to_mu(180.0)) == 1 << 23
        assert int(deg_to_hp(180.0)) == 1 << 29

    def test_rounding_half_away(self):
        # 360/2^24 deg per unit; half a unit rounds away from zero
        half_unit_deg = 360.0 / (1 << 24) / 2
        assert int(deg_to_mu(half_unit_deg)) == 1
        assert int(deg_to_mu(-half_unit_deg)) == -1


class TestArea:
    def test_round_pof2(self):
        assert round_pof2(100, 4) == 96
        assert round_pof2(104, 4) == 112
        assert round_pof2(100, 0) == 100

    def test_split_2x1_aligned(self):
        a = Area(0, 0, 1000, 2000)
        parts = a.split(2, 1, 4)
        assert len(parts) == 2
        assert parts[0].min_lon == 0 and parts[1].max_lon == 2000
        assert parts[0].max_lon == parts[1].min_lon
        assert parts[0].max_lon % 16 == 0

    def test_split_fails_when_too_small(self):
        a = Area(0, 0, 10, 10)
        assert a.split(2, 1, 4) is None  # rounds to an empty half

    def test_contains_hp_inclusive(self):
        a = Area(0, 0, 100, 100)
        assert a.contains_hp(100 << DELTA_SHIFT, 100 << DELTA_SHIFT)
        assert not a.contains_hp((100 << DELTA_SHIFT) + 1, 0)


class TestPIP:
    SQ_LAT = np.array([0, 0, 100, 100])
    SQ_LON = np.array([0, 100, 100, 0])

    def test_inside_outside(self):
        assert point_in_polygon(50, 50, self.SQ_LAT, self.SQ_LON)
        assert not point_in_polygon(150, 50, self.SQ_LAT, self.SQ_LON)

    def test_on_edge_inside(self):
        assert point_in_polygon(0, 50, self.SQ_LAT, self.SQ_LON)
        assert point_in_polygon(100, 100, self.SQ_LAT, self.SQ_LON)

    def test_concave(self):
        # U-shape: notch at the top middle
        lat = np.array([0, 0, 100, 100, 10, 10, 100, 100])
        lon = np.array([0, 100, 100, 60, 60, 40, 40, 0])
        assert point_in_polygon(5, 50, lat, lon)  # in the base
        assert not point_in_polygon(50, 50, lat, lon)  # in the notch
        assert point_in_polygon(50, 20, lat, lon)  # left arm

    def test_holes_even_odd(self):
        outer = (np.array([0, 0, 100, 100]), np.array([0, 100, 100, 0]))
        hole = (np.array([40, 40, 60, 60]), np.array([40, 60, 60, 40]))
        res = points_in_rings(
            np.array([50, 20, 150]), np.array([50, 20, 50]), [outer, hole]
        )
        assert res.tolist() == [False, True, False]

    def test_vectorized_matches_scalar(self):
        rng = np.random.default_rng(5)
        lat = rng.integers(-20, 120, 200)
        lon = rng.integers(-20, 120, 200)
        vec = points_in_polygon(lat, lon, self.SQ_LAT, self.SQ_LON)
        for i in range(200):
            exp = (0 <= lat[i] <= 100) and (0 <= lon[i] <= 100)
            assert vec[i] == exp


class TestPolyFilters:
    def test_round_coords_grid(self):
        lat, lon = round_coords([1000, 1031, 1033], [0, -31, -33], shift=0)
        # grid = 2^6 = 64 hp units at resolution 24
        assert lat.tolist() == [1024, 1024, 1024]
        assert lon.tolist() == [0, 0, -64]  # -31 is nearer 0; -33 nearer -64

    def test_remove_collinear(self):
        lat = np.array([0, 0, 0, 50])
        lon = np.array([0, 50, 100, 100])
        keep = remove_obsolete_points(lat, lon)
        assert keep.tolist() == [True, False, True, True]

    def test_remove_duplicates(self):
        keep = remove_obsolete_points(np.array([0, 0, 10]), np.array([0, 0, 10]))
        assert keep.tolist() == [True, False, True]

    def test_split_long_line_limits(self):
        for n in (251, 400, 500, 1000, 10_000):
            ranges = split_long_line(n)
            assert ranges[0][0] == 0 and ranges[-1][1] == n
            for (s0, e0), (s1, e1) in zip(ranges[:-1], ranges[1:]):
                assert e0 - 1 == s1  # share boundary point
            for s, e in ranges:
                assert 2 <= e - s <= 250
                assert e - s >= 125 or len(ranges) == 1

    def test_signed_area(self):
        # CCW square in (x=lon, y=lat) plane
        lat = np.array([0, 0, 10, 10])
        lon = np.array([0, 10, 10, 0])
        assert signed_area2(lat, lon) == 200
        assert signed_area2(lat[::-1], lon[::-1]) == -200


class TestMultipolygon:
    def test_classification_nested(self):
        import numpy as np
        from mkgmap_ray.geom.mpoly import classify_rings, net_area2

        def sq(cy, cx, s):
            return (np.asarray([cy - s, cy - s, cy + s, cy + s]),
                    np.asarray([cx - s, cx + s, cx + s, cx - s]))

        rings = [sq(0, 0, 100), sq(0, 0, 50), sq(0, 0, 20), sq(500, 500, 10)]
        cls = classify_rings(rings)
        assert [c["role"] for c in cls] == ["outer", "inner", "outer", "outer"]
        assert [c["depth"] for c in cls] == [0, 1, 2, 0]
        assert cls[1]["parent"] == 0
        assert cls[2]["parent"] == 1
        assert cls[3]["parent"] == -1
        # net area: 200^2 - 100^2 + 40^2 + 20^2 (doubled)
        assert net_area2(rings) == 2 * (200**2 - 100**2 + 40**2 + 20**2)

    def test_siblings_not_nested(self):
        import numpy as np
        from mkgmap_ray.geom.mpoly import classify_rings

        def sq(cy, cx, s):
            return (np.asarray([cy - s, cy - s, cy + s, cy + s]),
                    np.asarray([cx - s, cx + s, cx + s, cx - s]))

        cls = classify_rings([sq(0, 0, 10), sq(100, 100, 10)])
        assert all(c["role"] == "outer" and c["parent"] == -1 for c in cls)

    def test_identical_rings_are_siblings(self):
        import numpy as np
        from mkgmap_ray.geom.mpoly import classify_rings

        r = (np.asarray([0, 0, 10, 10]), np.asarray([0, 10, 10, 0]))
        cls = classify_rings([r, r])
        assert [c["depth"] for c in cls] == [0, 0]


class TestWrongAngleFixer:
    def test_reduces_bearing_error(self):
        import numpy as np

        from mkgmap_ray.geom.anglefix import (
            _angle_err,
            _bearings,
            fix_wrong_angles,
        )

        D = 6
        scale = 1 << D
        lat_hp = np.asarray(
            [0, int(0.55 * scale), int(0.9 * scale), int(1.55 * scale),
             int(1.9 * scale), int(2.55 * scale)]
        )
        lon_hp = np.arange(6) * 10 * scale
        (rla, rlo), = fix_wrong_angles([(lat_hp, lon_hp)], D)
        tb = _bearings(lat_hp.astype(float) / scale,
                       lon_hp.astype(float) / scale)
        naive_lat = (lat_hp + scale // 2) >> D
        naive_err = _angle_err(tb, _bearings(naive_lat, lon_hp >> D)).max()
        if len(rla) == len(lat_hp):
            fixed_err = _angle_err(tb, _bearings(rla, rlo)).max()
            assert fixed_err <= naive_err

    def test_shared_point_moves_consistently(self):
        import numpy as np

        from mkgmap_ray.geom.anglefix import fix_wrong_angles

        D = 6
        scale = 1 << D
        shared = (int(1.55 * scale), 5 * scale)
        l1 = (np.asarray([0, shared[0], int(3.1 * scale)]),
              np.asarray([0, shared[1], 10 * scale]))
        l2 = (np.asarray([int(3.2 * scale), shared[0], 0]),
              np.asarray([0, shared[1], 10 * scale]))
        o1, o2 = fix_wrong_angles([l1, l2], D)
        assert (o1[0][1], o1[1][1]) == (o2[0][1], o2[1][1])

    def test_multipass_converges_chain(self):
        import numpy as np

        from mkgmap_ray.geom.anglefix import (
            _angle_err, _bearings, fix_wrong_angles,
        )

        D = 6
        scale = 1 << D
        # long near-straight diagonal chain whose naive rounding
        # zigzags at several points; later passes see errors exposed by
        # earlier moves
        n = 24
        lat_hp = np.asarray(
            [int((0.51 + 0.07 * (i % 3)) * scale) + i * scale // 3
             for i in range(n)]
        )
        lon_hp = np.arange(n) * 6 * scale
        (rla, rlo), = fix_wrong_angles([(lat_hp, lon_hp)], D)
        tb = _bearings(lat_hp.astype(float) / scale,
                       lon_hp.astype(float) / scale)
        naive_err = _angle_err(
            tb, _bearings((lat_hp + scale // 2) >> D, lon_hp >> D)
        ).max()
        if len(rla) == n:
            fixed = _angle_err(tb, _bearings(rla, rlo)).max()
            assert fixed <= naive_err
        else:
            assert len(rla) >= 2  # removals allowed, shape stays sane

    def test_roundabout_points_never_merge_or_vanish(self):
        import numpy as np

        from mkgmap_ray.geom.anglefix import fix_wrong_angles

        D = 6
        scale = 1 << D
        # tiny "roundabout" square whose corners round onto each other
        sq_lat = np.asarray([0, int(0.6 * scale), int(0.6 * scale), 0, 0])
        sq_lon = np.asarray([0, 0, int(0.6 * scale), int(0.6 * scale), 0])
        # exits shared at two corners
        e1 = (np.asarray([0, -5 * scale]), np.asarray([0, 0]))
        e2 = (np.asarray([int(0.6 * scale), 5 * scale]),
              np.asarray([int(0.6 * scale), int(0.6 * scale)]))
        rb, o1, o2 = fix_wrong_angles(
            [(sq_lat, sq_lon), e1, e2], D,
            roundabout=[True, False, False],
        )
        # roundabout keeps all its (deduped) corners: no removal
        assert len(rb[0]) >= 4
        # the two shared exit corners stay distinct positions
        c1 = (rb[0][0], rb[1][0])
        pts = set(zip(rb[0].tolist(), rb[1].tolist()))
        assert len(pts) >= 4

    def test_spike_from_rounding_removed(self):
        import numpy as np

        from mkgmap_ray.geom.anglefix import fix_wrong_angles

        D = 6
        scale = 1 << D
        # middle point rounds a full unit off a straight line → removable
        lat_hp = np.asarray([0, int(0.6 * scale), 0])
        lon_hp = np.asarray([0, 10 * scale, 20 * scale])
        (rla, rlo), = fix_wrong_angles([(lat_hp, lon_hp)], D)
        # either moved back onto the line or removed; no zigzag survives
        if len(rla) == 3:
            assert abs(int(rla[1])) <= 1
        else:
            assert len(rla) == 2


def test_wrong_angle_wiggle_move():
    """Round-4 oracle fixture: a 1-hp-past-the-boundary wiggle on a flat
    3-mu-spaced line must move back onto the line (naive rounding puts
    it a full map unit off); clean lines pass through unchanged."""
    import numpy as np

    from mkgmap_ray.geom.anglefix import fix_wrong_angles

    scale = 64
    for m in (6, 7, 8, 9):
        for y0 in (0, 1, 2):
            lat_hp = np.full(m, y0 * scale + 20, np.int64)
            lat_hp[3] = y0 * scale + 33
            lon_hp = np.arange(m) * 3 * scale
            (rla, rlo), = fix_wrong_angles([(lat_hp, lon_hp)], 6)
            assert (rla == y0).all(), (m, y0, rla)
            assert (rlo == 3 * np.arange(m)).all()
            naive = (lat_hp + 32) >> 6
            assert naive[3] == y0 + 1  # the artifact the fixer removed
            # control: clean line untouched
            flat = np.full(m, y0 * scale + 20, np.int64)
            (cla, clo), = fix_wrong_angles([(flat, lon_hp)], 6)
            assert (cla == y0).all() and (clo == 3 * np.arange(m)).all()


def test_spike_overlap_extra_pass():
    """WrongAngleFixer spike/overlap extra pass (WrongAngleFixer.java:
    730-734 extra remove, :996-1009 extra move): an interior point whose
    neighbours round to the SAME Garmin position is removed when
    unshared; a shared one collapses onto the duplicated position
    consistently across every line through it."""
    import numpy as np

    from mkgmap_ray.geom.anglefix import fix_wrong_angles

    D = 6
    s = 1 << D
    spike = (
        np.asarray([0, 5 * s, 10]),  # both ends round to (0, 0)
        np.asarray([0, 5 * s, 10]),
    )
    (rla, rlo), = fix_wrong_angles([spike], D)
    assert (5, 5) not in set(zip(rla.tolist(), rlo.tolist()))
    # shared FAR spike: the tip is 5 Garmin units from the duplicated
    # position, which is NOT among its alternative rounded positions
    # (Coord.getAlternativePositions) — the reference keeps it
    # (WrongAngleFixer.java:1000-1008), so must we
    other = (np.asarray([5 * s, 20 * s]), np.asarray([5 * s, 0]))
    o1, o2 = fix_wrong_angles([spike, other], D)
    assert (int(o2[0][0]), int(o2[1][0])) == (5, 5)
    # shared NEAR spike: tip hp (47, 47) rounds to (1, 1) with residual
    # 17 > MAX_DELTA=16 on both axes, so (0, 0) IS an alternative rounded
    # position — the extra move collapses it onto the duplicated
    # neighbour position, consistently across both lines through it
    near = (np.asarray([0, 47, 10]), np.asarray([0, 47, 10]))
    thru = (np.asarray([47, 20 * s]), np.asarray([47, 0]))
    n1, n2 = fix_wrong_angles([near, thru], D)
    assert (int(n2[0][0]), int(n2[1][0])) == (0, 0)
    assert (1, 1) not in set(zip(n1[0].tolist(), n1[1].tolist()))


def test_label_multibyte_cp932():
    """AnyCharsetEncoder with a multibyte codepage (CodeFunctions
    cp932/ms932 dispatch): katakana encode as 2 bytes, unmappable é
    transliterates to 'e', NUL terminator, decoder round-trips."""
    from mkgmap_ray.stages.labelenc import (
        code_functions,
        decode_any_charset,
        encode_any_charset,
    )

    fmt, cp, enc = code_functions("ms932")
    assert (fmt, cp) == (9, 932)
    b = enc("Kアé")
    assert b == b"K" + "ア".encode("cp932") + b"e\x00"
    assert decode_any_charset(b"K" + "ア".encode("cp932") + b"\x00",
                              "cp932") == "Kア"
    # upper-casing flows through (AnyCharsetEncoder.isUpperCase path)
    assert encode_any_charset("ab", "cp932", upper=True) == b"AB\x00"
    # unknown charsets degrade to '?' per character, never raise
    assert encode_any_charset("é", "nonexistent-charset") == b"?\x00"
