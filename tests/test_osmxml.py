"""OSM XML source: writer/parser round-trip + toMapUnit semantics."""

import numpy as np
import pytest

from mkgmap_ray.sources.osmxml import (
    parse_osm_bytes,
    to_degrees,
    to_map_unit,
    write_osm_xml,
)


class TestToMapUnit:
    def test_roundtrip_positive_and_negative(self):
        mu = np.asarray([0, 1, -1, 65536, -65536, (1 << 23) - 1, -(1 << 23)])
        deg = to_degrees(mu)
        back = to_map_unit(deg)
        np.testing.assert_array_equal(back, mu)

    def test_half_unit_rounding(self):
        # values just under/over the half-unit boundary truncate correctly
        unit = 360.0 / (1 << 24)
        assert to_map_unit(np.asarray([0.49 * unit]))[0] == 0
        assert to_map_unit(np.asarray([0.51 * unit]))[0] == 1
        assert to_map_unit(np.asarray([-0.49 * unit]))[0] == 0
        assert to_map_unit(np.asarray([-0.51 * unit]))[0] == -1


class TestXmlRoundtrip:
    def test_nodes_ways_tags(self, tmp_path):
        p = str(tmp_path / "t.osm")
        ids = np.asarray([1, 2, 3, 99])
        lat = np.asarray([100, -200, 65535, 0])
        lon = np.asarray([7, 0, -65535, 12345])
        write_osm_xml(
            p, ids, lat, lon,
            ways=[(10, [1, 2, 3]), (11, [3, 99])],
            tags={2: {"highway": "primary", "name": "A1"}},
        )
        nodes, ways, _rels = parse_osm_bytes(open(p, "rb").read())
        assert nodes["id"].to_pylist() == [1, 2, 3, 99]
        assert nodes["lat_mu"].to_pylist() == lat.tolist()
        assert nodes["lon_mu"].to_pylist() == lon.tolist()
        assert nodes["n_tags"].to_pylist() == [0, 2, 0, 0]
        assert ways["id"].to_pylist() == [10, 11]
        assert ways["refs"].to_pylist() == [[1, 2, 3], [3, 99]]

    def test_empty_file(self, tmp_path):
        p = str(tmp_path / "e.osm")
        write_osm_xml(p, np.asarray([], np.int64), np.asarray([]), np.asarray([]))
        nodes, ways, _rels = parse_osm_bytes(open(p, "rb").read())
        assert nodes.num_rows == 0 and ways.num_rows == 0

    def test_ray_source(self, ray_session, tmp_path):
        from mkgmap_ray.sources.osmxml import read_osm_nodes

        paths = []
        for s in range(3):
            p = str(tmp_path / f"s{s}.osm")
            ids = np.arange(s * 10, s * 10 + 5)
            write_osm_xml(p, ids, ids * 3, ids * 5)
            paths.append(p)
        out = read_osm_nodes(paths).to_pandas().sort_values("id")
        assert len(out) == 15
        assert (out["lat_mu"] == out["id"] * 3).all()


class TestPolish:
    def test_roundtrip_and_decode_semantics(self, tmp_path):
        from mkgmap_ray.sources.polish import parse_mp_text, write_mp

        p = str(tmp_path / "t.mp")
        els = [
            {"kind": 0, "type": 0x2A, "label": "poi one", "level": 0,
             "lat_mu": [1000], "lon_mu": [-2000]},
            {"kind": 1, "type": 0x4, "label": "road", "level": 2,
             "lat_mu": [0, 500, 900], "lon_mu": [7, 8, 9]},
            {"kind": 2, "type": 0x50, "label": "", "level": 1,
             "lat_mu": [10, 20, 30], "lon_mu": [5, 15, 5]},
        ]
        write_mp(p, els)
        t = parse_mp_text(open(p).read())
        assert t["kind"].to_pylist() == [0, 1, 2]
        assert t["type"].to_pylist() == [0x2A, 0x4, 0x50]
        assert t["lat_mu"].to_pylist() == [[1000], [0, 500, 900], [10, 20, 30]]
        assert t["lon_mu"].to_pylist() == [[-2000], [7, 8, 9], [5, 15, 5]]
        assert t["level"].to_pylist() == [0, 2, 1]

    def test_subtype_and_multidata(self):
        from mkgmap_ray.sources.polish import parse_mp_text

        txt = ("[POI]\nType=0x2\nSubType=0x17\nData0=(1.0,2.0)\n[END]\n"
               "[POLYLINE]\nType=10\nData3=(0,0),(0.001,0.001)\n"
               "Data3=(0.002,0.002)\n[END]\n")
        t = parse_mp_text(txt)
        assert t["type"].to_pylist() == [0x217, 10]
        assert len(t["lat_mu"][1].as_py()) == 3

    def test_comments_and_unknown_sections_ignored(self):
        from mkgmap_ray.sources.polish import parse_mp_text

        txt = ("; comment\n[IMG ID]\nID=3\n[END-IMG ID]\n"
               "[POI]\nType=0x1\nFoo=bar\nData0=(0.5,0.5)\n[END]\n")
        t = parse_mp_text(txt)
        assert t.num_rows == 1
        assert t["n_extra"].to_pylist() == [1]


class TestHgt:
    def test_roundtrip_and_orientation(self, tmp_path):
        import numpy as np

        from mkgmap_ray.sources.hgt import (
            calc_res,
            hgt_cell_of,
            read_hgt_bytes,
            write_hgt,
        )

        res = 8
        yy, xx = np.mgrid[0 : res + 1, 0 : res + 1]
        grid = (yy * 100 + xx).astype(np.int16)  # south-first
        p = str(tmp_path / "N51E002.hgt")
        write_hgt(p, grid)
        data = open(p, "rb").read()
        assert calc_res(len(data)) == res
        back = read_hgt_bytes(data)
        np.testing.assert_array_equal(back, grid)
        # on-disk layout is north-first big-endian (HGTReader.ele index math)
        first_sample = int.from_bytes(data[:2], "big", signed=True)
        assert first_sample == int(grid[res, 0])  # NW corner first on disk
        assert hgt_cell_of(p) == (51, 2)
        assert hgt_cell_of("S01W117.hgt") == (-1, -117)

    def test_bad_name_and_size(self, tmp_path):
        import numpy as np
        import pytest

        from mkgmap_ray.sources.hgt import calc_res, hgt_cell_of

        with pytest.raises(ValueError):
            hgt_cell_of("whatever.hgt")
        with pytest.raises(ValueError):
            calc_res(1234567)  # not a square payload


class TestLabel6:
    def test_roundtrip(self):
        from mkgmap_ray.stages.labelenc import decode6, encode6

        for t in ["MAIN STREET 42", "hello world", "A", "P.O. BOX #7",
                  "ABC-12/XY", ""]:
            e = encode6(t)
            d = decode6(e)
            exp = "".join(
                c for c in t.upper()
                if c == " " or (c.isascii() and c.isalnum())
                or c in "@!\"#$%&'()*+,-./:;<=>?[\\]^_"
            )
            assert d == exp, (t, d, exp)

    def test_packing_density(self):
        from mkgmap_ray.stages.labelenc import encode6

        # 4 chars + terminator = 5 codes = 30 bits → 4 bytes
        assert len(encode6("ABCD")) == 4
        # 3 chars + terminator = 24 bits → 3 bytes
        assert len(encode6("ABC")) == 3

    def test_unmapped_dropped(self):
        from mkgmap_ray.stages.labelenc import decode6, encode6

        assert decode6(encode6("ABéC")) in ("ABC", "ABEC")
