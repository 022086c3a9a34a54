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


class TestPolishFull:
    """Extended PolishMapDataSource semantics (header levels, EndLevel
    resolutions, escapes, codepage recode, contour elevation, roads)."""

    def test_unescape_codes(self):
        from mkgmap_ray.sources.polish import unescape

        # plain escape below 0x2a: literal character
        assert unescape("a~[0x05]b") == "a\x05b"
        # 6-bit format: >= 0x2a shifts down by 0x29
        assert unescape("~[0x2a]") == "\x01"
        # special-cased 0x1b2c -> 0x1c
        assert unescape("~[0x1b2c]") == "\x1c"
        # malformed code vanishes, rest preserved
        assert unescape("x~[zz]y") == "xy"
        assert unescape("no codes") == "no codes"

    def test_endlevel_resolutions(self):
        from mkgmap_ray.sources.polish import parse_mp_text

        txt = ("[IMG ID]\nLevels=4\nLevel0=24\nLevel1=22\nLevel2=20\n"
               "Level3=18\n[END-IMG ID]\n"
               "[POLYLINE]\nType=0x5\nEndLevel=2\nData0=(1,1),(2,2)\n[END]\n"
               "[POLYLINE]\nType=0x5\nData1=(1,1),(2,2)\n[END]\n"
               "[POLYLINE]\nType=0x5\nEndLevel=9\nData0=(1,1),(2,2)\n[END]\n")
        t = parse_mp_text(txt)
        # EndLevel=2 -> min_res = bits(level2) = 20, max_res = bits(0) = 24
        assert t["min_res"].to_pylist() == [20, 22, 18]
        assert t["max_res"].to_pylist() == [24, 22, 24]

    def test_contour_elevation_metric(self):
        from mkgmap_ray.sources.polish import parse_mp_text

        txt = ("[IMG ID]\nElevation=M\n[END-IMG ID]\n"
               "[POLYLINE]\nType=0x20\nLabel=100\nData0=(1,1),(2,2)\n[END]\n"
               "[POLYLINE]\nType=0x4\nLabel=100\nData0=(1,1),(2,2)\n[END]\n"
               "[POLYLINE]\nType=0x21\nLabel=peak\nData0=(1,1)\n[END]\n")
        t = parse_mp_text(txt)
        # int(100 * 3.2808399) = 328 (Java int truncation); non-contour
        # and non-numeric labels untouched
        assert t["label"].to_pylist() == ["328", "100", "peak"]

    def test_codepage_recode(self):
        from mkgmap_ray.sources.polish import parse_mp_text

        # bytes 0xE4 in cp1250 = "ä"-position differs from latin-1? use a
        # char that differs: 0xB9 is "¹" in latin-1 but "ą" in cp1250
        txt = ("[IMG ID]\nCodePage=1250\n[END-IMG ID]\n"
               "[POI]\nType=0x1\nLabel=\xb9\nData0=(1,1)\n[END]\n")
        t = parse_mp_text(txt)
        assert t["label"].to_pylist() == ["ą"]  # ą

    def test_route_param_and_road_fields(self):
        from mkgmap_ray.sources.polish import parse_mp_text

        txt = ("[POLYLINE]\nType=0x4\nRoadID=77\n"
               "RouteParam=9,-1,1,0,1,0,1\n"
               "DirIndicator=1\nNod1=0,101,0\nNod2=2,102,1\n"
               "Numbers1=0,O,1,9,E,2,8\n"
               "Data0=(1,1),(2,2),(3,3)\n[END]\n")
        t = parse_mp_text(txt)
        assert t["road_id"].to_pylist() == [77]
        assert t["speed"].to_pylist() == [7]        # clamp 9 -> 7
        assert t["road_class"].to_pylist() == [0]   # clamp -1 -> 0
        assert t["oneway"].to_pylist() == [True]
        assert t["toll"].to_pylist() == [False]
        # denied: emergency(bit0)=1, delivery(bit1)=0, car(bit2)=1
        assert t["no_access"].to_pylist() == [0b101]
        assert t["dir_indicator"].to_pylist() == [True]
        assert t["n_nod"].to_pylist() == [2]
        assert t["n_numbers"].to_pylist() == [1]

    def test_address_fields_and_label2(self):
        from mkgmap_ray.sources.polish import parse_mp_text

        txt = ("[POI]\nType=0x2a\nLabel=Cafe\nLabel2=Second\n"
               "CityName=Town\nZipCode=12345\nStreetDesc=Main St\n"
               "HouseNumber=7\nPhone=555\nCountryName=Freedonia\n"
               "RegionName=West\nis_in=Town, Freedonia\n"
               "Data0=(1,1)\n[END]\n")
        t = parse_mp_text(txt)
        row = {c: t[c].to_pylist()[0] for c in t.column_names}
        assert row["label"] == "Cafe" and row["label2"] == "Second"
        assert row["city"] == "Town" and row["zip"] == "12345"
        assert row["street"] == "Main St" and row["house"] == "7"
        assert row["phone"] == "555" and row["country"] == "Freedonia"
        assert row["region"] == "West" and row["is_in"] == "Town, Freedonia"

    def test_subtype_only_for_points(self):
        from mkgmap_ray.sources.polish import parse_mp_text

        txt = ("[POLYLINE]\nType=0x2\nSubType=0x17\nData0=(1,1),(2,2)\n"
               "[END]\n")
        t = parse_mp_text(txt)
        # SubType is a point-section key; in a polyline it's an extra attr
        assert t["type"].to_pylist() == [0x2]
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


class TestKeepTagsFilter:
    def make(self):
        import pyarrow as pa

        return pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "tag_keys": pa.array(
                    [["highway", "note", "created_by", "fixme", "surface"],
                     ["name", "todo"]],
                    pa.list_(pa.string()),
                ),
                "tag_vals": pa.array(
                    [["residential", "fix me", "JOSM", "continue here",
                      "FIXME"],
                     ["Main St", "fix_me"]],
                    pa.list_(pa.string()),
                ),
            }
        )

    def test_delete_pairs_fixme_and_projection(self):
        from mkgmap_ray.sources.osmxml import keep_tags_filter

        out = keep_tags_filter(
            self.make(),
            deleted_tags={"created_by": set(), "note": {"fix me"}},
        )
        # created_by: all values deleted; note: only the listed value;
        # fixme KEY keeps its value; surface=FIXME dropped by the value
        # pattern; todo=fix_me dropped ((?i)fix[ _]?me)
        assert out["tag_keys"].to_pylist() == [["highway", "fixme"], ["name"]]
        assert out["tag_vals"].to_pylist() == [
            ["residential", "continue here"], ["Main St"]
        ]

    def test_used_tags_projection(self):
        from mkgmap_ray.sources.osmxml import keep_tags_filter

        out = keep_tags_filter(
            self.make(), used_tags={"highway", "name"}, remove_fixme=False
        )
        assert out["tag_keys"].to_pylist() == [["highway"], ["name"]]

    def test_short_fixme_value_kept(self):
        import pyarrow as pa

        from mkgmap_ray.sources.osmxml import keep_tags_filter

        t = pa.table(
            {
                "id": pa.array([1], pa.int64()),
                "tag_keys": pa.array([["a"]], pa.list_(pa.string())),
                "tag_vals": pa.array([["fixm"]], pa.list_(pa.string())),
            }
        )
        # val.length() >= 5 guard: 4-char value survives even though the
        # pattern would not match anyway
        out = keep_tags_filter(t)
        assert out["tag_vals"].to_pylist() == [["fixm"]]


def test_mp_nod_numbers_payloads(tmp_path):
    """Round-4: Nod / Numbers subsections parse into real payloads
    (RoadHelper.addNode/addNumbers + Numbers(String), not just counts)."""
    from mkgmap_ray.sources.polish import parse_mp_text, write_mp

    p = str(tmp_path / "t.mp")
    write_mp(p, [
        {"kind": 1, "type": 5, "road_id": 9,
         "route_param": "3,2,1,0,1,0,0,0",
         "nod": ["0,1009,0", "2,2009,1"],
         "numbers": ["0,O,1,9,E,2,8", "1,N,0,0,B,5,11", "2,N,0,0,N,0,0"],
         "lat_mu": [100, 200, 300], "lon_mu": [100, 200, 300]},
    ])
    t = parse_mp_text(open(p).read())
    assert t.num_rows == 1
    assert t["nod_index"][0].as_py() == [0, 2]
    assert t["nod_id"][0].as_py() == [1009, 2009]
    assert t["nod_boundary"][0].as_py() == [0, 1]
    # third Numbers line is N/N on both sides -> dropped (RoadHelper:189)
    assert t["hn_node"][0].as_py() == [0, 1]
    assert t["hn_left_style"][0].as_py() == [1, 0]
    assert t["hn_left_start"][0].as_py() == [1, 0]
    assert t["hn_left_end"][0].as_py() == [9, 0]
    assert t["hn_right_style"][0].as_py() == [2, 3]
    assert t["hn_right_start"][0].as_py() == [2, 5]
    assert t["hn_right_end"][0].as_py() == [8, 11]
    assert t["n_numbers"][0].as_py() == 3
