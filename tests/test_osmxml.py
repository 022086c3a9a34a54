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
        nodes, ways = parse_osm_bytes(open(p, "rb").read())
        assert nodes["id"].to_pylist() == [1, 2, 3, 99]
        assert nodes["lat_mu"].to_pylist() == lat.tolist()
        assert nodes["lon_mu"].to_pylist() == lon.tolist()
        assert nodes["n_tags"].to_pylist() == [0, 2, 0, 0]
        assert ways["id"].to_pylist() == [10, 11]
        assert ways["refs"].to_pylist() == [[1, 2, 3], [3, 99]]

    def test_empty_file(self, tmp_path):
        p = str(tmp_path / "e.osm")
        write_osm_xml(p, np.asarray([], np.int64), np.asarray([]), np.asarray([]))
        nodes, ways = parse_osm_bytes(open(p, "rb").read())
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
