"""PBF source: varint/zigzag codec, full-model round-trip, Ray reader."""

import numpy as np
import pytest

from mkgmap_ray.sources.pbf import (
    decode_varints,
    encode_varint,
    parse_pbf_bytes,
    write_pbf,
    zigzag_decode,
    zigzag_encode,
)


class TestVarint:
    def test_decode_matches_encode_fuzz(self):
        rng = np.random.default_rng(11)
        vals = rng.integers(0, 1 << 62, 500).tolist() + [
            0, 1, 127, 128, 16383, 16384, (1 << 64) - 1
        ]
        buf = b"".join(encode_varint(v) for v in vals)
        got = decode_varints(buf)
        assert [int(g) for g in got] == [v & ((1 << 64) - 1) for v in vals]

    def test_zigzag_roundtrip(self):
        rng = np.random.default_rng(12)
        sv = rng.integers(-(1 << 62), 1 << 62, 500).tolist() + [
            0, -1, 1, -(1 << 63), (1 << 63) - 1
        ]
        zz = np.array([zigzag_encode(v) for v in sv], dtype=np.uint64)
        assert zigzag_decode(zz).tolist() == sv

    def test_empty(self):
        assert len(decode_varints(b"")) == 0


class TestPbfRoundtrip:
    def test_full_model(self, tmp_path):
        p = str(tmp_path / "t.pbf")
        ids = np.asarray([1, 5, 6, 100, 99999])
        lat = np.asarray([100, -200, 65535, 0, -70000])
        lon = np.asarray([7, 0, -65535, 12345, 8388607])
        tags = {5: {"amenity": "cafe", "name": "X"}, 100: {"highway": "stop"}}
        ways = [(10, [1, 5, 6]), (11, [6, 100, 99999, 1])]
        way_tags = {10: {"highway": "residential", "oneway": "yes"}}
        rels = [
            (7, [("way", 10, "outer"), ("way", 11, "inner"),
                 ("node", 5, "via")], {"type": "multipolygon"})
        ]
        write_pbf(p, ids, lat, lon, ways=ways, tags=tags,
                  way_tags=way_tags, relations=rels)
        nodes, w, r = parse_pbf_bytes(open(p, "rb").read())
        assert nodes["id"].to_pylist() == ids.tolist()
        assert nodes["lat_mu"].to_pylist() == lat.tolist()
        assert nodes["lon_mu"].to_pylist() == lon.tolist()
        assert nodes["n_tags"].to_pylist() == [0, 2, 0, 1, 0]
        assert nodes["tag_keys"].to_pylist()[1] == ["amenity", "name"]
        assert nodes["tag_vals"].to_pylist()[1] == ["cafe", "X"]
        assert w["id"].to_pylist() == [10, 11]
        assert w["refs"].to_pylist() == [[1, 5, 6], [6, 100, 99999, 1]]
        assert w["tag_keys"].to_pylist() == [["highway", "oneway"], []]
        assert r["member_types"].to_pylist() == [[1, 1, 0]]
        assert r["member_refs"].to_pylist() == [[10, 11, 5]]
        assert r["member_roles"].to_pylist() == [["outer", "inner", "via"]]

    def test_xml_pbf_parity(self, tmp_path):
        """XML and PBF writers of the same model parse to identical
        tables (shared downstream schema)."""
        from mkgmap_ray.sources.osmxml import parse_osm_bytes, write_osm_xml

        ids = np.arange(0, 40)
        lat = (ids * 48271) % 65536
        lon = (ids * 16807) % 65536
        ways = [(w, [int(4 * w + j) for j in range(4)]) for w in range(10)]
        way_tags = {w: {"highway": "path"} for w in range(10)}
        px = str(tmp_path / "a.osm")
        pp = str(tmp_path / "a.pbf")
        write_osm_xml(px, ids, lat, lon, ways=ways, way_tags=way_tags)
        write_pbf(pp, ids, lat, lon, ways=ways, way_tags=way_tags)
        nx, wx, _ = parse_osm_bytes(open(px, "rb").read())
        npb, wpb, _ = parse_pbf_bytes(open(pp, "rb").read())
        assert nx.equals(npb)
        assert wx.equals(wpb)

    def test_ray_reader(self, ray_session, tmp_path):
        from mkgmap_ray.sources.pbf import read_pbf_table

        paths = []
        for s in range(3):
            p = str(tmp_path / f"s{s}.pbf")
            ids = np.arange(s * 10, s * 10 + 5)
            write_pbf(p, ids, ids * 3, ids * 5)
            paths.append(p)
        out = read_pbf_table(paths, "nodes").to_pandas().sort_values("id")
        assert len(out) == 15
        assert (out["lat_mu"] == out["id"] * 3).all()


class TestTagColumn:
    def test_first_match_and_missing(self):
        import pyarrow as pa

        from mkgmap_ray.sources.osmxml import tag_column

        batch = pa.table(
            {
                "tag_keys": pa.array(
                    [["a", "b"], [], ["b", "a", "a"]],
                    pa.list_(pa.string()),
                ),
                "tag_vals": pa.array(
                    [["1", "2"], [], ["3", "first", "second"]],
                    pa.list_(pa.string()),
                ),
            }
        )
        out = tag_column(batch, "a").to_pylist()
        assert out == ["1", None, "first"]


class TestO5m:
    def test_roundtrip_parity_with_xml(self, tmp_path):
        from mkgmap_ray.sources.o5m import parse_o5m_bytes, write_o5m
        from mkgmap_ray.sources.osmxml import parse_osm_bytes, write_osm_xml

        ids = np.asarray([1, 5, 6, 100, 99999])
        lat = np.asarray([100, -200, 65535, 0, -70000])
        lon = np.asarray([7, 0, -65535, 12345, 8388607])
        tags = {5: {"amenity": "cafe", "name": "X"},
                100: {"amenity": "cafe"}}
        ways = [(10, [1, 5, 6]), (11, [6, 100, 99999, 1])]
        way_tags = {10: {"highway": "residential", "oneway": "yes"},
                    11: {"highway": "residential"}}
        rels = [(7, [("way", 10, "outer"), ("way", 11, "inner"),
                     ("node", 5, "via")], {"type": "multipolygon"})]
        po = str(tmp_path / "a.o5m")
        px = str(tmp_path / "a.osm")
        write_o5m(po, ids, lat, lon, ways=ways, tags=tags,
                  way_tags=way_tags, relations=rels)
        write_osm_xml(px, ids, lat, lon, ways=ways, tags=tags,
                      way_tags=way_tags, relations=rels)
        got = parse_o5m_bytes(open(po, "rb").read())
        exp = parse_osm_bytes(open(px, "rb").read())
        for g, e in zip(got, exp):
            assert g.equals(e)

    def test_string_ring_backrefs(self, tmp_path):
        # the same tag pair used many times must round-trip through
        # back-references (file stays small)
        from mkgmap_ray.sources.o5m import parse_o5m_bytes, write_o5m

        ids = np.arange(200)
        tags = {int(i): {"highway": "residential"} for i in ids}
        p = str(tmp_path / "ring.o5m")
        write_o5m(p, ids, ids * 3, ids * 5, tags=tags)
        n, _, _ = parse_o5m_bytes(open(p, "rb").read())
        assert all(
            t == ["residential"] for t in n["tag_vals"].to_pylist()
        )
        # one literal pair + 199 one-byte refs → far smaller than literal
        assert len(open(p, "rb").read()) < 200 * 24

    def test_ray_reader(self, ray_session, tmp_path):
        from mkgmap_ray.sources.o5m import read_o5m_table, write_o5m

        paths = []
        for s in range(2):
            p = str(tmp_path / f"s{s}.o5m")
            ids = np.arange(s * 10, s * 10 + 5)
            write_o5m(p, ids, ids * 3, ids * 5)
            paths.append(p)
        out = read_o5m_table(paths, "nodes").to_pandas().sort_values("id")
        assert len(out) == 10
        assert (out["lat_mu"] == out["id"] * 3).all()


class TestPlainNodes:
    def test_plain_nodes_match_dense(self, tmp_path):
        """Plain (non-dense) Node messages: sint64 id/lat/lon + packed
        keys/vals parse identically to the DenseNodes encoding (round-2
        ADVICE: raw-varint decode read id 42 as 84, dropped tags)."""
        p1, p2 = str(tmp_path / "plain.pbf"), str(tmp_path / "dense.pbf")
        ids = np.asarray([42, 43, 44])
        lat = np.asarray([-3000, 100, 65535])
        lon = np.asarray([-70000, -1, 7])
        tags = {42: {"amenity": "cafe"}, 44: {"name": "Neg"}}
        write_pbf(p1, ids, lat, lon, tags=tags, plain_nodes=2)
        write_pbf(p2, ids, lat, lon, tags=tags)
        n1, _, _ = parse_pbf_bytes(open(p1, "rb").read())
        n2, _, _ = parse_pbf_bytes(open(p2, "rb").read())
        assert n1.to_pylist() == n2.to_pylist()
        assert n1["id"].to_pylist() == [42, 43, 44]
        assert n1["lat_mu"].to_pylist() == [-3000, 100, 65535]
        assert n1["lon_mu"].to_pylist() == [-70000, -1, 7]
        assert n1["tag_keys"].to_pylist() == [["amenity"], [], ["name"]]
        assert n1["tag_vals"].to_pylist() == [["cafe"], [], ["Neg"]]
