"""OSM XML source: streaming parse of ``.osm`` files into Arrow tables.

The reference reads OSM XML via SAX callbacks
(``reader/osm/xml/OsmXmlHandler.java:52-258``) filling per-element maps.
Ray-native equivalent: ``ray.data.read_binary_files`` over the shard
paths → one ``flat_map``-style ``map_batches`` parse per file (files ARE
the parallelism unit, like the reference's one-file-one-job), emitting a
nodes table and a ways table. Coordinates convert to 24-bit map units
with the reference's half-unit-corrected truncation
(``imgfmt/Utils.toMapUnit``, ``Utils.java:121-127``) so round-trips are
bit-exact.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from io import BytesIO

import numpy as np
import pyarrow as pa

MU = 1 << 24


def to_map_unit(deg: np.ndarray) -> np.ndarray:
    """``Utils.toMapUnit``: half-delta-corrected truncation to map units."""
    deg = np.asarray(deg, np.float64)
    delta = 360.0 / (1 << 24) / 2
    adj = np.where(deg > 0, deg + delta, deg - delta)
    return np.trunc(adj * (1 << 24) / 360.0).astype(np.int64)


def to_degrees(mu) -> np.ndarray:
    return np.asarray(mu, np.float64) * (360.0 / (1 << 24))


def write_osm_xml(path: str, node_ids, lat_mu, lon_mu,
                  ways: list[tuple[int, list[int]]] | None = None,
                  tags: dict[int, dict[str, str]] | None = None) -> None:
    """Deterministic ``.osm`` fixture writer (test/bench input generator —
    the ``ElementTestDataSource`` analogue)."""
    lat = to_degrees(lat_mu)
    lon = to_degrees(lon_mu)
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<osm version="0.6" generator="mkgmap_ray">\n')
        for i, nid in enumerate(node_ids):
            t = (tags or {}).get(int(nid))
            if t:
                f.write(
                    f'  <node id="{int(nid)}" lat="{lat[i]:.9f}" '
                    f'lon="{lon[i]:.9f}">\n'
                )
                for k, v in t.items():
                    f.write(f'    <tag k="{k}" v="{v}"/>\n')
                f.write("  </node>\n")
            else:
                f.write(
                    f'  <node id="{int(nid)}" lat="{lat[i]:.9f}" '
                    f'lon="{lon[i]:.9f}"/>\n'
                )
        for wid, refs in ways or []:
            f.write(f'  <way id="{int(wid)}">\n')
            for r in refs:
                f.write(f'    <nd ref="{int(r)}"/>\n')
            f.write("  </way>\n")
        f.write("</osm>\n")


def parse_osm_bytes(data: bytes):
    """One ``.osm`` payload → (nodes Table, ways Table).

    nodes: ``id, lat_mu, lon_mu, n_tags``; ways: ``id, n_refs, refs``
    (list<int64>). Uses iterparse with element clearing — streaming like
    the reference's SAX handler, never materializing the DOM.
    """
    nid, nlat, nlon, ntag = [], [], [], []
    wid, wrefs = [], []
    cur_tags = 0
    cur_refs: list[int] = []
    for event, el in ET.iterparse(BytesIO(data), events=("start", "end")):
        if event == "start":
            if el.tag == "node":
                cur_tags = 0
            elif el.tag == "way":
                cur_refs = []
            continue
        if el.tag == "tag":
            cur_tags += 1
        elif el.tag == "nd":
            cur_refs.append(int(el.get("ref")))
        elif el.tag == "node":
            nid.append(int(el.get("id")))
            nlat.append(float(el.get("lat")))
            nlon.append(float(el.get("lon")))
            ntag.append(cur_tags)
            el.clear()
        elif el.tag == "way":
            wid.append(int(el.get("id")))
            wrefs.append(cur_refs)
            el.clear()
    nodes = pa.table(
        {
            "id": pa.array(nid, pa.int64()),
            "lat_mu": pa.array(to_map_unit(np.asarray(nlat, np.float64)),
                               pa.int64()),
            "lon_mu": pa.array(to_map_unit(np.asarray(nlon, np.float64)),
                               pa.int64()),
            "n_tags": pa.array(ntag, pa.int64()),
        }
    )
    ways = pa.table(
        {
            "id": pa.array(wid, pa.int64()),
            "n_refs": pa.array([len(r) for r in wrefs], pa.int64()),
            "refs": pa.array(wrefs, pa.list_(pa.int64())),
        }
    )
    return nodes, ways


def read_osm_nodes(paths: list[str]):
    """Ray Data source: .osm files → nodes Dataset (one parse per file)."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for payload in batch["bytes"]:
            nodes, _ = parse_osm_bytes(payload.as_py())
            tables.append(nodes)
        return pa.concat_tables(tables) if tables else pa.table(
            {
                "id": pa.array([], pa.int64()),
                "lat_mu": pa.array([], pa.int64()),
                "lon_mu": pa.array([], pa.int64()),
                "n_tags": pa.array([], pa.int64()),
            }
        )

    return rd.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=None
    )
