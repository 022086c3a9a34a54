"""OSM XML source: streaming parse of ``.osm`` files into Arrow tables.

The reference reads OSM XML via SAX callbacks
(``reader/osm/xml/OsmXmlHandler.java:52-258``) filling per-element maps
(``ElementSaver.java:140-165``: nodes, ways, relations with (role, member)
pairs). Ray-native equivalent: ``ray.data.read_binary_files`` over the
shard paths → one streaming parse per file (files ARE the parallelism
unit, like the reference's one-file-one-job), emitting nodes / ways /
relations tables with tag key/value list columns. Coordinates convert to
24-bit map units with the reference's half-unit-corrected truncation
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


def _tag_lines(f, indent: str, tags: dict[str, str] | None) -> None:
    for k, v in (tags or {}).items():
        f.write(f'{indent}<tag k="{k}" v="{v}"/>\n')


def write_osm_xml(path: str, node_ids, lat_mu, lon_mu,
                  ways: list[tuple[int, list[int]]] | None = None,
                  tags: dict[int, dict[str, str]] | None = None,
                  way_tags: dict[int, dict[str, str]] | None = None,
                  relations: list[tuple[int, list[tuple[str, int, str]],
                                        dict[str, str]]] | None = None) -> None:
    """Deterministic ``.osm`` fixture writer (test/bench input generator —
    the ``ElementTestDataSource`` analogue). ``relations`` entries are
    (relation_id, [(member_type, member_ref, role), ...], tags)."""
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
                _tag_lines(f, "    ", t)
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
            _tag_lines(f, "    ", (way_tags or {}).get(int(wid)))
            f.write("  </way>\n")
        for rid, members, rtags in relations or []:
            f.write(f'  <relation id="{int(rid)}">\n')
            for mtype, mref, role in members:
                f.write(
                    f'    <member type="{mtype}" ref="{int(mref)}" '
                    f'role="{role}"/>\n'
                )
            _tag_lines(f, "    ", rtags)
            f.write("  </relation>\n")
        f.write("</osm>\n")


def _tag_list_arrays(tag_lists: list[list[tuple[str, str]]]):
    keys = pa.array(
        [[k for k, _ in t] for t in tag_lists], pa.list_(pa.string())
    )
    vals = pa.array(
        [[v for _, v in t] for t in tag_lists], pa.list_(pa.string())
    )
    return keys, vals


# member type codes mirroring Element subclasses (node/way/relation)
MEMBER_NODE, MEMBER_WAY, MEMBER_RELATION = 0, 1, 2
_MEMBER_CODE = {"node": MEMBER_NODE, "way": MEMBER_WAY,
                "relation": MEMBER_RELATION}


def empty_nodes_table() -> pa.Table:
    return pa.table(
        {
            "id": pa.array([], pa.int64()),
            "lat_mu": pa.array([], pa.int64()),
            "lon_mu": pa.array([], pa.int64()),
            "n_tags": pa.array([], pa.int64()),
            "tag_keys": pa.array([], pa.list_(pa.string())),
            "tag_vals": pa.array([], pa.list_(pa.string())),
        }
    )


def empty_ways_table() -> pa.Table:
    return pa.table(
        {
            "id": pa.array([], pa.int64()),
            "n_refs": pa.array([], pa.int64()),
            "refs": pa.array([], pa.list_(pa.int64())),
            "tag_keys": pa.array([], pa.list_(pa.string())),
            "tag_vals": pa.array([], pa.list_(pa.string())),
        }
    )


def empty_relations_table() -> pa.Table:
    return pa.table(
        {
            "id": pa.array([], pa.int64()),
            "member_types": pa.array([], pa.list_(pa.int8())),
            "member_refs": pa.array([], pa.list_(pa.int64())),
            "member_roles": pa.array([], pa.list_(pa.string())),
            "tag_keys": pa.array([], pa.list_(pa.string())),
            "tag_vals": pa.array([], pa.list_(pa.string())),
        }
    )


def parse_osm_bytes(data: bytes):
    """One ``.osm`` payload → (nodes, ways, relations) Arrow tables.

    nodes: ``id, lat_mu, lon_mu, n_tags, tag_keys, tag_vals``;
    ways: ``id, n_refs, refs, tag_keys, tag_vals``;
    relations: ``id, member_types, member_refs, member_roles, tag_keys,
    tag_vals``. Uses iterparse with element clearing — streaming like the
    reference's SAX handler, never materializing the DOM.
    """
    nid, nlat, nlon, ntags = [], [], [], []
    wid, wrefs, wtags = [], [], []
    rid, rmem, rtags = [], [], []
    cur_tags: list[tuple[str, str]] = []
    cur_refs: list[int] = []
    cur_mem: list[tuple[int, int, str]] = []
    for event, el in ET.iterparse(BytesIO(data), events=("start", "end")):
        if event == "start":
            if el.tag in ("node", "way", "relation"):
                cur_tags = []
                cur_refs = []
                cur_mem = []
            continue
        if el.tag == "tag":
            cur_tags.append((el.get("k"), el.get("v")))
        elif el.tag == "nd":
            cur_refs.append(int(el.get("ref")))
        elif el.tag == "member":
            cur_mem.append(
                (_MEMBER_CODE.get(el.get("type"), MEMBER_NODE),
                 int(el.get("ref")), el.get("role") or "")
            )
        elif el.tag == "node":
            nid.append(int(el.get("id")))
            nlat.append(float(el.get("lat")))
            nlon.append(float(el.get("lon")))
            ntags.append(cur_tags)
            el.clear()
        elif el.tag == "way":
            wid.append(int(el.get("id")))
            wrefs.append(cur_refs)
            wtags.append(cur_tags)
            el.clear()
        elif el.tag == "relation":
            rid.append(int(el.get("id")))
            rmem.append(cur_mem)
            rtags.append(cur_tags)
            el.clear()
    nk, nv = _tag_list_arrays(ntags)
    nodes = pa.table(
        {
            "id": pa.array(nid, pa.int64()),
            "lat_mu": pa.array(to_map_unit(np.asarray(nlat, np.float64)),
                               pa.int64()),
            "lon_mu": pa.array(to_map_unit(np.asarray(nlon, np.float64)),
                               pa.int64()),
            "n_tags": pa.array([len(t) for t in ntags], pa.int64()),
            "tag_keys": nk,
            "tag_vals": nv,
        }
    )
    wk, wv = _tag_list_arrays(wtags)
    ways = pa.table(
        {
            "id": pa.array(wid, pa.int64()),
            "n_refs": pa.array([len(r) for r in wrefs], pa.int64()),
            "refs": pa.array(wrefs, pa.list_(pa.int64())),
            "tag_keys": wk,
            "tag_vals": wv,
        }
    )
    rk, rv = _tag_list_arrays(rtags)
    relations = pa.table(
        {
            "id": pa.array(rid, pa.int64()),
            "member_types": pa.array(
                [[m[0] for m in ms] for ms in rmem], pa.list_(pa.int8())
            ),
            "member_refs": pa.array(
                [[m[1] for m in ms] for ms in rmem], pa.list_(pa.int64())
            ),
            "member_roles": pa.array(
                [[m[2] for m in ms] for ms in rmem], pa.list_(pa.string())
            ),
            "tag_keys": rk,
            "tag_vals": rv,
        }
    )
    return nodes, ways, relations


_EMPTY = {"nodes": empty_nodes_table, "ways": empty_ways_table,
          "relations": empty_relations_table}


def read_osm_table(paths: list[str], table: str = "nodes",
                   parser=parse_osm_bytes, dict_tags: bool = True):
    """Ray Data source: .osm files → one of the three element Datasets
    (one streaming parse per file; ``parser`` is swappable so the
    PBF/o5m sources reuse the plumbing). ``dict_tags`` dictionary-encodes
    the tag list columns (the ``TagDict`` analogue) so repeated keys ship
    as int32 indices through every downstream shuffle."""
    import ray.data as rd

    idx = ("nodes", "ways", "relations").index(table)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for payload in batch["bytes"]:
            t = parser(payload.as_py())[idx]
            if dict_tags:
                t = dictionary_encode_tags(t)
            tables.append(t)
        if tables:
            return pa.concat_tables(tables)
        empty = _EMPTY[table]()
        return dictionary_encode_tags(empty) if dict_tags else empty

    return rd.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=None
    )


def read_osm_nodes(paths: list[str]):
    """Back-compat face: .osm files → nodes Dataset."""
    return read_osm_table(paths, "nodes")


def tag_column(batch: pa.Table, key: str) -> pa.Array:
    """Extract one tag's value per row from the tag_keys/tag_vals list
    columns (vectorized: flatten + pyarrow compute equality + first-match
    scatter; the ``keepTag``-projection analogue of reading a single tag).
    Returns a string array with nulls where the tag is absent."""
    import pyarrow.compute as pc

    keys = batch["tag_keys"].combine_chunks()
    vals = batch["tag_vals"].combine_chunks()
    n = len(keys)
    flat_k = keys.flatten()
    flat_v = vals.flatten()
    offs = keys.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = offs[1:] - offs[:-1]
    parent = np.repeat(np.arange(n), counts)
    m = pc.equal(flat_k, key).to_numpy(zero_copy_only=False)
    m = np.asarray(m, bool) & ~np.asarray(pc.is_null(flat_k).to_numpy(
        zero_copy_only=False), bool)
    hit = np.nonzero(m)[0]
    # first-occurrence-per-row scatter: writing hits in REVERSE order
    # leaves each row holding its smallest flat index; then one Arrow
    # take() pulls just those values (round 2 called to_pylist() on the
    # whole flattened value column plus a Python loop over hits)
    out_idx = np.full(n, -1, np.int64)
    out_idx[parent[hit[::-1]]] = hit[::-1]
    idx_arr = pa.array(out_idx, pa.int64(), mask=out_idx < 0)
    return flat_v.take(idx_arr).cast(pa.string())


def dictionary_encode_tags(table: pa.Table) -> pa.Table:
    """``TagDict`` analogue (``reader/osm/TagDict.java``): tag keys (and
    values) become Arrow dictionary-encoded list columns — each distinct
    string is stored once per block and shuffles as int32 indices, the
    columnar form of the reference's global string↔short dictionary."""
    import pyarrow.compute as pc

    out = table
    for col in ("tag_keys", "tag_vals"):
        if col not in table.column_names:
            continue
        arr = table[col].combine_chunks()
        enc = pc.dictionary_encode(arr.flatten())
        out = out.set_column(
            out.column_names.index(col), col,
            pa.ListArray.from_arrays(arr.offsets, enc),
        )
    return out


def normalize_tag_values(table: pa.Table) -> pa.Table:
    """Ingest-time tag value normalization
    (``Element.addTagFromRawOSM``, ``Element.java:54-74``): trim, squash
    internal whitespace runs to one space, strip DEL (0x7f) — vectorized
    pyarrow string kernels over the flattened value column."""
    import pyarrow.compute as pc

    if "tag_vals" not in table.column_names:
        return table
    arr = table["tag_vals"].combine_chunks()
    flat = arr.flatten()
    if pa.types.is_dictionary(flat.type):
        flat = flat.cast(pa.string())
    flat = pc.utf8_trim_whitespace(flat)
    flat = pc.replace_substring_regex(flat, r"\s+", " ")
    flat = pc.replace_substring(flat, "\x7f", "")
    return table.set_column(
        table.column_names.index("tag_vals"), "tag_vals",
        pa.ListArray.from_arrays(arr.offsets, flat),
    )


def keep_tags_filter(table: pa.Table, used_tags=None, deleted_tags=None,
                     remove_fixme: bool = True) -> pa.Table:
    """Full ``OsmHandler.keepTag`` ingest filter
    (``reader/osm/OsmHandler.java:92-125``): drop tags named by the
    delete-tags-file (a key with an empty value-set deletes ALL its
    values, otherwise only the listed values), project to the style's
    used-tags set, and drop values matching ``(?i)fix[ _]?me`` unless the
    KEY itself is fixme/FIXME. Vectorized over the flattened key/value
    columns; list offsets rebuilt from the keep mask."""
    import pyarrow.compute as pc

    if "tag_keys" not in table.column_names:
        return table
    keys_arr = table["tag_keys"].combine_chunks()
    vals_arr = table["tag_vals"].combine_chunks()
    keys = keys_arr.flatten()
    vals = vals_arr.flatten()
    if pa.types.is_dictionary(keys.type):
        keys = keys.cast(pa.string())
    if pa.types.is_dictionary(vals.type):
        vals = vals.cast(pa.string())
    keep = np.ones(len(keys), dtype=bool)
    if deleted_tags:
        all_vals = [k for k, vs in deleted_tags.items() if not vs]
        if all_vals:
            keep &= ~np.asarray(
                pc.is_in(keys, value_set=pa.array(all_vals)), bool
            )
        pair_list = [
            f"{k}\x00{v}" for k, vs in deleted_tags.items() for v in vs
        ]
        if pair_list:
            pairs = pc.binary_join_element_wise(keys, vals, "\x00")
            keep &= ~np.asarray(
                pc.is_in(pairs, value_set=pa.array(pair_list)), bool
            )
    if used_tags:
        keep &= np.asarray(
            pc.is_in(keys, value_set=pa.array(sorted(used_tags))), bool
        )
    if remove_fixme:
        is_fixme_val = np.asarray(
            pc.match_substring_regex(vals, r"^(?i)fix[ _]?me$"), bool
        ) & (np.asarray(pc.utf8_length(vals), np.int64) >= 5)
        fixme_key = np.asarray(
            pc.is_in(keys, value_set=pa.array(["fixme", "FIXME"])), bool
        )
        keep &= ~(is_fixme_val & ~fixme_key)
    if keep.all():
        return table
    n_rows = len(keys_arr)
    offs = np.asarray(keys_arr.offsets, np.int64)
    row_of = np.repeat(np.arange(n_rows), np.diff(offs))
    new_counts = np.bincount(row_of[keep], minlength=n_rows)
    new_offs = np.concatenate([[0], np.cumsum(new_counts)]).astype(np.int32)
    idx = pa.array(np.nonzero(keep)[0], pa.int64())
    out = table.set_column(
        table.column_names.index("tag_keys"), "tag_keys",
        pa.ListArray.from_arrays(pa.array(new_offs), keys.take(idx)),
    )
    return out.set_column(
        out.column_names.index("tag_vals"), "tag_vals",
        pa.ListArray.from_arrays(pa.array(new_offs), vals.take(idx)),
    )
