"""OSM o5m source (``reader/osm/o5m/O5mBinHandler.java:35-99`` semantics).

The o5m wire format (public spec): datasets of [type byte][varint
length][payload] after a 0xFF reset; signed values use low-bit-sign
(zigzag) varints; ids/coordinates/refs are DELTA-coded across datasets
(reset clears the deltas); coordinates are 1e-7 degrees; strings are
NUL-terminated pairs with a 15000-entry reference ring (pairs ≤ 250
bytes become back-references); relation members carry the type as the
role string's first digit character.

Shares the Arrow output schema with the XML/PBF sources so every
downstream stage is format-agnostic; the deterministic ``write_o5m``
fixture writer exercises the reader end-to-end without external data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .osmxml import _tag_list_arrays, to_map_unit
from .pbf import encode_varint, zigzag_decode, zigzag_encode, decode_varints

NANO7 = 10_000_000  # 1e-7 degree units

O5M_HEADER = 0xE0
O5M_NODE = 0x10
O5M_WAY = 0x11
O5M_RELATION = 0x12
O5M_BBOX = 0xDB
O5M_RESET = 0xFF
O5M_EOF = 0xFE

STRING_RING = 15000
MAX_REF_STRING = 250


# --- low-level readers -------------------------------------------------------


def _read_uvarint(data: bytes, i: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = data[i]
        i += 1
        v |= (b & 0x7F) << shift
        if b < 0x80:
            return v, i
        shift += 7


def _read_svarint(data: bytes, i: int) -> tuple[int, int]:
    u, i = _read_uvarint(data, i)
    return (u >> 1) ^ -(u & 1), i


class _StringRing:
    """The o5m reference ring: every stored pair ≤ 250 bytes becomes
    addressable by its distance back (1-based, newest = 1)."""

    def __init__(self):
        self.items: list[tuple[str, str]] = []

    def add(self, pair: tuple[str, str], raw_len: int) -> None:
        if raw_len <= MAX_REF_STRING:
            self.items.append(pair)
            if len(self.items) > STRING_RING:
                self.items.pop(0)

    def get(self, back: int) -> tuple[str, str]:
        return self.items[-back]


def _read_pair(data: bytes, i: int, ring: _StringRing) -> tuple[tuple[str, str], int]:
    if data[i] != 0:
        back, i = _read_uvarint(data, i)
        return ring.get(back), i
    i += 1
    e1 = data.index(0, i)
    s1 = data[i:e1]
    i = e1 + 1
    e2 = data.index(0, i)
    s2 = data[i:e2]
    i = e2 + 1
    pair = (s1.decode("utf-8"), s2.decode("utf-8"))
    ring.add(pair, len(s1) + len(s2) + 2)
    return pair, i


# --- writer (fixture generator) ---------------------------------------------


class _WriterRing:
    def __init__(self):
        self.pos: dict[tuple[str, str], int] = {}
        self.count = 0

    def encode(self, pair: tuple[str, str]) -> bytes:
        raw = pair[0].encode() + b"\x00" + pair[1].encode() + b"\x00"
        if pair in self.pos:
            back = self.count - self.pos[pair] + 1  # newest = 1
            if back <= STRING_RING:
                return encode_varint(back)
        out = b"\x00" + raw
        if len(raw) <= MAX_REF_STRING:
            self.count += 1
            self.pos[pair] = self.count
        return out


def _svar(v: int) -> bytes:
    return encode_varint(zigzag_encode(int(v)))


def write_o5m(path: str, node_ids, lat_mu, lon_mu,
              ways=None, tags=None, way_tags=None, relations=None) -> None:
    """Deterministic .o5m fixture writer (same interface as
    ``write_osm_xml``/``write_pbf``): delta-coded ids/coords/refs,
    version 0 (no metadata), string-reference ring."""
    from .osmxml import _MEMBER_CODE, to_degrees

    node_ids = np.asarray(node_ids, np.int64)
    lat7 = np.round(
        np.asarray(to_degrees(lat_mu), np.float64) * NANO7
    ).astype(np.int64)
    lon7 = np.round(
        np.asarray(to_degrees(lon_mu), np.float64) * NANO7
    ).astype(np.int64)

    out = bytearray([O5M_RESET])
    hdr = b"o5m2"
    out.append(O5M_HEADER)
    out += encode_varint(len(hdr))
    out += hdr

    ring = _WriterRing()
    last_id = last_lat = last_lon = 0
    for nid, la, lo in zip(node_ids, lat7, lon7):
        body = bytearray()
        body += _svar(int(nid) - last_id)
        last_id = int(nid)
        body += encode_varint(0)  # version 0: no metadata
        body += _svar(int(lo) - last_lon)
        last_lon = int(lo)
        body += _svar(int(la) - last_lat)
        last_lat = int(la)
        for k, v in (tags or {}).get(int(nid), {}).items():
            body += ring.encode((k, v))
        out.append(O5M_NODE)
        out += encode_varint(len(body))
        out += body

    last_id = 0
    last_ref = 0
    for wid, refs in ways or []:
        body = bytearray()
        body += _svar(int(wid) - last_id)
        last_id = int(wid)
        body += encode_varint(0)
        refsec = bytearray()
        for r in refs:
            refsec += _svar(int(r) - last_ref)
            last_ref = int(r)
        body += encode_varint(len(refsec))
        body += refsec
        for k, v in (way_tags or {}).get(int(wid), {}).items():
            body += ring.encode((k, v))
        out.append(O5M_WAY)
        out += encode_varint(len(body))
        out += body

    last_id = 0
    last_mref = 0
    for rid, members, rtags in relations or []:
        body = bytearray()
        body += _svar(int(rid) - last_id)
        last_id = int(rid)
        body += encode_varint(0)
        memsec = bytearray()
        for mtype, mref, role in members:
            code = _MEMBER_CODE.get(mtype, 0) if isinstance(mtype, str) \
                else int(mtype)
            memsec += _svar(int(mref) - last_mref)
            last_mref = int(mref)
            memsec += ring.encode(("", f"{code}{role}"))
        body += encode_varint(len(memsec))
        body += memsec
        for k, v in rtags.items():
            body += ring.encode((k, v))
        out.append(O5M_RELATION)
        out += encode_varint(len(body))
        out += body

    out.append(O5M_EOF)
    with open(path, "wb") as f:
        f.write(out)


# --- reader ------------------------------------------------------------------


def parse_o5m_bytes(data: bytes):
    """One .o5m payload → (nodes, ways, relations) Arrow tables with the
    shared source schema. Way refs decode VECTORIZED per dataset (the
    length-prefixed refs section is a contiguous signed-varint run)."""
    nid, nlat7, nlon7, ntags = [], [], [], []
    wid, wrefs, wtags = [], [], []
    rid, rmem, rtags = [], [], []

    ring = _StringRing()
    last = {"nid": 0, "nlat": 0, "nlon": 0, "wid": 0, "ref": 0,
            "rid": 0, "mref": 0}
    i = 0
    n = len(data)
    while i < n:
        t = data[i]
        i += 1
        if t == O5M_RESET:
            for k in last:
                last[k] = 0
            continue
        if t == O5M_EOF:
            break
        ln, i = _read_uvarint(data, i)
        body = data[i : i + ln]
        i += ln
        if t == O5M_HEADER or t == O5M_BBOX:
            continue
        j = 0
        if t == O5M_NODE:
            d, j = _read_svarint(body, j)
            last["nid"] += d
            ver, j = _read_uvarint(body, j)
            if ver != 0:  # skip timestamp/changeset/author metadata
                ts, j = _read_svarint(body, j)
                if ts != 0:
                    _, j = _read_svarint(body, j)  # changeset delta
                    _, j = _read_pair(body, j, ring)  # uid/author
            d, j = _read_svarint(body, j)
            last["nlon"] += d
            d, j = _read_svarint(body, j)
            last["nlat"] += d
            tag_list = []
            while j < len(body):
                pair, j = _read_pair(body, j, ring)
                tag_list.append(pair)
            nid.append(last["nid"])
            nlat7.append(last["nlat"])
            nlon7.append(last["nlon"])
            ntags.append(tag_list)
        elif t == O5M_WAY:
            d, j = _read_svarint(body, j)
            last["wid"] += d
            ver, j = _read_uvarint(body, j)
            if ver != 0:
                ts, j = _read_svarint(body, j)
                if ts != 0:
                    _, j = _read_svarint(body, j)
                    _, j = _read_pair(body, j, ring)
            rlen, j = _read_uvarint(body, j)
            refsec = body[j : j + rlen]
            j += rlen
            deltas = zigzag_decode(decode_varints(refsec))
            refs = (last["ref"] + np.cumsum(deltas)).astype(np.int64)
            if len(refs):
                last["ref"] = int(refs[-1])
            tag_list = []
            while j < len(body):
                pair, j = _read_pair(body, j, ring)
                tag_list.append(pair)
            wid.append(last["wid"])
            wrefs.append(refs.tolist())
            wtags.append(tag_list)
        elif t == O5M_RELATION:
            d, j = _read_svarint(body, j)
            last["rid"] += d
            ver, j = _read_uvarint(body, j)
            if ver != 0:
                ts, j = _read_svarint(body, j)
                if ts != 0:
                    _, j = _read_svarint(body, j)
                    _, j = _read_pair(body, j, ring)
            mlen, j = _read_uvarint(body, j)
            mend = j + mlen
            members = []
            while j < mend:
                d, j = _read_svarint(body, j)
                last["mref"] += d
                pair, j = _read_pair(body, j, ring)
                type_role = pair[1]
                members.append(
                    (int(type_role[0]), last["mref"], type_role[1:])
                )
            tag_list = []
            while j < len(body):
                pair, j = _read_pair(body, j, ring)
                tag_list.append(pair)
            rid.append(last["rid"])
            rmem.append(members)
            rtags.append(tag_list)

    lat_mu = to_map_unit(np.asarray(nlat7, np.float64) / NANO7)
    lon_mu = to_map_unit(np.asarray(nlon7, np.float64) / NANO7)
    nk, nv = _tag_list_arrays(ntags)
    nodes = pa.table(
        {
            "id": pa.array(nid, pa.int64()),
            "lat_mu": pa.array(lat_mu, pa.int64()),
            "lon_mu": pa.array(lon_mu, pa.int64()),
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


def read_o5m_table(paths: list[str], table: str = "nodes"):
    """Ray Data source: .o5m files → nodes/ways/relations Dataset."""
    from .osmxml import read_osm_table

    return read_osm_table(paths, table, parser=parse_o5m_bytes)
