"""Gmapsupp filesystem math vs scalar transcriptions of ImgFS/ImgHeader."""

import numpy as np
import pandas as pd

from mkgmap_ray.stages.gmapsupp import (
    allocate_blocks,
    best_block_size,
    img_filename,
    partition_geometry,
)


def _java_best_block_size(sizes):
    best_size = 1 << 62
    best = (0, 0, 0)
    bs = 512
    while bs < (1 << 24):
        header_slots = 1
        file_blocks = 0
        for ln in sizes:
            nb = (ln + bs - 1) // bs
            file_blocks += nb
            header_slots += (nb + 240 - 1) // 240
        required = 2 + header_slots
        header_blocks = (required * 512 + bs - 1) // bs
        total = header_blocks + file_blocks
        size = total * bs
        if header_blocks > 240 or total > 0xFFFE:
            bs <<= 1
            continue
        if size > best_size:
            break
        best = (bs, header_blocks, total)
        best_size = size
        bs <<= 1
    return best


def _java_geometry(total, bs):
    end_sector = ((total + 1) * bs + 511) // 512
    for h in (16, 32, 64, 128, 256):
        for s in (4, 8, 16, 32):
            for c in (0x20, 0x40, 0x80, 0x100, 0x200, 0x3FF):
                if s * h * c > end_sector:
                    return end_sector, h, s, c
    return end_sector, 128, 32, 0x400


def test_img_filename():
    s = pd.Series(
        ["/home/u/foo.typ", "c:/maps/averylongname.typfile", "out/1234.img"]
    )
    assert list(img_filename(s)) == ["FOO.TYP", "AVERYLON.TYP", "1234.IMG"]


def test_best_block_size_matches_java():
    rng = np.random.default_rng(17)
    groups = []
    for mag in (3, 5, 7, 8, 9):  # bytes magnitude: tiny .. hundreds of MB
        for n in (1, 3, 5):
            groups.append(rng.integers(1, 10**mag, n))
    sizes = np.concatenate(groups)
    group_of = np.repeat(np.arange(len(groups)), [len(g) for g in groups])
    bs, res, tot = best_block_size(sizes, group_of, len(groups))
    for gi, g in enumerate(groups):
        want = _java_best_block_size(list(g))
        assert (bs[gi], res[gi], tot[gi]) == want, (gi, list(g))


def test_allocation_contiguous():
    sizes = np.array([100, 1000, 5000, 700, 100])
    group_of = np.array([0, 0, 0, 1, 1])
    bs, res, tot = best_block_size(sizes, group_of, 2)
    start, nb, slots = allocate_blocks(sizes, group_of, bs, res)
    # group 0: contiguous from reserved
    assert start[0] == res[0]
    assert start[1] == start[0] + nb[0]
    assert start[2] == start[1] + nb[1]
    # group 1 restarts at its own reserved base
    assert start[3] == res[1]
    assert start[4] == start[3] + nb[3]
    assert (slots == (nb + 239) // 240).all()
    # totals consistent
    assert res[0] + nb[:3].sum() == tot[0]


def test_geometry_matches_java():
    rng = np.random.default_rng(23)
    total = rng.integers(3, 0xFFFE, 200)
    bs = 512 << rng.integers(0, 10, 200)
    es, h, s, c = partition_geometry(total, bs)
    for i in range(200):
        wes, wh, ws, wc = _java_geometry(int(total[i]), int(bs[i]))
        assert (es[i], h[i], s[i], c[i]) == (wes, wh, ws, wc)


def test_installer_artifacts():
    from mkgmap_ray.stages.installer import (
        gmapi_info_xml,
        nsis_reg_id,
        nsis_script,
    )

    # Java: hex(0x10000 | 2001) = "107d1" -> id = "d107"
    assert list(nsis_reg_id(np.array([2001, 1, 0xABCD]))) == [
        "d107", "0100", "cdab",
    ]
    nsi = nsis_script(
        "OSM map", "osmmap", 1, 2001, ["63240001", "63240002"],
        has_index=True, typ_name="my.typ",
    )
    assert '!define MAPNAME "osmmap"' in nsi
    assert '"ID" d107' in nsi
    assert '  File "63240002.img"' in nsi
    assert '  Delete "$INSTDIR\\63240001.img"' in nsi
    assert "!define INDEX" in nsi and '!define TYPNAME "my.typ"' in nsi
    xml = gmapi_info_xml("OSM map", 1, 2001, ["Product1.tdb"])
    assert "<ID>2001</ID>" in xml and "<Directory>Product1.tdb</Directory>" in xml


def test_mdx_bytes_exact():
    from mkgmap_ray.stages.installer import mdx_bytes

    data = mdx_bytes(2001, 1, [(63240001, 0x1234), (63240000, 0x0012)])
    # header: Midx, u16 100, u32 12, u32 2 (little endian)
    assert data[:4] == b"Midx"
    assert data[4:6] == (100).to_bytes(2, "little")
    assert data[6:10] == (12).to_bytes(4, "little")
    assert data[10:14] == (2).to_bytes(4, "little")
    # records sorted by hexname: 0x0012 first
    rec0 = data[14:26]
    assert rec0[:4] == (0x0012).to_bytes(4, "little")
    assert rec0[4:6] == (1).to_bytes(2, "little")
    assert rec0[6:8] == (2001).to_bytes(2, "little")
    assert rec0[8:12] == (63240000).to_bytes(4, "little")
    rec1 = data[26:38]
    assert rec1[:4] == (0x1234).to_bytes(4, "little")
    assert len(data) == 14 + 24


def test_mps_bytes_layout():
    from mkgmap_ray.stages.installer import mps_bytes

    data = mps_bytes(
        [dict(product_id=1, family_id=2001, map_number=63240001,
              hex_number=0x1234, series="S", description="D", area="A")],
        [dict(product_id=1, family_id=2001, description="Fam")],
        mapset_name="MS",
    )
    # map block
    assert data[0] == 0x4C
    blen = int.from_bytes(data[1:3], "little")
    body = data[3:3 + blen]
    assert body[:2] == (1).to_bytes(2, "little")
    assert body[2:4] == (2001).to_bytes(2, "little")
    assert body[4:8] == (63240001).to_bytes(4, "little")
    assert body[8:].startswith(b"S\0D\0A\0")
    assert body[-8:-4] == (0x1234).to_bytes(4, "little")
    assert body[-4:] == b"\0\0\0\0"
    # product block follows
    off = 3 + blen
    assert data[off] == 0x46
    plen = int.from_bytes(data[off + 1:off + 3], "little")
    assert data[off + 3:off + 3 + plen] == b"\x01\x00\xd1\x07Fam\0"
    # mapset block last
    off2 = off + 3 + plen
    assert data[off2] == 0x56
    assert data[off2 + 3:] == b"MS\0\0"


def test_tdb_bytes_layout():
    from mkgmap_ray.stages.installer import tdb_bytes

    data = tdb_bytes(
        2001, 1, "Series", "Fam",
        overview=dict(map_number=63240000, max_lat=100, max_lon=200,
                      min_lat=-50, min_lon=-60, description="OV"),
        details=[dict(map_number=63240001, parent=63240000, max_lat=10,
                      max_lon=20, min_lat=0, min_lon=5, description="D1",
                      sub_files=[("63240001.TRE", 1000),
                                 ("63240001.RGN", 2000)])],
        copyrights=[dict(text="(c) test")],
    )
    # header block
    assert data[0] == 0x50
    hlen = int.from_bytes(data[1:3], "little")
    hb = data[3:3 + hlen]
    assert hb[:6] == (1).to_bytes(2, "little") + (2001).to_bytes(2, "little") \
        + (407).to_bytes(2, "little")
    assert b"Series\0" in hb and b"Fam\0" in hb
    off = 3 + hlen
    # copyright block
    assert data[off] == 0x44
    clen = int.from_bytes(data[off + 1:off + 3], "little")
    assert b"(c) test\0" in data[off + 3:off + 3 + clen]
    off += 3 + clen
    # overview block
    assert data[off] == 0x42
    olen = int.from_bytes(data[off + 1:off + 3], "little")
    ob = data[off + 3:off + 3 + olen]
    assert ob[:4] == (63240000).to_bytes(4, "little")
    assert ob[8:12] == (100).to_bytes(4, "little")
    assert ob[16:20] == (-50).to_bytes(4, "little", signed=True)
    off += 3 + olen
    # detail block
    assert data[off] == 0x4C
    dlen = int.from_bytes(data[off + 1:off + 3], "little")
    db = data[off + 3:off + 3 + dlen]
    assert db[:4] == (63240001).to_bytes(4, "little")
    i = db.index(b"D1\0") + 3
    assert db[i:i + 4] == (3).to_bytes(2, "little") + (2).to_bytes(2, "little")
    assert db[i + 4:i + 8] == (1000).to_bytes(4, "little")
    assert db[i + 8:i + 12] == (2000).to_bytes(4, "little")
    assert db[i + 12:i + 16] == (0xFF00C301).to_bytes(4, "little")
    assert db.endswith(b"63240001.TRE\x0063240001.RGN\0")
