"""NSIS installer + gmapi bundle builders (``combiners/NsisBuilder
.java``, ``combiners/GmapiBuilder.java``) — the deterministic text
artifacts that wrap a finished map set.

Reproduced semantics:

- registry family id (``NsisBuilder.java:55-57``): hex of
  ``0x10000 | familyId`` with the two low bytes swapped
  (``tmpId[3:5] + tmpId[1:3]``).
- .nsi script skeleton (``NsisBuilder.writeDefines/writeAddedFiles/
  writeRemovedFiles``): defines block, per-map File/Delete lines,
  optional index (mdr/mdx) and TYP entries.
- gmapi ``Info.xml`` (``GmapiBuilder.writeXmlFile``): the MapProduct
  document with name, ID pair and sub-map entries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def nsis_reg_id(family_ids: np.ndarray) -> pd.Series:
    """Byte-swapped low-16-bit hex id, vectorized."""
    fid = np.asarray(family_ids, np.int64) & 0xFFFF
    lo = fid & 0xFF
    hi = (fid >> 8) & 0xFF
    return (
        pd.Series(lo).map("{:02x}".format) + pd.Series(hi).map("{:02x}".format)
    )


def nsis_script(
    family_name: str,
    base_filename: str,
    product_id: int,
    family_id: int,
    map_names: list[str],
    has_index: bool = False,
    typ_name: str | None = None,
) -> str:
    """The generated .nsi fragments in template order (defines, regbin,
    added files, removed files)."""
    out = [
        f'!define DEFAULT_DIR "C:\\Garmin\\Maps\\{family_name}"',
        f'!define INSTALLER_DESCRIPTION "{family_name}"',
        f'!define INSTALLER_NAME "{family_name}"',
        f'!define MAPNAME "{base_filename}"',
        f'!define PRODUCT_ID "{product_id}"',
        f'!define REG_KEY "{family_name}"',
    ]
    if has_index:
        out.append("!define INDEX")
    if typ_name:
        out.append(f'!define TYPNAME "{typ_name}"')
    rid = nsis_reg_id(np.array([family_id]))[0]
    out.append(
        '  WriteRegBin HKLM "SOFTWARE\\Garmin\\MapSource\\Families'
        f'\\${{REG_KEY}}" "ID" {rid}'
    )
    out.append('  File "${MAPNAME}.img"')
    if has_index:
        out.append('  File "${MAPNAME}_mdr.img"')
        out.append('  File "${MAPNAME}.mdx"')
    if typ_name:
        out.append(f'  File "{typ_name}"')
    out.append('  File "${MAPNAME}.tdb"')
    for m in map_names:
        out.append(f'  File "{m}.img"')
    out.append('  Delete "$INSTDIR\\${MAPNAME}.img"')
    if has_index:
        out.append('  Delete "$INSTDIR\\${MAPNAME}_mdr.img"')
        out.append('  Delete "$INSTDIR\\${MAPNAME}.mdx"')
    if typ_name:
        out.append(f'  Delete "$INSTDIR\\{typ_name}"')
    out.append('  Delete "$INSTDIR\\${MAPNAME}.tdb"')
    for m in map_names:
        out.append(f'  Delete "$INSTDIR\\{m}.img"')
    out.append('  Delete "$INSTDIR\\Uninstall.exe"')
    return "\n".join(out) + "\n"


def gmapi_info_xml(
    family_name: str,
    product_id: int,
    family_id: int,
    sub_names: list[str],
) -> str:
    """Minimal MapProduct Info.xml (same element structure as
    ``GmapiBuilder.writeXmlFile``; hand-built, no XML lib needed)."""
    ns = "http://www.garmin.com/xmlschemas/MapProduct/v1"
    lines = [
        '<?xml version="1.0" encoding="utf-8"?>',
        f'<MapProduct xmlns="{ns}">',
        f"  <Name>{family_name}</Name>",
        f"  <ID>{family_id}</ID>",
        "  <SubProduct>",
        f"    <Name>{family_name}</Name>",
        f"    <ID>{product_id}</ID>",
    ]
    for s in sub_names:
        lines.append(f"    <Directory>{s}</Directory>")
    lines += ["  </SubProduct>", "</MapProduct>"]
    return "\n".join(lines) + "\n"


def mdx_bytes(family_id: int, product_id: int, maps) -> bytes:
    """Byte-exact MDX index writer (``imgfmt/mdxfmt/MdxFile.java``):
    little-endian header ``Midx`` + u16 100 + u32 12 + u32 count, then
    one 12-byte record per map SORTED BY HEX NAME — u32 hexname, u16
    product, u16 family, u32 mapname."""
    import struct

    out = bytearray()
    out += b"Midx"
    out += struct.pack("<HII", 100, 12, len(maps))
    for name, hexname in sorted(maps, key=lambda m: m[1]):
        out += struct.pack(
            "<IHHI", hexname & 0xFFFFFFFF, product_id & 0xFFFF,
            family_id & 0xFFFF, name & 0xFFFFFFFF,
        )
    return bytes(out)


def mps_bytes(maps, products, mapset_name: str = "OSM map set") -> bytes:
    """Byte-exact MPS writer (``imgfmt/mps/MpsFile.java`` + block
    classes): each block is [id u8][body-length u16 LE][body]; strings
    are zero-terminated. Map blocks (0x4c: product u16, family u16, map
    number u32, series\\0, description\\0, area\\0, hex number u32, u32
    0) then product blocks (0x46: product u16, family u16,
    description\\0) then the mapset block (0x56: name\\0, u8 0).
    Products are emitted sorted by (family, product) — the reference
    iterates a HashSet, so its order is unspecified."""
    import struct

    def block(bid: int, body: bytes) -> bytes:
        return struct.pack("<BH", bid, len(body)) + body

    def z(s: str) -> bytes:
        return s.encode("ascii", "replace") + b"\0"

    out = bytearray()
    for m in maps:
        body = (
            struct.pack("<HHI", m["product_id"], m["family_id"],
                        m["map_number"])
            + z(m.get("series", "OSM map"))
            + z(m.get("description", ""))
            + z(m.get("area", ""))
            + struct.pack("<II", m["hex_number"], 0)
        )
        out += block(0x4C, body)
    for p in sorted(products, key=lambda p: (p["family_id"], p["product_id"])):
        body = struct.pack(
            "<HH", p["product_id"], p["family_id"]
        ) + z(p.get("description", ""))
        out += block(0x46, body)
    out += block(0x56, z(mapset_name) + b"\0")
    return bytes(out)


def tdb_bytes(
    family_id: int,
    product_id: int,
    series_name: str,
    family_name: str,
    overview: dict,
    details: list[dict],
    copyrights: list[dict] = (),
    product_version: int = 100,
    code_page: int = 1252,
    tdb_version: int = 407,
    enable_profile: int = 0,
) -> bytes:
    """Byte-exact TDB writer (``tdbfmt/TdbFile.java`` + block classes,
    v4.07): the same [id u8][len u16 LE][body] framing as MPS. Header
    0x50, copyright 0x44 (code u8, where u8, extra u16, text\\0),
    overview 0x42 (map number, parent, max/min lat/lon as u32 LE,
    description\\0), detail 0x4c (overview body + n+1/n u16s, sub-file
    sizes u32, the 0xff00c301 marker + 3 zero bytes, sub-file
    names\\0)."""
    import struct

    def block(bid: int, body: bytes) -> bytes:
        return struct.pack("<BH", bid, len(body)) + body

    def z(s: str) -> bytes:
        return s.encode("ascii", "replace") + b"\0"

    head = (
        struct.pack("<HHH", product_id, family_id, tdb_version)
        + z(series_name)
        + struct.pack("<H", product_version)
        + z(family_name)
        # v4.07 fixed tail (HeaderBlock.java:74-103)
        + bytes([0, 0x12, 1, 1, 1])
        + struct.pack("<I", 0)
        + bytes([0, 0x18])
        + struct.pack("<IIII", 0, 0, 0, 0)
        + b"\0\0\0"  # write3(0)
        + struct.pack("<II", code_page, 10000)
        + bytes([1, 1 if enable_profile == 1 else 0, 0])
    )
    out = bytearray(block(0x50, head))
    if copyrights:
        body = b"".join(
            bytes([c.get("code", 0), c.get("where", 1)])
            + struct.pack("<H", c.get("extra", 0))
            + z(c["text"])
            for c in copyrights
        )
        out += block(0x44, body)

    def ov_body(m: dict) -> bytes:
        return struct.pack(
            "<IIiiii",
            m["map_number"],
            m.get("parent", 0),
            m["max_lat"],
            m["max_lon"],
            m["min_lat"],
            m["min_lon"],
        ) + z(m.get("description", ""))

    out += block(0x42, ov_body(overview))
    for d in details:
        subs = d.get("sub_files", [])
        body = ov_body(d)
        body += struct.pack("<HH", len(subs) + 1, len(subs))
        for name, size in subs:
            body += struct.pack("<I", size)
        body += struct.pack("<I", 0xFF00C301) + b"\0\0\0"
        for name, size in subs:
            body += z(name)
        out += block(0x4C, body)
    return bytes(out)
