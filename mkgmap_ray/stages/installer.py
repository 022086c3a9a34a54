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
