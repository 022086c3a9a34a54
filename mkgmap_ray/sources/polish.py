"""Polish (cGPSmapper ``.mp``) text format source.

Faithful subset of ``reader/polish/PolishMapDataSource.java``: INI-like
sections ``[POI]`` / ``[POLYLINE]`` / ``[POLYGON]`` … ``[END]`` with
``key=value`` lines; ``Type=0x..`` (``Integer.decode`` semantics: 0x/0
prefixes), ``Label=``, and ``DataN=(lat,lon),(lat,lon)…`` coordinate
lists in degrees (``coordsFromString``/``makeCoord``,
``PolishMapDataSource.java:421-431``), converted with the reference's
``toMapUnit``. ``DataN``'s N is the map level. Unknown keys are kept as
extra attributes (count surfaced as ``n_extra``).

Ray source: files are the parallelism unit (``read_binary_files`` +
per-file parse), like the OSM XML source.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .osmxml import to_degrees, to_map_unit

KIND_OF_SECTION = {"POI": 0, "RGN10": 0, "RGN20": 0,
                   "POLYLINE": 1, "RGN40": 1,
                   "POLYGON": 2, "RGN80": 2}

_COORD_RE = re.compile(r"\(?\s*(-?[0-9.]+)\s*,\s*(-?[0-9.]+)\s*\)?")


def _coords_from_string(value: str):
    lats, lons = [], []
    for m in _COORD_RE.finditer(value):
        lats.append(float(m.group(1)))
        lons.append(float(m.group(2)))
    return lats, lons


def parse_mp_text(text: str) -> pa.Table:
    """→ elements table: ``kind:int8`` (0 point / 1 line / 2 shape),
    ``type:int32``, ``label:string``, ``level:int32``, ``lat_mu`` /
    ``lon_mu`` (list<int64>), ``n_extra:int32``."""
    kind = None
    cur: dict | None = None
    rows: list[dict] = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith(";"):
            continue
        if line.startswith("[") and line.endswith("]"):
            name = line[1:-1].strip()
            if name.upper() == "END":
                if cur is not None and cur["lats"]:
                    rows.append(cur)
                cur = None
                kind = None
            else:
                kind = KIND_OF_SECTION.get(name.upper())
                cur = (
                    {"kind": kind, "type": 0, "label": "", "level": 0,
                     "lats": [], "lons": [], "n_extra": 0}
                    if kind is not None else None
                )
            continue
        if cur is None or "=" not in line:
            continue
        key, value = line.split("=", 1)
        key = key.strip()
        value = value.strip()
        if key == "Type":
            cur["type"] = int(value, 0)  # Integer.decode
        elif key == "SubType":
            sub = int(value, 0)
            if cur["type"] <= 0xFF:
                cur["type"] = (cur["type"] << 8) | sub
        elif key == "Label":
            cur["label"] = value
        elif key.startswith("Data") or key.startswith("Origin"):
            m = re.match(r"(?:Data|Origin)(\d+)", key)
            cur["level"] = int(m.group(1)) if m else 0
            lats, lons = _coords_from_string(value)
            # multiple Data lines concatenate (PolishMapDataSource:399)
            cur["lats"].extend(lats)
            cur["lons"].extend(lons)
        else:
            cur["n_extra"] += 1
    return pa.table(
        {
            "kind": pa.array([r["kind"] for r in rows], pa.int8()),
            "type": pa.array([r["type"] for r in rows], pa.int32()),
            "label": pa.array([r["label"] for r in rows], pa.string()),
            "level": pa.array([r["level"] for r in rows], pa.int32()),
            "lat_mu": pa.array(
                [to_map_unit(np.asarray(r["lats"])).tolist() for r in rows],
                pa.list_(pa.int64()),
            ),
            "lon_mu": pa.array(
                [to_map_unit(np.asarray(r["lons"])).tolist() for r in rows],
                pa.list_(pa.int64()),
            ),
            "n_extra": pa.array([r["n_extra"] for r in rows], pa.int32()),
        }
    )


_SECTION_OF_KIND = {0: "POI", 1: "POLYLINE", 2: "POLYGON"}


def write_mp(path: str, elements: list[dict]) -> None:
    """Deterministic ``.mp`` fixture writer. Each element:
    ``{kind, type, label, level, lat_mu: [...], lon_mu: [...]}``."""
    with open(path, "w") as f:
        f.write("[IMG ID]\nID=1\nName=fixture\n[END-IMG ID]\n\n")
        for el in elements:
            f.write(f"[{_SECTION_OF_KIND[el['kind']]}]\n")
            f.write(f"Type=0x{el['type']:x}\n")
            if el.get("label"):
                f.write(f"Label={el['label']}\n")
            lat = to_degrees(np.asarray(el["lat_mu"]))
            lon = to_degrees(np.asarray(el["lon_mu"]))
            coords = ",".join(
                f"({la:.9f},{lo:.9f})" for la, lo in zip(lat, lon)
            )
            f.write(f"Data{el.get('level', 0)}={coords}\n")
            f.write("[END]\n\n")


def read_mp(paths: list[str]):
    """Ray Data source: .mp files → elements Dataset."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            parse_mp_text(payload.as_py().decode("utf-8", "replace"))
            for payload in batch["bytes"]
        ]
        return pa.concat_tables(tables) if tables else parse_mp_text("")

    return rd.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=None
    )
