"""Polish (cGPSmapper ``.mp``) text format source.

Full model of ``reader/polish/PolishMapDataSource.java``: INI-like
sections ``[IMG ID]`` / ``[POI]`` / ``[POLYLINE]`` / ``[POLYGON]`` …
``[END]`` with ``key=value`` lines.

- ``[IMG ID]`` header (``imgId``, ``PolishMapDataSource.java:651-682``):
  ``Levels``/``Level<N>=<bits>`` level table, ``Elevation=M`` metric
  flag, ``CodePage`` label recoding, ``LeftSideTraffic``, ``Copyright``.
- ``Type``/``SubType`` with ``Integer.decode`` semantics; SubType folds
  into the type only for points (``point()``, :356-373).
- ``Data<N>``/``Origin<N>`` coordinate lists in degrees
  (``coordsFromString``/``makeCoord``, :421-431,446-462), converted with
  the reference's ``toMapUnit``; multiple Data lines concatenate (:399).
- ``EndLevel`` + per-Data-line resolution (``setResolution`` /
  ``extractResolution``, :600-646): ``min_res`` comes from EndLevel when
  set, ``max_res`` from the Data line's level, both through the header's
  level→bits table (levels past the table clamp to its top entry).
- Common values (``isCommonValue``, :485-530): ``Label`` (unescaped +
  recoded), ``Label2``/``Label3``, ``ZipCode``/``CityName``/
  ``StreetDesc``/``HouseNumber``/``is_in``/``Phone``/``CountryName``/
  ``RegionName``.
- ``~[0x##]`` escape codes (``unescape``, :532-566) including the 6-bit
  conversions (0x1b2c → 0x1c; codes ≥ 0x2a shift down by 0x29).
- Contour elevation fix (``fixElevation``, :440-452): line types
  0x20-0x22 with a metric header get their numeric label converted to
  feet with Java int truncation.
- Road fields (``RoadHelper``): ``RoadID``, ``Nod<N>`` node indexes,
  ``RouteParam`` (speed clamp 0-7, class clamp 0-4, oneway, toll, 8
  denied-vehicle bits), ``DirIndicator``, ``Numbers<N>`` counts.

Unknown keys are kept as extra attributes (count surfaced as
``n_extra``).

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
_ESCAPE_RE = re.compile(r"~\[([^\]]*)\]")

METERS_TO_FEET = 3.2808399

# Reference default when the header declares no level table
# (PolishMapDataSource.DEFAULT_LEVELS "0:24, 1:22, 2:20, 3:18").
DEFAULT_LEVELS = (24, 22, 20, 18)


def unescape(s: str) -> str:
    """``~[0x##]`` escape decode (``PolishMapDataSource.unescape``):
    each code is one character; 0x1b2c maps to 0x1c and codes >= 0x2a
    are 6-bit format, shifted down by 0x29. Malformed codes vanish."""
    if "~[" not in s:
        return s

    def sub(m: re.Match) -> str:
        try:
            inum = int(m.group(1), 0)
        except ValueError:
            return ""
        if inum == 0x1B2C:
            inum = 0x1C
        if inum >= 0x2A:
            inum -= 0x29
        return chr(inum)

    return _ESCAPE_RE.sub(sub, s)


def _coords_from_string(value: str):
    lats, lons = [], []
    for m in _COORD_RE.finditer(value):
        lats.append(float(m.group(1)))
        lons.append(float(m.group(2)))
    return lats, lons


_STR_FIELDS = ("label", "label2", "city", "zip", "street", "house",
               "is_in", "phone", "country", "region")
_INT_FIELDS = {"endlevel": 0, "min_res": -1, "max_res": -1, "road_id": 0,
               "speed": -1, "road_class": -1, "no_access": 0, "n_nod": 0,
               "n_numbers": 0, "n_extra": 0}
_BOOL_FIELDS = ("oneway", "toll", "dir_indicator")

# RouteParam denied-vehicle order (RoadHelper.setParam:102-130)
_DENIED_BITS = 8


# NumberStyle.fromChar (imgfmt/app/net/NumberStyle.java:58-69); values
# are the engine's ODD=1 / EVEN=2 / BOTH=3 / NONE=0 convention
_STYLE_OF_CHAR = {"N": 0, "E": 2, "O": 1, "B": 3, "0": 1}


def _new_element(kind: int) -> dict:
    el = {"kind": kind, "type": 0, "level": 0, "lats": [], "lons": [],
          "nod_idx": [], "nod_ids": [], "nod_bnd": [], "hn": []}
    for f in _STR_FIELDS:
        el[f] = ""
    el.update(_INT_FIELDS)
    for f in _BOOL_FIELDS:
        el[f] = False
    return el


class _MpParser:
    """Single-pass state machine over one .mp file's text."""

    def __init__(self):
        self.levels: list[int] = list(DEFAULT_LEVELS)
        self.elev_units = ""
        self.codepage: str | None = None
        self.drive_on_left: bool | None = None
        self.copyright = ""
        self.rows: list[dict] = []
        self._cur: dict | None = None
        self._in_header = False

    # -- header ---------------------------------------------------------

    def _img_id(self, key: str, value: str) -> None:
        if key == "Levels":
            n = int(value)
            self.levels = [0] * n
        elif key.startswith("Level"):
            level = int(key[5:])
            if level < len(self.levels):
                self.levels[level] = int(value)
        elif key.startswith("Elevation"):
            if value[:1] in ("m", "M"):
                self.elev_units = "m"
        elif key == "CodePage":
            self.codepage = f"cp{value}"
        elif key.endswith("LeftSideTraffic"):
            if value == "Y":
                self.drive_on_left = True
            elif value == "N":
                self.drive_on_left = False
        elif key == "Copyright":
            self.copyright = value

    # -- helpers --------------------------------------------------------

    def _recode(self, value: str) -> str:
        """Labels are read as ISO-8859-1; a declared CodePage re-decodes
        the raw bytes (``recode``, :578-598)."""
        if self.codepage:
            try:
                return value.encode("latin-1", "replace").decode(
                    self.codepage, "replace"
                )
            except LookupError:
                return value
        return value

    def _resolution(self, level: int) -> int:
        # self.levels is indexed by level directly (the reference stores
        # the array reversed and un-reverses in extractResolution —
        # net effect: bits for level L)
        n = len(self.levels)
        if level >= n:
            level = n - 1
        return self.levels[level]

    def _set_resolution(self, el: dict, level: int) -> None:
        if el["endlevel"] > 0:
            el["min_res"] = self._resolution(el["endlevel"])
            el["max_res"] = self._resolution(level)
        else:
            el["min_res"] = el["max_res"] = self._resolution(level)

    def _fix_elevation(self, el: dict) -> None:
        """Contour label meters → feet with Java int truncation."""
        if self.elev_units == "m":
            try:
                n = int(el["label"])
            except ValueError:
                return
            el["label"] = str(int(n * METERS_TO_FEET))

    def _common(self, el: dict, key: str, value: str) -> bool:
        if key == "Label":
            el["label"] = unescape(self._recode(value))
        elif key in ("Label2", "Label3"):
            el["label2"] = unescape(self._recode(value))
        elif key in ("Levels", "EndLevel", "LevelsNumber"):
            try:
                el["endlevel"] = int(value)
            except ValueError:
                el["endlevel"] = 0
        elif key == "ZipCode":
            el["zip"] = self._recode(value)
        elif key == "CityName":
            el["city"] = self._recode(value)
        elif key == "StreetDesc":
            el["street"] = self._recode(value)
        elif key == "HouseNumber":
            el["house"] = self._recode(value)
        elif key == "is_in":
            el["is_in"] = self._recode(value)
        elif key == "Phone":
            el["phone"] = self._recode(value)
        elif key == "CountryName":
            el["country"] = unescape(self._recode(value))
        elif key == "RegionName":
            el["region"] = self._recode(value)
        else:
            return False
        return True

    def _route_param(self, el: dict, value: str) -> None:
        f = value.split(",")
        el["speed"] = min(max(int(f[0]), 0), 7)
        el["road_class"] = min(max(int(f[1]), 0), 4)
        el["oneway"] = len(f) > 2 and int(f[2]) > 0
        el["toll"] = len(f) > 3 and int(f[3]) > 0
        no_access = 0
        for j in range(min(len(f) - 4, _DENIED_BITS)):
            if int(f[4 + j]) != 0:
                no_access |= 1 << j
        el["no_access"] = no_access

    # -- per-section key handling ---------------------------------------

    def _element_key(self, el: dict, key: str, value: str) -> None:
        kind = el["kind"]
        if key == "Type":
            el["type"] = int(value, 0)  # Integer.decode
        elif kind == 0 and key == "SubType":
            sub = int(value, 0)
            if el["type"] <= 0xFF:
                el["type"] = (el["type"] << 8) | sub
        elif key.startswith("Data") or (kind == 0 and key.startswith("Origin")):
            m = re.match(r"(?:Data|Origin)(\d+)", key)
            if m is None:
                el["n_extra"] += 1
                return
            level = int(m.group(1))
            el["level"] = level
            if kind == 1 and el["type"] in (0x20, 0x21, 0x22):
                self._fix_elevation(el)
            self._set_resolution(el, level)
            lats, lons = _coords_from_string(value)
            # multiple Data lines concatenate (PolishMapDataSource:399)
            el["lats"].extend(lats)
            el["lons"].extend(lons)
        elif kind == 1 and key == "RoadID":
            el["road_id"] = int(value)
        elif kind == 1 and key.startswith("Nod"):
            # RoadHelper.addNode + NodeIndex (RoadHelper.java:78-80,
            # 201-211): point index, routing node id, boundary flag
            f = value.split(",")
            el["nod_idx"].append(int(f[0]))
            el["nod_ids"].append(int(f[1]))
            el["nod_bnd"].append(
                1 if len(f) > 2 and int(f[2]) > 0 else 0
            )
            el["n_nod"] += 1
        elif kind == 1 and key in ("RouteParam", "RouteParams"):
            self._route_param(el, value)
        elif kind == 1 and key == "DirIndicator":
            el["dir_indicator"] = int(value) > 0
        elif kind == 1 and key.startswith("Numbers"):
            # RoadHelper.addNumbers → Numbers(String) (Numbers.java:
            # 89-99): node,LStyle,LStart,LEnd,RStyle,RStart,REnd; kept
            # only when a side has a style (addNumbers, RoadHelper:189)
            f = value.split(",")
            ls = _STYLE_OF_CHAR.get(f[1][:1], 0)
            rs = _STYLE_OF_CHAR.get(f[4][:1], 0)
            if ls != 0 or rs != 0:
                el["hn"].append(
                    (int(f[0]), ls, int(f[2]), int(f[3]),
                     rs, int(f[5]), int(f[6]))
                )
            el["n_numbers"] += 1
        elif self._common(el, key, value):
            pass
        else:
            el["n_extra"] += 1

    # -- driver ---------------------------------------------------------

    def feed(self, text: str) -> None:
        for raw in text.splitlines():
            line = raw.strip()
            if not line or line.startswith(";"):
                continue
            if line.startswith("[") and line.endswith("]"):
                name = line[1:-1].strip().upper()
                if name.startswith("END"):
                    if self._cur is not None and self._cur["lats"]:
                        self.rows.append(self._cur)
                    self._cur = None
                    self._in_header = False
                elif name == "IMG ID":
                    self._in_header = True
                else:
                    kind = KIND_OF_SECTION.get(name)
                    self._cur = _new_element(kind) if kind is not None else None
                continue
            if "=" not in line:
                continue
            key, value = line.split("=", 1)
            key, value = key.strip(), value.strip()
            if self._in_header:
                self._img_id(key, value)
            elif self._cur is not None:
                self._element_key(self._cur, key, value)

    def table(self) -> pa.Table:
        rows = self.rows
        cols: dict = {
            "kind": pa.array([r["kind"] for r in rows], pa.int8()),
            "type": pa.array([r["type"] for r in rows], pa.int32()),
            "level": pa.array([r["level"] for r in rows], pa.int32()),
            "lat_mu": pa.array(
                [to_map_unit(np.asarray(r["lats"])).tolist() for r in rows],
                pa.list_(pa.int64()),
            ),
            "lon_mu": pa.array(
                [to_map_unit(np.asarray(r["lons"])).tolist() for r in rows],
                pa.list_(pa.int64()),
            ),
        }
        for f in _STR_FIELDS:
            cols[f] = pa.array([r[f] for r in rows], pa.string())
        for f in _INT_FIELDS:
            cols[f] = pa.array([r[f] for r in rows], pa.int32())
        for f in _BOOL_FIELDS:
            cols[f] = pa.array([r[f] for r in rows], pa.bool_())
        # routing-node and housenumber subsection payloads (lines only)
        cols["nod_index"] = pa.array(
            [r["nod_idx"] for r in rows], pa.list_(pa.int32()))
        cols["nod_id"] = pa.array(
            [r["nod_ids"] for r in rows], pa.list_(pa.int64()))
        cols["nod_boundary"] = pa.array(
            [r["nod_bnd"] for r in rows], pa.list_(pa.int8()))
        for i, name in enumerate(
            ("hn_node", "hn_left_style", "hn_left_start", "hn_left_end",
             "hn_right_style", "hn_right_start", "hn_right_end")
        ):
            cols[name] = pa.array(
                [[t[i] for t in r["hn"]] for r in rows],
                pa.list_(pa.int32()),
            )
        return pa.table(cols)


def parse_mp_text(text: str) -> pa.Table:
    """→ elements table: ``kind:int8`` (0 point / 1 line / 2 shape),
    ``type:int32``, ``level:int32``, ``lat_mu`` / ``lon_mu``
    (list<int64>), label/address strings, EndLevel-derived ``min_res`` /
    ``max_res``, road routing fields, ``n_extra:int32``."""
    p = _MpParser()
    p.feed(text)
    return p.table()


_SECTION_OF_KIND = {0: "POI", 1: "POLYLINE", 2: "POLYGON"}


def write_mp(path: str, elements: list[dict], header: dict | None = None) -> None:
    """Deterministic ``.mp`` fixture writer. Each element:
    ``{kind, type, label, level, lat_mu: [...], lon_mu: [...]}`` plus
    optional ``endlevel``, address fields, and road fields (``road_id``,
    ``route_param``, ``nod``, ``numbers`` lists). ``header`` may carry
    ``levels`` (list of bits by level), ``elevation`` ("M"/"F"), and
    ``codepage``."""
    header = header or {}
    with open(path, "w") as f:
        f.write("[IMG ID]\nID=1\nName=fixture\n")
        levels = header.get("levels")
        if levels:
            f.write(f"Levels={len(levels)}\n")
            for i, bits in enumerate(levels):
                f.write(f"Level{i}={bits}\n")
        if header.get("elevation"):
            f.write(f"Elevation={header['elevation']}\n")
        if header.get("codepage"):
            f.write(f"CodePage={header['codepage']}\n")
        f.write("[END-IMG ID]\n\n")
        for el in elements:
            f.write(f"[{_SECTION_OF_KIND[el['kind']]}]\n")
            f.write(f"Type=0x{el['type']:x}\n")
            if el.get("label"):
                f.write(f"Label={el['label']}\n")
            for key in ("endlevel", "city", "zip", "street", "house",
                        "phone", "country", "region"):
                if el.get(key):
                    tag = {"endlevel": "EndLevel", "city": "CityName",
                           "zip": "ZipCode", "street": "StreetDesc",
                           "house": "HouseNumber", "phone": "Phone",
                           "country": "CountryName", "region": "RegionName",
                           }[key]
                    f.write(f"{tag}={el[key]}\n")
            if el.get("road_id"):
                f.write(f"RoadID={el['road_id']}\n")
            if el.get("route_param"):
                f.write(f"RouteParam={el['route_param']}\n")
            if el.get("dir_indicator"):
                f.write("DirIndicator=1\n")
            for i, nod in enumerate(el.get("nod", ())):
                f.write(f"Nod{i + 1}={nod}\n")
            for i, num in enumerate(el.get("numbers", ())):
                f.write(f"Numbers{i + 1}={num}\n")
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
            parse_mp_text(payload.as_py().decode("latin-1"))
            for payload in batch["bytes"]
        ]
        return pa.concat_tables(tables) if tables else parse_mp_text("")

    return rd.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=None
    )
