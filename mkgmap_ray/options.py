"""mkgmap command-line option surface (``doc/options.txt`` +
``main/CommandArgsReader.java`` semantics).

The reference's UX is 100+ ``--name[=value]`` options, ``-c file``
config files (one ``name[=value]`` or ``name: value`` per line, no
leading dashes), positional input files, and a handful of alias options
that rewrite into canonical ones (``--latin1`` → ``code-page=1252``,
``--unicode`` → ``code-page=65001``, ``--drive-on-left/right`` →
``drive-on``). Options apply to the input files that FOLLOW them on the
command line (CommandArgsReader processes arguments in order); this
parser keeps that order contract by snapshotting the option state per
input file.

``to_engine_config`` maps the parsed surface onto the engine's knobs
(style dir, code page / label encoder, level table, sea options, job
count) — the subset the Ray engine consumes; unknown and experimental
``--x-*`` options are retained verbatim so pipelines can read them.
"""

from __future__ import annotations

import os

# options that take no value (presence = "1"); everything else is
# name=value (a missing =value also coerces to "1", as the reference's
# EnhancedProperties does)
FLAG_OPTIONS = {
    "gmapsupp", "gmapi", "nsis", "tdbfile", "verbose", "version",
    "route", "net", "index", "split-name-index", "housenumbers",
    "make-poi-index", "make-all-cycleways", "make-cycleways",
    "make-opposite-cycleways", "link-pois-to-ways", "add-pois-to-areas",
    "add-pois-to-lines", "check-roundabouts", "check-roundabout-flares",
    "ignore-builtin-relations", "ignore-fixme-values",
    "ignore-maxspeeds", "ignore-osm-bounds", "ignore-turn-restrictions",
    "preserve-element-order", "remove-ovm-work-files",
    "report-dead-ends", "report-similar-arcs", "road-name-pois",
    "order-by-decreasing-area", "lower-case", "keep-going",
    "transparent", "latin1", "unicode", "cycle-map", "list-styles",
    "check-styles", "hide-gmapsupp-on-pc", "drive-on-left",
    "drive-on-right", "poi-address", "process-destination",
    "process-exits", "show-profiles", "merge-lines",
    "add-boundary-nodes-at-admin-boundaries", "help",
}

DEFAULTS = {
    "mapname": "63240001",
    "description": "OSM map",
    "country-name": "COUNTRY",
    "country-abbr": "ABC",
    "levels": "0:24, 1:22, 2:20, 3:18",
    "overview-levels": "",
    "max-jobs": "",
    "drive-on": "detect",
    "code-page": "0",
}

_ALIASES = {
    "latin1": ("code-page", "1252"),
    "unicode": ("code-page", "65001"),
    "drive-on-left": ("drive-on", "left"),
    "drive-on-right": ("drive-on", "right"),
    "style-file": ("style-file", None),  # canonical already
}


class CommandArgs:
    """Parsed command line: ``options`` is the final option state,
    ``inputs`` the input files each paired with the option snapshot in
    effect when it appeared (the reference's ordering contract)."""

    def __init__(self):
        self.options: dict[str, str] = dict(DEFAULTS)
        self.inputs: list[tuple[str, dict]] = []

    def set(self, name: str, value: str | None) -> None:
        if name in _ALIASES and name not in ("style-file",):
            name, value = _ALIASES[name]
        if value is None:
            value = "1"
        self.options[name] = value

    def add_input(self, path: str) -> None:
        self.inputs.append((path, dict(self.options)))

    def get(self, name: str, default: str | None = None):
        return self.options.get(name, default)


def parse_args(argv: list[str]) -> CommandArgs:
    """``main/CommandArgsReader`` shape: ``--name[=value]`` options,
    ``-c file`` / ``--read-config=file`` config files, positional input
    files; later options override earlier ones, and each input file
    captures the options seen so far."""
    args = CommandArgs()
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-c":
            i += 1
            _read_config(argv[i], args)
        elif a.startswith("--"):
            name, eq, value = a[2:].partition("=")
            if name == "read-config":
                _read_config(value, args)
            elif eq:
                args.set(name, value)
            elif name in FLAG_OPTIONS or name.startswith("x-"):
                args.set(name, None)
            else:
                args.set(name, None)
        elif a.startswith("-n"):  # -n mapname shorthand
            i += 1
            args.set("mapname", argv[i])
        else:
            args.add_input(a)
        i += 1
    return args


def _read_config(path: str, args: CommandArgs) -> None:
    """Config file: one option per line, ``name=value`` or
    ``name: value``, no dashes; ``input-file`` lines add inputs; blank
    lines and ``#`` comments skipped (CommandArgsReader.readArgFile)."""
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            if "=" in line:
                name, _, value = line.partition("=")
            elif ":" in line:
                name, _, value = line.partition(":")
            else:
                name, value = line, None
            name = name.strip()
            value = value.strip() if value is not None else None
            if name == "input-file" and value:
                args.add_input(value)
            elif name == "read-config" and value:
                _read_config(
                    value if os.path.isabs(value)
                    else os.path.join(os.path.dirname(path), value),
                    args,
                )
            else:
                args.set(name, value)


def parse_generate_sea(value: str) -> dict:
    """``--generate-sea=...`` sub-option list (SeaGenerator.init):
    polygons/multipolygon/land-tag=TAG=VAL/no-sea-sectors/
    extend-sea-sectors/close-gaps=NUM/floodblocker."""
    out = {
        "mode": "polygons", "land_tag": ("natural", "land"),
        "close_gaps": 0, "floodblocker": False,
        "no_sea_sectors": False, "extend_sea_sectors": False,
    }
    if value in ("", "1"):
        return out
    for tok in value.split(","):
        tok = tok.strip()
        if tok in ("polygons", "multipolygon"):
            out["mode"] = tok
        elif tok.startswith("land-tag="):
            k, _, v = tok[len("land-tag="):].partition("=")
            out["land_tag"] = (k, v)
        elif tok.startswith("close-gaps="):
            out["close_gaps"] = int(float(tok.split("=", 1)[1]))
        elif tok == "floodblocker":
            out["floodblocker"] = True
        elif tok == "no-sea-sectors":
            out["no_sea_sectors"] = True
        elif tok == "extend-sea-sectors":
            out["extend_sea_sectors"] = True
    return out


def to_engine_config(args: CommandArgs) -> dict:
    """Map the option surface onto engine knobs."""
    from .style.loader import parse_levels
    from .stages.labelenc import code_functions

    o = args.options
    cp = o.get("code-page", "0")
    charset = {"0": "ascii", "1252": "cp1252", "65001": "unicode",
               "932": "cp932"}.get(cp, f"cp{cp}")
    fmt, codepage, encoder = code_functions(charset)
    max_jobs = o.get("max-jobs", "")
    cfg = {
        "mapname": o.get("mapname"),
        "levels": parse_levels(o.get("levels", DEFAULTS["levels"])),
        "overview_levels": (
            parse_levels(o["overview-levels"])
            if o.get("overview-levels") else []
        ),
        "label_format": fmt,
        "code_page": codepage,
        "label_encoder": encoder,
        "lower_case": o.get("lower-case") == "1",
        "drive_on": o.get("drive-on", "detect"),
        "max_jobs": int(max_jobs) if max_jobs else os.cpu_count(),
        "style": o.get("style"),
        "style_file": o.get("style-file"),
        "generate_sea": (
            parse_generate_sea(o["generate-sea"])
            if "generate-sea" in o else None
        ),
        "route": o.get("route") == "1" or o.get("net") == "1",
        "index": o.get("index") == "1",
        "order_by_decreasing_area":
            o.get("order-by-decreasing-area") == "1",
        "x_options": {k: v for k, v in o.items() if k.startswith("x-")},
    }
    return cfg
