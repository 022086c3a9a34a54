"""Style application as an actor-pool map_batches stage.

The reference compiles the style once and shares it across every element
of a tile (``osmstyle/StyledConverter.java:89-182``); here the compiled
``RuleSet`` is built once per actor in ``__init__`` (or passed pre-built
via ``ray.put``), and ``__call__`` runs the vectorized rule program over
each batch's tag columns.

Geometry style functions (``osmstyle/function/``): when the batch has
``lat_hp``/``lon_hp`` list columns, ``length()``, ``area_size()`` and
``is_closed()`` pseudo-tag columns are computed vectorized (flat-array
reduceat over the list offsets) and injected for the predicates.
Tag-only functions (``maxspeed()``) derive inside ``RuleSet.apply``.

Typed ``continue`` rules that re-match an already-typed row emit EXTRA
map elements (one per typed match, ``RuleSet.java:79-110``); the stage
materializes them as duplicate output rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geom.coords import DELTA_SHIFT
from ..style import compile_style
from ..style.rules import finder_name


def geometry_function_columns(batch: pa.Table) -> dict[str, pd.Series]:
    """length() / area_size() / is_closed() from hp list geometry columns
    — all three via one pass over the flattened vertex arrays."""
    lat = batch["lat_hp"].combine_chunks()
    lon = batch["lon_hp"].combine_chunks()
    n = len(lat)
    off = lat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    y = np.asarray(lat.values, np.float64) / (1 << DELTA_SHIFT)  # map units
    x = np.asarray(lon.values, np.float64) / (1 << DELTA_SHIFT)
    counts = off[1:] - off[:-1]

    length = np.zeros(n, np.float64)
    area2 = np.zeros(n, np.float64)
    closed = np.zeros(n, bool)
    if len(y) > 1:
        dy = np.diff(y)
        dx = np.diff(x)
        seg = np.sqrt(dy * dy + dx * dx)
        cross = x[:-1] * y[1:] - x[1:] * y[:-1]
        valid = np.ones(len(seg), bool)
        valid[off[1:-1] - 1] = False  # pairs straddling a row boundary
        nonempty = counts > 0
        if nonempty.any():
            starts = off[:-1][nonempty]
            # reduceat needs starts < len(seg); clamp and zero afterwards
            safe = np.minimum(starts, max(len(seg) - 1, 0))
            ls = np.add.reduceat(seg * valid, safe)
            cs = np.add.reduceat(cross * valid, safe)
            one = counts[nonempty] <= 1
            ls[one] = 0.0
            cs[one] = 0.0
            length[nonempty] = ls
            # wrap term closes the ring for the shoelace
            last = off[1:][nonempty] - 1
            first = off[:-1][nonempty]
            cs += x[last] * y[first] - x[first] * y[last]
            cs[one] = 0.0
            area2[nonempty] = cs
            closed[nonempty] = (
                (y[last] == y[first]) & (x[last] == x[first])
                & (counts[nonempty] >= 3)
            )
    elif len(y) == 1:
        closed[counts > 0] = False

    def fmt(v):
        return pd.Series(
            [f"{val:g}" for val in v], dtype="string"
        )

    return {
        "length()": fmt(length),
        "area_size()": fmt(np.abs(area2) / 2.0),
        "is_closed()": pd.Series(
            np.where(closed, "true", "false"), dtype="string"
        ),
    }


class StyleApply:
    """map_batches callable: tag columns in → gtype/resolution/name out.

    ``tag_columns`` maps style tag name → input column name, the
    column-pruned equivalent of the reference's used-tags projection.
    ``name_tag_list``: NameFinder priority list filling unset labels.
    """

    def __init__(self, style_text: str, tag_columns: dict[str, str],
                 keep: list[str] | None = None,
                 name_tag_list: tuple[str, ...] | None = None):
        self.ruleset = compile_style(style_text)
        self.tag_columns = tag_columns
        self.keep = keep or []
        self.name_tag_list = name_tag_list

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        tags = {
            tag: batch[col].to_pandas().astype("string")
            for tag, col in self.tag_columns.items()
        }
        if "lat_hp" in batch.column_names and "lon_hp" in batch.column_names:
            tags.update(geometry_function_columns(batch))
        res = self.ruleset.apply(tags, n)
        name = res["name"]
        if self.name_tag_list is not None:
            fallback = finder_name(res["tags"], n, self.name_tag_list)
            name = name.mask(name.isna(), fallback)
        out = {c: batch[c] for c in self.keep}
        out["gtype"] = pa.array(res["gtype"], pa.int32())
        out["resolution"] = pa.array(res["resolution"], pa.int32())
        out["matched_rule"] = pa.array(res["matched_rule"], pa.int32())
        out["name"] = pa.Array.from_pandas(name, type=pa.string())
        table = pa.table(out)
        if res["extra"]:
            extras = []
            for rows, gtype, resolution, ri in res["extra"]:
                t = {
                    c: table[c].take(pa.array(rows)) for c in self.keep
                }
                m = len(rows)
                t["gtype"] = pa.array(
                    np.full(m, gtype, np.int32), pa.int32()
                )
                t["resolution"] = pa.array(
                    np.full(m, resolution, np.int32), pa.int32()
                )
                t["matched_rule"] = pa.array(
                    np.full(m, ri, np.int32), pa.int32()
                )
                t["name"] = table["name"].take(pa.array(rows))
                extras.append(pa.table(t))
            table = pa.concat_tables([table, *extras])
        return table


def apply_style(ds, style_text: str, tag_columns: dict[str, str],
                keep: list[str] | None = None,
                name_tag_list: tuple[str, ...] | None = None, **kw):
    from ..util import stateful_map_batches

    return stateful_map_batches(
        ds, StyleApply,
        fn_kwargs=dict(
            style_text=style_text, tag_columns=tag_columns, keep=keep,
            name_tag_list=name_tag_list,
        ),
        batch_format="pyarrow",
        batch_size=None,
        **kw,
    )


def apply_overlays(ds, overlays: dict[int, tuple[int, ...]],
                   gtype_col: str = "gtype"):
    """``OverlayReader`` 1→N (``osmstyle/OverlayReader.java``): a styled
    element whose type has an overlay list is replaced by one element per
    overlaid type, in list order — a vectorized flat-map (index build via
    np.repeat, no per-row Python)."""
    if not overlays:
        return ds
    max_g = max(overlays) + 1
    fan = np.ones(max_g, np.int64)
    repl: dict[int, np.ndarray] = {}
    for g, outs in overlays.items():
        fan[g] = len(outs)
        repl[g] = np.asarray(outs, np.int64)

    def fn(batch: pa.Table) -> pa.Table:
        g = np.asarray(
            batch[gtype_col].combine_chunks().cast(pa.int64()), np.int64
        )
        counts = np.where((g >= 0) & (g < max_g), fan[np.minimum(g, max_g - 1)], 1)
        idx = np.repeat(np.arange(len(g)), counts)
        new_g = g[idx].copy()
        # position within each fan-out group
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        pos = np.arange(len(idx)) - np.repeat(starts, counts)
        for src, outs in repl.items():
            m = g[idx] == src
            new_g[m] = outs[pos[m]]
        out = batch.take(pa.array(idx))
        col_i = out.column_names.index(gtype_col)
        return out.set_column(
            col_i, gtype_col, pa.array(new_g.astype(np.int32), pa.int32())
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


# explicit access tags stripped from the synthesized way
# (StyledConverter.makeCycleWay, StyledConverter.java:549-571)
_CYCLEWAY_STRIP = (
    "foot", "motorcar", "goods", "hgv", "bus", "taxi", "emergency",
    "vehicle", "motor_vehicle", "carpool", "motorcycle", "psv", "truck",
)


def make_cycle_ways(df: pd.DataFrame) -> pd.DataFrame:
    """``makeCycleWay`` 1→2 flat-map over a tag-columns frame
    (``StyledConverter.java:352-357,549-571``): rows tagged
    ``mkgmap:make-cycle-way=yes`` emit a synthesized copy with
    access=no, bicycle=yes, oneway=no, mkgmap:synthesised=yes and the
    explicit access tags removed; the ORIGINAL gets bicycle=no and
    loses the trigger tag."""
    trig = df.get("mkgmap:make-cycle-way")
    if trig is None:
        return df
    m = (trig == "yes").fillna(False)
    if not m.any():
        return df
    orig = df.copy()
    orig.loc[m, "mkgmap:make-cycle-way"] = pd.NA
    if "bicycle" not in orig.columns:
        orig["bicycle"] = pd.Series([pd.NA] * len(orig), dtype="string")
    orig.loc[m, "bicycle"] = "no"
    cyc = df[m].copy()
    cyc["mkgmap:make-cycle-way"] = pd.NA
    for col, val in (("access", "no"), ("bicycle", "yes"),
                     ("oneway", "no"), ("mkgmap:synthesised", "yes")):
        cyc[col] = val
    for col in _CYCLEWAY_STRIP:
        if col in cyc.columns:
            cyc[col] = pd.NA
    out = pd.concat([orig, cyc], ignore_index=True)
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype("string")
    return out
