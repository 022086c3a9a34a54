"""Ordered OSM reading-hook chain.

Reference: ``reader/osm/OsmMapDataSource.java:66-78`` — "attention, the
order of the hooks is important!". The chain (subset implemented here, in
reference order):

1. per-element callbacks (``OsmReadingHooksChain.onAddWay``), which fire
   at parse time BEFORE any ``end()`` hook:
   - ``HighwayHooks.onAddWay`` (HighwayHooks.java:134-176): roundabouts
     without ``oneway`` get ``oneway=yes``;
2. ``MultiPolygonFinishHook.end()`` (MultiPolygonFinishHook.java:33-53):
   delete every tag listed in the ``mkgmap:removetags`` value
   (';'-separated), then the marker tag itself;
3. ``LinkDestinationHook.end()`` (LinkDestinationHook.java:90-170):
   ``*_link`` highways resolve a destination hint through the cascade
   destination → destination:lanes (if lane-unspecific, i.e. no '|') →
   destination:lanes:forward/backward (by oneway direction) →
   destination:forward/backward → destination:street, recording which
   source produced it;
4. ``ResidentialHook.end()`` (ResidentialHook.java:51-137): closed
   landuse=residential ways become boundaries named by NameFinder (or
   "yes" when unnamed — e.g. when an EARLIER hook removed the name);
   every other element inside one gains ``mkgmap:residential``.

Each hook is a vectorized whole-batch transform over the wide-column ways
table; the chain is one fused ``map_batches`` pass per hook (no shuffles —
residential boundaries are a broadcast small side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

LINK_TYPES = frozenset(
    {"motorway_link", "trunk_link", "primary_link", "secondary_link",
     "tertiary_link"}
)

_ONEWAY_YES = frozenset({"yes", "true", "1"})
_ONEWAY_REV = frozenset({"-1", "reverse"})


def highway_on_add_way(df: pd.DataFrame) -> pd.DataFrame:
    """``HighwayHooks.onAddWay``: ways with a highway tag (or route=ferry)
    tagged ``junction=roundabout`` but no ``oneway`` get ``oneway=yes``."""
    df = df.copy()
    has_hw = df["highway"].notna()
    if "route" in df.columns:
        has_hw |= df["route"] == "ferry"
    hit = has_hw & (df["junction"] == "roundabout") & df["oneway"].isna()
    df.loc[hit, "oneway"] = "yes"
    return df


def multipolygon_finish(df: pd.DataFrame, removable: tuple[str, ...]) -> pd.DataFrame:
    """``MultiPolygonFinishHook.end()``: delete the tags named in
    ``mkgmap:removetags`` (';'-separated), then the marker itself.
    ``removable`` enumerates the tag columns that may appear in the list
    (the wide-column analogue of arbitrary tag names)."""
    df = df.copy()
    rt = df["mkgmap:removetags"]
    has = rt.notna()
    if has.any():
        lists = rt[has].str.split(";")
        for col in removable:
            kill = lists.map(lambda xs, c=col: c in xs)
            idx = kill[kill].index
            if len(idx):
                df.loc[idx, col] = None
    df["mkgmap:removetags"] = None
    return df


def link_destination(df: pd.DataFrame) -> pd.DataFrame:
    """``LinkDestinationHook`` destination cascade for ``*_link`` highways
    (LinkDestinationHook.java:98-170): adds ``mkgmap:dest_hint_work`` and
    ``mkgmap:dest_source``. All columns optional (missing = absent tag)."""
    df = df.copy()

    def col(name: str) -> pd.Series:
        if name in df.columns:
            return df[name]
        return pd.Series([None] * len(df), index=df.index, dtype=object)

    oneway = col("oneway")
    fwd = oneway.isin(_ONEWAY_YES)
    bwd = ~fwd & oneway.isin(_ONEWAY_REV)

    dest = col("destination")
    lanes = col("destination:lanes")
    lanes_f = col("destination:lanes:forward")
    lanes_b = col("destination:lanes:backward")
    dest_f = col("destination:forward")
    dest_b = col("destination:backward")
    street = col("destination:street")

    directed_dest = dest_f.where(fwd, dest_b.where(bwd, None))
    directed_lanes = lanes_f.where(fwd, lanes_b.where(bwd, None))
    directed_src = np.where(fwd, "forward", np.where(bwd, "backward", ""))

    # cascade (vectorized mirror of the tag-priority ladder)
    hint = dest.copy()
    src = pd.Series(np.where(dest.notna(), "destination", None),
                    index=df.index, dtype=object)

    # destination:lanes (possibly the directed variant), only if no '|'
    use_lanes = hint.isna()
    lt = lanes.where(lanes.notna(), directed_lanes)
    lt_src = np.where(
        lanes.notna(), "destination:lanes",
        np.char.add("destination:lanes:", directed_src.astype(str)),
    )
    lane_ok = use_lanes & lt.notna() & ~lt.str.contains(r"\|", na=False)
    hint = hint.where(~lane_ok, lt)
    src = src.where(~lane_ok, pd.Series(lt_src, index=df.index))

    use_dir = hint.isna() & directed_dest.notna()
    hint = hint.where(~use_dir, directed_dest)
    src = src.where(
        ~use_dir,
        pd.Series(np.char.add("destination:", directed_src.astype(str)),
                  index=df.index),
    )

    use_street = hint.isna() & street.notna()
    hint = hint.where(~use_street, street)
    src = src.where(~use_street, "destination:street")

    is_link = df["highway"].isin(LINK_TYPES)
    df["mkgmap:dest_hint_work"] = hint.where(is_link, None)
    df["mkgmap:dest_source"] = src.where(is_link & hint.notna(), None)
    return df


class ResidentialTagger:
    """``ResidentialHook.end()`` as a broadcast-small-side stage: the
    residential boundary list (id, name-or-"yes", box) is built once and
    shipped via ``ray.put``; each batch point-in-box tests vectorized.
    Ties resolve to the smallest boundary id (deterministic)."""

    GRID_SHIFT = 12  # 4096-unit cells: boxes overlap only a few cells

    def __init__(self, bounds_ref):
        import ray

        if isinstance(bounds_ref, ray.ObjectRef):
            bounds_ref = ray.get(bounds_ref)
        bid, name, y0, y1, x0, x1 = bounds_ref
        order = np.argsort(bid)
        self.bid = bid[order]
        self.name = np.asarray(name, object)[order]
        self.y0, self.y1 = y0[order], y1[order]
        self.x0, self.x1 = x0[order], x1[order]
        # bucket boundary boxes by covered grid cell (once per actor);
        # bucket lists stay in ascending-id order so argmax = min id
        sh = self.GRID_SHIFT
        self.buckets: dict[int, np.ndarray] = {}
        tmp: dict[int, list[int]] = {}
        for i in range(len(self.bid)):
            for cy in range(int(self.y0[i]) >> sh, (int(self.y1[i]) >> sh) + 1):
                for cx in range(int(self.x0[i]) >> sh, (int(self.x1[i]) >> sh) + 1):
                    tmp.setdefault((cy << 20) | cx, []).append(i)
        self.buckets = {c: np.asarray(v, np.int64) for c, v in tmp.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if not len(self.bid) or not len(df):
            df["mkgmap:residential"] = None
            return df
        wy = df["wy"].to_numpy(np.int64)
        wx = df["wx"].to_numpy(np.int64)
        res = np.full(len(df), None, object)
        sh = self.GRID_SHIFT
        cell = ((wy >> sh) << 20) | (wx >> sh)
        order = np.argsort(cell, kind="stable")
        i, n = 0, len(order)
        while i < n:
            j = i
            key = int(cell[order[i]])
            while j < n and cell[order[j]] == key:
                j += 1
            rows = order[i:j]
            i = j
            cand = self.buckets.get(key)
            if cand is None:
                continue
            inside = (
                (wy[rows, None] >= self.y0[None, cand])
                & (wy[rows, None] <= self.y1[None, cand])
                & (wx[rows, None] >= self.x0[None, cand])
                & (wx[rows, None] <= self.x1[None, cand])
            )
            hit = inside.any(axis=1)
            first = inside.argmax(axis=1)
            res[rows[hit]] = self.name[cand[first[hit]]]
        # landuse=residential areas never tag themselves
        if "landuse" in df.columns:
            res[(df["landuse"] == "residential").to_numpy()] = None
        df["mkgmap:residential"] = res
        return df


# --- UnusedElementsRemoverHook ------------------------------------------------


def unused_nodes_mask(has_tags, lat, lon, bbox, poi_tag_present=None):
    """``UnusedElementsRemoverHook.end`` node pass
    (``reader/osm/UnusedElementsRemoverHook.java:63-97``): drop tagless
    nodes; drop out-of-bbox nodes unless they carry a POI-placement tag
    (those may anchor an area-to-POI later). ``bbox`` = (min_lat,
    min_lon, max_lat, max_lon), containment inclusive."""
    lat = np.asarray(lat, np.int64)
    lon = np.asarray(lon, np.int64)
    inb = (
        (lat >= bbox[0]) & (lat <= bbox[2])
        & (lon >= bbox[1]) & (lon <= bbox[3])
    )
    keep = np.asarray(has_tags, bool) & inb
    if poi_tag_present is not None:
        keep |= np.asarray(has_tags, bool) & np.asarray(poi_tag_present, bool)
    return keep


def unused_ways_mask(has_tags, lat0, lon0, lat1, lon1, bbox):
    """``UnusedElementsRemoverHook.end`` way pass (java:100-154) for
    segment rows: drop tagless ways; keep a way iff an endpoint lies in
    the bbox, the segment INTERSECTS the bbox (the same Liang-Barsky
    kernel the clip stage uses), or the way's own bbox CONTAINS the tile
    bbox (the generate-sea=polygon case). Multi-point ways pass one row
    per segment; OR the masks per way id upstream."""
    from ..geom.clip import clip_segments_np

    lat0 = np.asarray(lat0, np.int64)
    lon0 = np.asarray(lon0, np.int64)
    lat1 = np.asarray(lat1, np.int64)
    lon1 = np.asarray(lon1, np.int64)
    in0 = (
        (lat0 >= bbox[0]) & (lat0 <= bbox[2])
        & (lon0 >= bbox[1]) & (lon0 <= bbox[3])
    )
    in1 = (
        (lat1 >= bbox[0]) & (lat1 <= bbox[2])
        & (lon1 >= bbox[1]) & (lon1 <= bbox[3])
    )
    hit, *_ = clip_segments_np(lon0, lat0, lon1, lat1, bbox)
    wb_contains = (
        (np.minimum(lat0, lat1) <= bbox[0])
        & (np.maximum(lat0, lat1) >= bbox[2])
        & (np.minimum(lon0, lon1) <= bbox[1])
        & (np.maximum(lon0, lon1) >= bbox[3])
    )
    return np.asarray(has_tags, bool) & (in0 | in1 | hit | wb_contains)


# ``RoutingHook`` (``reader/osm/RoutingHook.java:30-49``) contributes only
# its used-tag set to the ingest projection — the restriction tags must
# survive ``keep_tags_filter`` even when no style rule reads them, because
# the restriction join consumes them later.
ROUTING_HOOK_USED_TAGS = frozenset(
    {
        "except",
        "restriction",
        "restriction:foot",
        "restriction:hgv",
        "restriction:motorcar",
        "restriction:vehicle",
        "restriction:motor_vehicle",
        "restriction:bicycle",
        "restriction:bus",
    }
)
