"""Coastline assembly (``reader/osm/SeaGenerator.java:818-1407``).

Semantics mirrored:

- coastline ways join END→START only (direction is significant: OSM
  coastline convention keeps LAND on the LEFT of travel; the reference
  never reverses coastline segments when concatenating shorelines);
- chains that close are islands (counter-clockwise, land ring) or lakes
  (clockwise, water ring);
- open chains must enter and leave at the tile border; they are closed
  by walking the border COUNTER-CLOCKWISE from the exit point back to
  the entry point (inserting the corners passed), which encloses exactly
  the land-left region — the reference's land-polygon closure;
- chains ending off-border are reported as incomplete (the reference
  logs/repairs these against precomputed sea tiles; the precomp lookup
  face lives in ``queries.q_sea_lookup``).

Runs group-local per tile (``groupby(tile).map_groups``): a tile's
coastline segment set is bounded by the subdivision limits.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.area import Area
from ..geom.polyfilters import signed_area2


def _border_t(lat: int, lon: int, b: Area) -> float | None:
    """Perimeter parameter of a border point, counter-clockwise from the
    SW corner: south edge (west→east), east edge (south→north), north
    edge (east→west), west edge (north→south). None if not on border."""
    if lat == b.min_lat and b.min_lon <= lon <= b.max_lon:
        return lon - b.min_lon
    w = b.max_lon - b.min_lon
    h = b.max_lat - b.min_lat
    if lon == b.max_lon and b.min_lat <= lat <= b.max_lat:
        return w + (lat - b.min_lat)
    if lat == b.max_lat and b.min_lon <= lon <= b.max_lon:
        return w + h + (b.max_lon - lon)
    if lon == b.min_lon and b.min_lat <= lat <= b.max_lat:
        return 2 * w + h + (b.max_lat - lat)
    return None


def _corners_ccw(b: Area) -> list[tuple[int, int, float]]:
    """(lat, lon, t) of the four corners in ccw order."""
    w = b.max_lon - b.min_lon
    h = b.max_lat - b.min_lat
    return [
        (b.min_lat, b.max_lon, float(w)),
        (b.max_lat, b.max_lon, float(w + h)),
        (b.max_lat, b.min_lon, float(2 * w + h)),
        (b.min_lat, b.min_lon, float(2 * w + 2 * h)),
    ]


def close_shoreline(la: np.ndarray, lo: np.ndarray, bounds: Area):
    """Close an open shoreline whose endpoints lie on the tile border by
    walking the border ccw from the EXIT (last) point back to the ENTRY
    (first) point, appending passed corners. Returns the closed (lat,
    lon) ring (land polygon, ccw) or None when an endpoint is off-border.
    """
    t_entry = _border_t(int(la[0]), int(lo[0]), bounds)
    t_exit = _border_t(int(la[-1]), int(lo[-1]), bounds)
    if t_entry is None or t_exit is None:
        return None
    perim = 2 * (bounds.max_lon - bounds.min_lon) + 2 * (
        bounds.max_lat - bounds.min_lat
    )
    out_la = list(map(int, la))
    out_lo = list(map(int, lo))
    # distance ccw from exit to each corner; take corners before entry
    gap = (t_entry - t_exit) % perim
    corners = sorted(
        (
            ((t - t_exit) % perim, cla, clo)
            for cla, clo, t in _corners_ccw(bounds)
        ),
    )
    for d, cla, clo in corners:
        if 0 < d < gap:
            out_la.append(cla)
            out_lo.append(clo)
    return np.asarray(out_la, np.int64), np.asarray(out_lo, np.int64)


def assemble_coastline(segments, bounds: Area):
    """``segments``: list of (lat, lon) directed polylines. Returns a dict:

    - ``islands`` / ``lakes``: closed rings (ccw = land, cw = water);
    - ``land_polys``: land polygons from border-closed open shorelines;
    - ``n_incomplete``: open chains with an endpoint off the border;
    - ``land_area2``: Σ area2(land_polys) + Σ area2(islands)
      − Σ area2(lakes) — the flood-fill invariant.
    """
    # directed chaining: map chain-start -> chain index, join end→start
    chains = [
        (list(map(int, la)), list(map(int, lo))) for la, lo in segments
    ]
    start_of: dict[tuple[int, int], int] = {}
    alive = [True] * len(chains)
    for i, (cla, clo) in enumerate(chains):
        start_of[(cla[0], clo[0])] = i
    changed = True
    while changed:
        changed = False
        for i, (cla, clo) in enumerate(chains):
            if not alive[i]:
                continue
            end = (cla[-1], clo[-1])
            if end == (cla[0], clo[0]):
                continue  # closed
            j = start_of.get(end)
            if j is None or j == i or not alive[j]:
                continue
            jla, jlo = chains[j]
            del start_of[(jla[0], jlo[0])]
            cla.extend(jla[1:])
            clo.extend(jlo[1:])
            alive[j] = False
            changed = True
    islands, lakes, land_polys = [], [], []
    n_incomplete = 0
    for i, (cla, clo) in enumerate(chains):
        if not alive[i]:
            continue
        la = np.asarray(cla, np.int64)
        lo = np.asarray(clo, np.int64)
        if cla[0] == cla[-1] and clo[0] == clo[-1]:
            ring = (la[:-1], lo[:-1])
            if signed_area2(ring[0], ring[1]) > 0:
                islands.append(ring)
            else:
                lakes.append(ring)
            continue
        closed = close_shoreline(la, lo, bounds)
        if closed is None:
            n_incomplete += 1
        else:
            land_polys.append(closed)
    area2 = (
        sum(abs(signed_area2(*r)) for r in land_polys)
        + sum(abs(signed_area2(*r)) for r in islands)
        - sum(abs(signed_area2(*r)) for r in lakes)
    )
    return {
        "islands": islands,
        "lakes": lakes,
        "land_polys": land_polys,
        "n_incomplete": n_incomplete,
        "land_area2": int(area2),
    }


# --- precomp-sea artifacts (PrecompSeaSaver / SeaGenerator.addPrecompSea) ----


def save_precomp_sea(states, mixed_polys, out_dir: str) -> None:
    """``PrecompSeaSaver`` analogue (``sea/optional/PrecompSeaSaver
    .java:48-180``): persist the precompiled sea index — per tile key
    either a uniform verdict ("sea"/"land") or a pointer to that tile's
    sea polygons — so map runs load only the tiles they touch
    (``SeaGenerator.addPrecompSea``, ``SeaGenerator.java:571-694``).

    ``states``: dict cell_key -> 0 sea / 1 land / 2 mixed.
    ``mixed_polys``: dict cell_key -> list of (lat array, lon array)
    sea rings for mixed tiles. Parquet replaces the index.txt.gz +
    per-tile .osm.gz files; the key->verdict/pointer structure is the
    same.
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    keys = sorted(states)
    verdict = [int(states[k]) for k in keys]
    idx = pa.table(
        {
            "cell": pa.array(keys, pa.int64()),
            "state": pa.array(verdict, pa.int8()),
        }
    )
    pq.write_table(idx, f"{out_dir}/index.parquet")
    cell_col, ring_col, lat_col, lon_col = [], [], [], []
    for k in keys:
        for ri, (la, lo) in enumerate(mixed_polys.get(k, ())):
            cell_col.append(k)
            ring_col.append(ri)
            lat_col.append(np.asarray(la, np.int64).tolist())
            lon_col.append(np.asarray(lo, np.int64).tolist())
    polys = pa.table(
        {
            "cell": pa.array(cell_col, pa.int64()),
            "ring": pa.array(ring_col, pa.int64()),
            "lat": pa.array(lat_col, pa.list_(pa.int64())),
            "lon": pa.array(lon_col, pa.list_(pa.int64())),
        }
    )
    pq.write_table(polys, f"{out_dir}/polys.parquet", row_group_size=1024)


class PrecompSeaIndex:
    """Lazy reader: the (tiny) index loads once per actor; mixed-tile
    polygons load per touched cell with a cache — the access pattern of
    ``SeaGenerator.addPrecompSea`` reading one sea_<key> file per
    intersecting tile."""

    def __init__(self, art_dir: str):
        import pyarrow.parquet as pq

        self.dir = art_dir
        idx = pq.read_table(f"{art_dir}/index.parquet")
        self.states = dict(
            zip(
                np.asarray(idx["cell"], np.int64).tolist(),
                np.asarray(idx["state"], np.int8).tolist(),
            )
        )
        self.cache: dict[int, list] = {}

    def state(self, cell: int) -> int:
        return self.states.get(int(cell), -1)

    def sea_rings(self, cell: int):
        import pyarrow.parquet as pq

        cell = int(cell)
        if cell not in self.cache:
            t = pq.read_table(
                f"{self.dir}/polys.parquet", filters=[("cell", "=", cell)]
            )
            self.cache[cell] = [
                (
                    np.asarray(t["lat"][i].as_py(), np.int64),
                    np.asarray(t["lon"][i].as_py(), np.int64),
                )
                for i in range(t.num_rows)
            ]
        return self.cache[cell]


def close_gaps(chains, max_gap: int, bounds: Area | None = None):
    """``SeaGenerator.closeGaps`` (reader/osm/SeaGenerator.java:
    closeGaps loop, ``--generate-sea=close-gaps=NUM``): repeatedly take
    the first OPEN chain whose end is not on the tile boundary, find the
    chain whose START point is nearest to that end (boundary starts and
    closed chains excluded), and if the gap is below ``max_gap`` append
    that chain's points and record a bridge segment — restarting the
    scan after every merge, exactly like the reference's
    ``while (changed)`` / ``break`` shape.

    ``chains``: list of (lat array, lon array) in map units;
    ``max_gap`` in map units (the reference measures metres — same
    semantics, different unit). Returns (merged chains, bridges) where
    bridges are ((lat1, lon1), (lat2, lon2)) pairs — the reference's
    ``natural=mkgmap:coastline-gap`` marker ways."""
    ways = [
        (list(map(int, la)), list(map(int, lo))) for la, lo in chains
    ]
    bridges: list[tuple[tuple[int, int], tuple[int, int]]] = []

    def is_closed(w):
        return (
            len(w[0]) > 1
            and w[0][0] == w[0][-1] and w[1][0] == w[1][-1]
        )

    def on_boundary(lat, lon):
        if bounds is None:
            return False
        return (
            lat in (bounds.min_lat, bounds.max_lat)
            or lon in (bounds.min_lon, bounds.max_lon)
        )

    lim2 = max_gap * max_gap
    changed = True
    while changed:
        changed = False
        for i, w1 in enumerate(ways):
            if is_closed(w1):
                continue
            e = (w1[0][-1], w1[1][-1])
            if on_boundary(*e):
                continue
            best = -1
            best_d2 = None
            for j, w2 in enumerate(ways):
                if i == j or is_closed(w2):
                    continue
                s = (w2[0][0], w2[1][0])
                if on_boundary(*s):
                    continue
                d2 = (e[0] - s[0]) ** 2 + (e[1] - s[1]) ** 2
                if best_d2 is None or d2 < best_d2:
                    best_d2 = d2
                    best = j
            if best >= 0 and best_d2 < lim2:
                s = (ways[best][0][0], ways[best][1][0])
                bridges.append((e, s))
                w1[0].extend(ways[best][0])
                w1[1].extend(ways[best][1])
                del ways[best]
                changed = True
                break
    out = [
        (np.asarray(la, np.int64), np.asarray(lo, np.int64))
        for la, lo in ways
    ]
    return out, bridges
