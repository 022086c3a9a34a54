"""Per-tile routing graph build (the NET/NOD analogue).

Mirrors the road-network semantics of the reference:

- routing NODES are coordinates where roads meet (the ``highwayCount``
  ≥ 2 rule, ``StyledConverter.setHighwayCounts``) plus every road's
  endpoints (``wayBBoxes``/CoordNode creation in
  ``StyledConverter.java:117,133-134``);
- node ids are assigned DETERMINISTICALLY by sorting node coordinates
  (lat, lon) and enumerating — the engine's replacement for the
  reference's ``nextNodeId`` arrival-order counter (SURVEY.md §7.3
  "global sequential ids");
- ARCS connect consecutive routing nodes along each road
  (``RoadNetwork.addRoad``);
- connected components via union-find expose isolated sub-networks
  (``StyledConverter.findUnconnectedRoads``,
  ``StyledConverter.java:2065``: roads not reachable from the rest are
  reported/removed).

Runs group-local per tile (group sizes bounded by the subdivision
limits); the parallel axis is the tile count.
"""

from __future__ import annotations

import numpy as np


def build_road_graph(roads: list[tuple[np.ndarray, np.ndarray]]):
    """``roads``: list of (lat, lon) polylines. Returns a dict with

    - ``node_id_of``: {(lat, lon) -> id} for every routing node,
    - ``arcs``: sorted list of (id_a, id_b) with a < b, one per road
      stretch between consecutive routing nodes (deduplicated),
    - ``n_components`` / ``largest_component`` over the arc graph
      (isolated roads are their own component — findUnconnectedRoads),
    - ``arc_checksum``: Σ (8·min_id + max_id), an order-independent
      integer face for oracle checks.
    """
    use_count: dict[tuple[int, int], int] = {}
    endpoints: set[tuple[int, int]] = set()
    for la, lo in roads:
        seen_in_road = set()
        for y, x in zip(map(int, la), map(int, lo)):
            p = (y, x)
            if p not in seen_in_road:  # a road touching a point twice
                use_count[p] = use_count.get(p, 0) + 1
                seen_in_road.add(p)
        if len(la):
            endpoints.add((int(la[0]), int(lo[0])))
            endpoints.add((int(la[-1]), int(lo[-1])))
    nodes = sorted(
        p for p, c in use_count.items() if c >= 2 or p in endpoints
    )
    node_id_of = {p: i for i, p in enumerate(nodes)}

    arcs: set[tuple[int, int]] = set()
    for la, lo in roads:
        prev = None
        for y, x in zip(map(int, la), map(int, lo)):
            nid = node_id_of.get((int(y), int(x)))
            if nid is None:
                continue
            if prev is not None and prev != nid:
                arcs.add((min(prev, nid), max(prev, nid)))
            prev = nid

    # union-find over arcs
    parent = list(range(len(nodes)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in arcs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_sizes: dict[int, int] = {}
    for i in range(len(nodes)):
        r = find(i)
        comp_sizes[r] = comp_sizes.get(r, 0) + 1
    return {
        "node_id_of": node_id_of,
        "arcs": sorted(arcs),
        "n_nodes": len(nodes),
        "n_arcs": len(arcs),
        "n_components": len(comp_sizes),
        "largest_component": max(comp_sizes.values(), default=0),
        "arc_checksum": sum(8 * a + b for a, b in arcs),
    }
