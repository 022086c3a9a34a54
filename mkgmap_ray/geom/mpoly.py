"""Multipolygon ring classification: containment matrix → outer/inner
roles + nesting.

Mirrors ``reader/osm/MultiPolygonRelation.createContainsMatrix`` /
``contains`` (``MultiPolygonRelation.java:1365-1498``): rings at even
containment depth are OUTER, odd depth are INNER (holes), each inner is
attached to its immediate (deepest-containing) outer. Containment of
non-intersecting rings is decided by vertex point-in-polygon tests (the
reference intersects precomputed java.awt Areas; for the well-formed
non-crossing rings the relation contract requires, all-vertices-inside
is equivalent — crossing rings are reported, not guessed).

Hole CUTTING (``MultiPolygonCutter``, turning outer+holes into simple
polygons) is a round-2 item; this module exposes the net signed area
(outer − holes) that the cutter preserves.
"""

from __future__ import annotations

import numpy as np

from .pip import points_in_polygon
from .polyfilters import signed_area2


def ring_contains_ring(outer, inner) -> bool:
    """True when every vertex of ``inner`` lies inside ``outer`` (both
    (lat, lon) arrays, open or closed rings)."""
    ola, olo = outer
    ila, ilo = inner
    return bool(points_in_polygon(ila, ilo, ola, olo).all())


def contains_matrix(rings) -> np.ndarray:
    """(n, n) bool: [i, j] = ring i contains ring j (i ≠ j). Equal-area
    self-containment is excluded; a ring pair where each "contains" the
    other (identical rings) is reported as neither."""
    n = len(rings)
    m = np.zeros((n, n), dtype=bool)
    for i in range(n):
        for j in range(n):
            if i != j and ring_contains_ring(rings[i], rings[j]):
                m[i, j] = True
    # identical rings would contain each other: treat as siblings
    both = m & m.T
    m &= ~both
    return m


def classify_rings(rings):
    """→ list of dicts: ``{depth, role ('outer'|'inner'), parent}`` per
    ring; parent is the immediate containing ring index (-1 for top-level
    outers; inners point at their outer)."""
    m = contains_matrix(rings)
    depth = m.sum(axis=0)  # number of rings containing ring j
    out = []
    for j in range(len(rings)):
        containers = np.nonzero(m[:, j])[0]
        parent = -1
        if len(containers):
            # immediate parent = the container contained by all others
            parent = int(containers[np.argmax(depth[containers])])
        role = "outer" if depth[j] % 2 == 0 else "inner"
        out.append({"depth": int(depth[j]), "role": role, "parent": parent})
    return out


def net_area2(rings) -> int:
    """Twice the net enclosed area: |outer areas| − |hole areas| +
    nested-island areas — computed as Σ |area|·(+1 at even depth, −1 at
    odd depth). The quantity the hole cutter preserves."""
    cls = classify_rings(rings)
    total = 0
    for ring, c in zip(rings, cls):
        a = abs(signed_area2(ring[0], ring[1]))
        total += a if c["depth"] % 2 == 0 else -a
    return int(total)


def cut_holes(outer: tuple[np.ndarray, np.ndarray],
              holes: list[tuple[np.ndarray, np.ndarray]]):
    """Cut inner rings into the outer shape (``MultiPolygonCutter``
    analogue): each hole is connected to the current boundary by a
    zero-width bridge at the closest vertex pair (deterministic
    smallest-index tie-break), traversed opposite to the outer
    orientation so the bridge contributes no area and the result's
    signed area is outer − Σ holes.

    Returns one (lat, lon) int ring with
    ``len(outer) + Σ (len(hole) + 2)`` vertices. Assumes holes are
    disjoint and strictly inside the outer ring (the multipolygon
    contract); bridges to the nearest vertex can cross for pathological
    concave inputs — the reference's full Area-subtraction covers those.
    """
    ola = list(map(int, outer[0]))
    olo = list(map(int, outer[1]))
    outer_ccw = signed_area2(np.asarray(ola), np.asarray(olo)) > 0
    for hla_a, hlo_a in holes:
        hla = list(map(int, hla_a))
        hlo = list(map(int, hlo_a))
        hole_ccw = signed_area2(np.asarray(hla), np.asarray(hlo)) > 0
        if hole_ccw == outer_ccw:  # hole must run opposite to outer
            hla.reverse()
            hlo.reverse()
        o_lat = np.asarray(ola, np.int64)
        o_lon = np.asarray(olo, np.int64)
        h_lat = np.asarray(hla, np.int64)
        h_lon = np.asarray(hlo, np.int64)
        d2 = (
            (o_lat[:, None] - h_lat[None, :]) ** 2
            + (o_lon[:, None] - h_lon[None, :]) ** 2
        )
        flat = int(np.argmin(d2))  # ties: smallest (i, j)
        i, j = divmod(flat, len(hla))
        nh = len(hla)
        bridge_la = [hla[(j + k) % nh] for k in range(nh)] + [hla[j], ola[i]]
        bridge_lo = [hlo[(j + k) % nh] for k in range(nh)] + [hlo[j], olo[i]]
        ola = ola[: i + 1] + bridge_la + ola[i + 1 :]
        olo = olo[: i + 1] + bridge_lo + olo[i + 1 :]
    return np.asarray(ola, np.int64), np.asarray(olo, np.int64)
