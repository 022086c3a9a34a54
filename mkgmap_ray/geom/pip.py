"""Point-in-polygon tests (ray casting / winding), the kernel under the
engine's PIP join (reference: ``reader/osm/boundary/BoundaryQuadTree`` +
``LocationHook.java:120-239``, which use java.awt.geom.Area containment).

Boundary-inclusive even-odd ray casting on integer hp coordinates; exact
integer arithmetic (no floating point) so results are reproducible and match
a SQL half-plane oracle.
"""

from __future__ import annotations

import numpy as np


def points_in_polygon(
    p_lat: np.ndarray,
    p_lon: np.ndarray,
    ring_lat: np.ndarray,
    ring_lon: np.ndarray,
) -> np.ndarray:
    """Vectorized even-odd test of many points against one ring.

    Points exactly on an edge count as inside. Ring may be open or closed.
    Exact int64 arithmetic (cross products), crossing rule: edge straddles
    the horizontal ray through p in the half-open sense (min_lat <= p_lat <
    max_lat handled via the (ay > py) != (by > py) formulation).
    """
    px = np.asarray(p_lon, dtype=np.int64)[:, None]
    py = np.asarray(p_lat, dtype=np.int64)[:, None]
    rl = np.asarray(ring_lat, dtype=np.int64)
    rn = np.asarray(ring_lon, dtype=np.int64)
    if len(rl) >= 2 and rl[0] == rl[-1] and rn[0] == rn[-1]:
        rl, rn = rl[:-1], rn[:-1]
    ay, ax = rl[None, :], rn[None, :]
    by, bx = np.roll(rl, -1)[None, :], np.roll(rn, -1)[None, :]

    # on-edge test: collinear and within bbox of the edge
    cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    on_edge = (
        (cross == 0)
        & (px >= np.minimum(ax, bx))
        & (px <= np.maximum(ax, bx))
        & (py >= np.minimum(ay, by))
        & (py <= np.maximum(ay, by))
    ).any(axis=1)

    straddle = (ay > py) != (by > py)
    # x coordinate of edge at py compared to px, exact: sign of
    # (bx-ax)*(py-ay) - (px-ax)*(by-ay) relative to sign of (by-ay)
    num = (bx - ax) * (py - ay) - (px - ax) * (by - ay)
    den_pos = (by - ay) > 0
    crossing = straddle & (np.where(den_pos, num, -num) > 0)
    inside = (crossing.sum(axis=1) % 2).astype(bool)
    return inside | on_edge


def point_in_polygon(lat: int, lon: int, ring_lat, ring_lon) -> bool:
    return bool(
        points_in_polygon(
            np.asarray([lat]), np.asarray([lon]), ring_lat, ring_lon
        )[0]
    )


def points_in_rings(p_lat, p_lon, rings: list[tuple[np.ndarray, np.ndarray]]):
    """Even-odd over multiple rings (outer + holes): inside iff inside an odd
    number of rings — mirrors java.awt.geom.Area's even-odd winding used by
    ``Java2DConverter`` polygons."""
    acc = np.zeros(len(np.asarray(p_lat)), dtype=np.int64)
    for ring_lat, ring_lon in rings:
        acc += points_in_polygon(p_lat, p_lon, ring_lat, ring_lon)
    return (acc % 2).astype(bool)
