"""Merge operators: endpoint line merging + ring assembly (group-local).

- ``merge_lines``: mirror of ``filters/LineMergeFilter.java:59-117`` —
  sequential greedy merge in input order: a line whose END equals an
  existing line's START is prepended to it (then the other end may fuse
  two chains), else a line whose START equals an existing line's END is
  appended; roads are passed through. The reference runs this per tile;
  here it runs inside ``groupby(cell, type).map_groups`` so groups (≤
  subdivision-sized) execute in parallel across cells.

- ``join_ways``: mirror of ``MultiPolygonRelation.joinWays``
  (``reader/osm/MultiPolygonRelation.java:182-380``): repeatedly join
  member ways at shared end points until no more joins are possible;
  closed results are rings.

Both are deliberately per-group sequential Python: the reference
semantics are order-dependent greedy (not a canonical union-find), and
group sizes are bounded by the subdivision limits, so the parallel axis
is the number of groups.
"""

from __future__ import annotations

import numpy as np


def merge_lines(lines: list[tuple[np.ndarray, np.ndarray]],
                mergeable: list[bool] | None = None):
    """Merge polylines sharing endpoints, in input order.

    ``lines``: list of (lat, lon) int arrays. ``mergeable``: False marks
    road-like lines that pass through unmerged (``line.isRoad()``).
    Returns (merged list of (lat, lon), out_of_in) where ``out_of_in[i]``
    is the output index each input line ended up in (-1 for dropped-into).
    """
    merged: list[tuple[list[int], list[int]]] = []
    alive: list[bool] = []
    start_pts: dict[tuple[int, int], list[int]] = {}
    end_pts: dict[tuple[int, int], list[int]] = {}

    def key(la, lo, i):
        return (int(la[i]), int(lo[i]))

    def add_map(d, k, idx):
        d.setdefault(k, []).append(idx)

    def remove_map(d, k, idx):
        lst = d.get(k)
        if lst and idx in lst:
            lst.remove(idx)

    def add_line(la, lo):
        idx = len(merged)
        merged.append((list(map(int, la)), list(map(int, lo))))
        alive.append(True)
        add_map(start_pts, (merged[idx][0][0], merged[idx][1][0]), idx)
        add_map(end_pts, (merged[idx][0][-1], merged[idx][1][-1]), idx)
        return idx

    for li, (la, lo) in enumerate(lines):
        if mergeable is not None and not mergeable[li]:
            add_line(la, lo)
            continue
        start = key(la, lo, 0)
        end = key(la, lo, len(la) - 1)

        cands = [i for i in start_pts.get(end, []) if alive[i]]
        if cands:
            # line's END meets line2's START → prepend our points
            j = cands[0]
            la2, lo2 = merged[j]
            remove_map(start_pts, (la2[0], lo2[0]), j)
            merged[j] = (list(map(int, la[:-1])) + la2,
                         list(map(int, lo[:-1])) + lo2)
            add_map(start_pts, (merged[j][0][0], merged[j][1][0]), j)
            # other end: our START may close onto an existing line's END
            for i in end_pts.get(start, []):
                if alive[i] and i != j:
                    # mergeLines(line1=i, line2=j): i's points go before j
                    la1, lo1 = merged[i]
                    remove_map(start_pts, (la1[0], lo1[0]), i)
                    remove_map(end_pts, (la1[-1], lo1[-1]), i)
                    remove_map(start_pts, (merged[j][0][0], merged[j][1][0]), j)
                    merged[j] = (la1[:-1] + merged[j][0],
                                 lo1[:-1] + merged[j][1])
                    add_map(start_pts, (merged[j][0][0], merged[j][1][0]), j)
                    alive[i] = False
                    break
            continue

        cands = [i for i in end_pts.get(start, []) if alive[i]]
        if cands:
            # line's START meets line2's END → append our points
            j = cands[0]
            la2, lo2 = merged[j]
            remove_map(end_pts, (la2[-1], lo2[-1]), j)
            merged[j] = (la2 + list(map(int, la[1:])),
                         lo2 + list(map(int, lo[1:])))
            add_map(end_pts, (merged[j][0][-1], merged[j][1][-1]), j)
            continue

        add_line(la, lo)

    return [
        (np.asarray(la, np.int64), np.asarray(lo, np.int64))
        for (la, lo), ok in zip(merged, alive) if ok
    ]


def join_ways(ways: list[tuple[np.ndarray, np.ndarray]]):
    """Join ways end-to-end until stable (``MultiPolygonRelation.joinWays``
    semantics: repeatedly fuse a way pair sharing an end point, reversing
    one when needed). Returns list of (lat, lon, closed)."""
    items = [
        (list(map(int, la)), list(map(int, lo))) for la, lo in ways
    ]
    changed = True
    while changed:
        changed = False
        for i in range(len(items)):
            la1, lo1 = items[i]
            if (la1[0], lo1[0]) == (la1[-1], lo1[-1]) and len(la1) > 1:
                continue  # already closed
            for j in range(i + 1, len(items)):
                la2, lo2 = items[j]
                if (la2[0], lo2[0]) == (la2[-1], lo2[-1]) and len(la2) > 1:
                    continue
                e1 = (la1[-1], lo1[-1])
                s1 = (la1[0], lo1[0])
                s2 = (la2[0], lo2[0])
                e2 = (la2[-1], lo2[-1])
                if e1 == s2:
                    items[i] = (la1 + la2[1:], lo1 + lo2[1:])
                elif e1 == e2:
                    items[i] = (la1 + la2[-2::-1], lo1 + lo2[-2::-1])
                elif s1 == e2:
                    items[i] = (la2 + la1[1:], lo2 + lo1[1:])
                elif s1 == s2:
                    items[i] = (la2[::-1] + la1[1:], lo2[::-1] + lo1[1:])
                else:
                    continue
                del items[j]
                changed = True
                break
            if changed:
                break
    return [
        (
            np.asarray(la, np.int64),
            np.asarray(lo, np.int64),
            len(la) > 1 and (la[0], lo[0]) == (la[-1], lo[-1]),
        )
        for la, lo in items
    ]


# --- road merging (RoadMerger semantics) ------------------------------------


def _hp_to_radians(hp):
    # Coord.hpToRadians: hp units are 2^30 per 360 degrees
    return np.float64(hp) * (2.0 * np.pi / (1 << 30))


def bearing_rhumb(lat1_hp, lon1_hp, lat2_hp, lon2_hp) -> float:
    """Rhumb-line bearing in degrees (``Coord.bearingToOnRhumbLine``,
    ``Coord.java:580-594``) — exact atan2 instead of the reference's
    ``atan2_approximation`` (sub-degree difference; only feeds the 130°
    merge threshold and best-angle selection)."""
    lat1 = _hp_to_radians(lat1_hp)
    lat2 = _hp_to_radians(lat2_hp)
    d_lon = _hp_to_radians(lon2_hp) - _hp_to_radians(lon1_hp)
    if abs(d_lon) > np.pi:
        d_lon = -(2 * np.pi - d_lon) if d_lon > 0 else (2 * np.pi + d_lon)
    delta_phi = np.log(
        np.tan(lat2 / 2 + np.pi / 4) / np.tan(lat1 / 2 + np.pi / 4)
    )
    return float(np.arctan2(d_lon, delta_phi) * 180.0 / np.pi)


def get_angle(c1, c2, c3) -> float:
    """``Utils.getAngle``: deflection angle at c2 between segments
    (c1,c2) and (c2,c3); each c is (lat_hp, lon_hp)."""
    a = bearing_rhumb(c2[0], c2[1], c1[0], c1[1])
    b = bearing_rhumb(c2[0], c2[1], c3[0], c3[1])
    angle = b - (a - 180)
    while angle > 180:
        angle -= 360
    while angle < -180:
        angle += 360
    return angle


MAX_MERGE_ANGLE = 130.0  # RoadMerger.java:48


def merge_roads(roads, restricted: set | None = None):
    """Merge connected roads with identical routing attributes
    (``osmstyle/RoadMerger.merge``, ``RoadMerger.java:270-345``):

    per shared point, among (roads ENDING here) × (roads STARTING here)
    pick the mergeable pair with the smallest |deflection angle|
    (attributes equal, not closing a loop, angle ≤ 130°, point not
    restricted), merge road2 into road1 (road1's identity wins), repeat
    until stable; result ordered by original index.

    ``roads``: list of (lat_hp array, lon_hp array, attrs) — ``attrs`` is
    any hashable (road class/speed/access/flags/labels bundle; equality
    is the merge precondition). ``restricted``: set of (lat, lon) merge
    points to skip (restriction-relation via points).
    """
    restricted = restricted or set()
    items = {
        i: (list(map(int, la)), list(map(int, lo)), attrs)
        for i, (la, lo, attrs) in enumerate(roads)
    }

    def s_key(i):
        la, lo, _ = items[i]
        return (la[0], lo[0])

    def e_key(i):
        la, lo, _ = items[i]
        return (la[-1], lo[-1])

    # endpoint maps maintained across merges (RoadMerger.startPoints /
    # endPoints MultiMaps) — keeps each queue step O(local degree)
    starts: dict[tuple[int, int], set[int]] = {}
    ends: dict[tuple[int, int], set[int]] = {}
    for i in items:
        starts.setdefault(s_key(i), set()).add(i)
        ends.setdefault(e_key(i), set()).add(i)

    queue = []
    for i in sorted(items):
        queue.append(s_key(i))
        queue.append(e_key(i))
    seen_done: set = set()
    qi = 0
    while qi < len(queue):
        point = queue[qi]
        qi += 1
        if point in seen_done or point in restricted:
            continue
        end_roads = sorted(ends.get(point, ()))
        start_roads = sorted(starts.get(point, ()))
        best = None
        best_angle = float("inf")
        for i in end_roads:
            la1, lo1, a1 = items[i]
            for j in start_roads:
                if i == j:
                    continue
                la2, lo2, a2 = items[j]
                if a1 != a2:
                    continue
                if (la1[0], lo1[0]) == (la2[-1], lo2[-1]):
                    continue  # would create a closed way
                angle = abs(get_angle(
                    (la1[-2], lo1[-2]), (point[0], point[1]),
                    (la2[1], lo2[1]),
                ))
                if angle > MAX_MERGE_ANGLE:
                    continue
                if angle < best_angle:
                    best_angle = angle
                    best = (i, j)
        if best is None:
            seen_done.add(point)
            continue
        i, j = best
        la1, lo1, a1 = items[i]
        la2, lo2, _ = items[j]
        ends[(la1[-1], lo1[-1])].discard(i)
        starts[(la2[0], lo2[0])].discard(j)
        ends[(la2[-1], lo2[-1])].discard(j)
        items[i] = (la1 + la2[1:], lo1 + lo2[1:], a1)
        del items[j]
        ends.setdefault(e_key(i), set()).add(i)
        seen_done.discard(point)
        queue.append(e_key(i))  # new endpoint may enable further merges
    return [
        (np.asarray(la, np.int64), np.asarray(lo, np.int64), attrs)
        for idx, (la, lo, attrs) in sorted(items.items())
    ]


def merge_shapes(shapes: list[tuple[np.ndarray, np.ndarray]]):
    """Merge same-type polygons sharing a common edge
    (``filters/ShapeMergeFilter.java`` semantics subset: two rings with an
    opposite-directed shared edge splice into one ring; repeat until
    stable; the spliced boundary preserves total signed area —
    ``calcAreaSizeTestVal`` invariant).

    ``shapes``: list of (lat, lon) open int rings with consistent
    orientation. Returns the merged list of (lat, lon) numpy rings
    (greedy, input-order deterministic like the reference's loop).
    """
    rings: list[tuple[list[int], list[int]] | None] = [
        (list(map(int, la)), list(map(int, lo))) for la, lo in shapes
    ]

    def strip_spikes(la: list[int], lo: list[int]):
        # remove zero-width spikes (v, w, v) introduced by multi-edge
        # sharing, wrap-around included
        changed = True
        while changed and len(la) >= 3:
            changed = False
            n = len(la)
            for i in range(n):
                p, q = (i - 1) % n, (i + 1) % n
                if la[p] == la[q] and lo[p] == lo[q]:
                    drop = sorted({i, q}, reverse=True)
                    for d in drop:
                        del la[d]
                        del lo[d]
                    changed = True
                    break
        return la, lo

    merged_any = True
    while merged_any:
        merged_any = False
        # directed edge -> (ring, pos) for all live rings
        edge_at: dict[tuple[int, int, int, int], tuple[int, int]] = {}
        for ri, ring in enumerate(rings):
            if ring is None:
                continue
            la, lo = ring
            n = len(la)
            for i in range(n):
                j = (i + 1) % n
                edge_at[(la[i], lo[i], la[j], lo[j])] = (ri, i)
        for (p_lat, p_lon, q_lat, q_lon), (ri, i) in edge_at.items():
            rev = edge_at.get((q_lat, q_lon, p_lat, p_lon))
            if rev is None or rev[0] == ri:
                continue
            rj, j = rev
            if rings[ri] is None or rings[rj] is None:
                continue
            ala, alo = rings[ri]
            bla, blo = rings[rj]
            nb = len(bla)
            # splice: a[0..i] + b's long way from p to q + a[i+1..]
            mid_la = [bla[(j + 1 + k) % nb] for k in range(1, nb - 1)]
            mid_lo = [blo[(j + 1 + k) % nb] for k in range(1, nb - 1)]
            new_la = ala[: i + 1] + mid_la + ala[i + 1 :]
            new_lo = alo[: i + 1] + mid_lo + alo[i + 1 :]
            rings[ri] = strip_spikes(new_la, new_lo)
            rings[rj] = None
            merged_any = True
            break
    return [
        (np.asarray(la, np.int64), np.asarray(lo, np.int64))
        for ring in rings if ring is not None
        for la, lo in [ring]
    ]
