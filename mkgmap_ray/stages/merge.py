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
