"""Rounding-artifact repair (``osmstyle/WrongAngleFixer.java``).

Rounding high-precision coordinates to map units (<2 m grid) can turn an
almost-straight line into a zigzag when adjacent points round in
opposite directions; the reference fixes these by MOVING points to a
better rounded position or REMOVING them, coordinating through shared
``Coord`` identity so connected roads stay connected
(``WrongAngleFixer`` class doc; MAX_BEARING_ERROR = 15°,
``optimizeWays`` pass loop at ``WrongAngleFixer.java:265-310``).

Engine form, group-local per tile:

- decisions are made PER COORDINATE (the hp (lat, lon) key is the
  engine's replacement for Coord object identity, SURVEY.md §7.3), so a
  move applies consistently to every line sharing the point;
- MULTI-PASS like the reference (``maxPass = 20``): each pass
  recomputes bearing errors from the current positions and only
  re-examines still-bad points; moves are tried first, removals only
  when no move helps; iteration stops when a pass changes nothing;
- move: a bad coordinate's rounded position may shift to one of the
  four neighbor grid positions if that reduces the summed bearing
  error of all adjacent segments (across all lines through it);
- remove: an interior, unshared point whose rounded angle error still
  exceeds tolerance after the move passes and whose removal reduces it
  is dropped (never on roundabouts — see below);
- roundabouts (``WrongAngleFixer.java:364-371``): adjacent point pairs
  on a roundabout where both points are shared with other ways are
  "bad merge candidates" — they must never collapse to one position
  (that would merge roundabout exits), and roundabout points are never
  removed. 2-point ways likewise never merge to a single point.

Also covered: the spike/overlap extra pass (``WrongAngleFixer.java:
730-734`` extra remove; ``:996-1009`` extra move) — an interior point
whose neighbours round to the same Garmin position is removed when
unshared, else collapsed onto the duplicated position unless the pair
is a bad-merge candidate. Still out of scope: the restriction-relation
bookkeeping.
"""

from __future__ import annotations

import numpy as np

MAX_BEARING_ERROR_DEG = 15.0
MAX_BEARING_ERROR_HALF = MAX_BEARING_ERROR_DEG / 2
MAX_PASS = 20
_COLLAPSE_PENALTY = MAX_BEARING_ERROR_DEG * 4


def _bearings(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Planar segment bearings in degrees (n-1 values)."""
    return np.degrees(
        np.arctan2(np.diff(lon).astype(float), np.diff(lat).astype(float))
    )


def _angle_err(a, b):
    d = np.abs(np.asarray(a, float) - np.asarray(b, float)) % 360.0
    return np.minimum(d, 360.0 - d)


def _bear(p, q) -> float:
    return float(np.degrees(np.arctan2(q[1] - p[1], q[0] - p[0])))


def _alt_positions(p, cur, shift_bits: int):
    """``Coord.getAlternativePositions`` (``Coord.java:714-745``): the
    neighbour grid positions that are also acceptable roundings of the hp
    coordinate ``p`` given its current rounded position ``cur`` — each
    axis offers the adjacent map unit only when the rounding residual
    exceeds ``MAX_DELTA = 1 << (DELTA_SHIFT - 2)`` (``Coord.java:57``)."""
    max_delta = 1 << (shift_bits - 2)
    dlat = (cur[0] << shift_bits) - p[0]
    dlon = (cur[1] << shift_bits) - p[1]
    mlat = cur[0] - 1 if dlat > max_delta else (
        cur[0] + 1 if dlat < -max_delta else cur[0]
    )
    mlon = cur[1] - 1 if dlon > max_delta else (
        cur[1] + 1 if dlon < -max_delta else cur[1]
    )
    alts = []
    if mlat != cur[0]:
        if mlon != cur[1]:
            alts.append((mlat, mlon))
        alts.append((mlat, cur[1]))
    if mlon != cur[1]:
        alts.append((cur[0], mlon))
    return alts


def fix_wrong_angles(lines_hp, shift_bits: int = 6, roundabout=None,
                     max_pass: int = MAX_PASS):
    """``lines_hp``: list of (lat_hp, lon_hp) int arrays (hp = map units
    << shift_bits). ``roundabout``: optional per-line bool flags.
    Returns list of (lat_mu, lon_mu) ROUNDED map-unit lines with zigzag
    artifacts repaired. Shared coordinates move consistently across
    every line through them; only unshared interior points may be
    removed."""
    scale = 1 << shift_bits
    half = scale // 2
    if roundabout is None:
        roundabout = [False] * len(lines_hp)

    def rnd_pt(p):
        return ((p[0] + half) >> shift_bits, (p[1] + half) >> shift_bits)

    # mutable per-line point lists (removals rewrite these)
    lines = [
        list(zip(map(int, la), map(int, lo))) for la, lo in lines_hp
    ]
    use: dict[tuple[int, int], int] = {}
    for pts in lines:
        for p in pts:
            use[p] = use.get(p, 0) + 1

    pos: dict[tuple[int, int], tuple[int, int]] = {}
    for pts in lines:
        for p in pts:
            if p not in pos:
                pos[p] = rnd_pt(p)

    # pairs that must never merge to one position
    bad_merge: set[frozenset] = set()
    for li, pts in enumerate(lines):
        if len(pts) == 2:
            bad_merge.add(frozenset(pts))
        if roundabout[li]:
            for i in range(len(pts) - 1):
                if use.get(pts[i], 0) >= 2 and use.get(pts[i + 1], 0) >= 2:
                    bad_merge.add(frozenset((pts[i], pts[i + 1])))
    no_remove = {
        p for li, pts in enumerate(lines) if roundabout[li] for p in pts
    }

    def adjacency():
        adj: dict[tuple[int, int], list[tuple[int, int]]] = {}
        for pts in lines:
            for i, p in enumerate(pts):
                if i:
                    adj.setdefault(p, []).append(pts[i - 1])
                if i + 1 < len(pts):
                    adj.setdefault(p, []).append(pts[i + 1])
        return adj

    def point_err(p, cand, adj) -> float:
        err = 0.0
        for q in adj.get(p, ()):
            qp = pos[q]
            if qp == cand:
                err += (
                    np.inf if frozenset((p, q)) in bad_merge
                    else _COLLAPSE_PENALTY
                )
                continue
            err += float(
                _angle_err(_bear(p, q), _bear(cand, qp))
            )
        return err

    for _pass in range(1, max_pass):
        adj = adjacency()
        bad = [
            p for p in adj
            if point_err(p, pos[p], adj) > MAX_BEARING_ERROR_HALF * max(
                1, len(adj[p])
            )
        ]
        if not bad:
            break
        changed = False
        # move attempts, deterministic order
        for p in sorted(bad):
            base = rnd_pt(p)
            cur = pos[p]
            best, best_err = cur, point_err(p, cur, adj)
            for dy, dx in ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)):
                cand = (base[0] + dy, base[1] + dx)
                if cand == cur:
                    continue
                err = point_err(p, cand, adj)
                if err < best_err - 1e-9:
                    best, best_err = cand, err
            if best != cur:
                pos[p] = best
                changed = True
        if changed:
            continue
        # no move helped: removal pass on still-bad, unshared,
        # non-roundabout interior points
        for li, pts in enumerate(lines):
            i = 1
            while i < len(pts) - 1:
                p = pts[i]
                if (
                    use.get(p, 0) > 1
                    or p in no_remove
                    or point_err(p, pos[p], adj) <= MAX_BEARING_ERROR_HALF
                    * max(1, len(adj.get(p, ())))
                ):
                    i += 1
                    continue
                prev_p, next_p = pts[i - 1], pts[i + 1]
                err_here = max(
                    float(_angle_err(_bear(prev_p, p),
                                     _bear(pos[prev_p], pos[p]))),
                    float(_angle_err(_bear(p, next_p),
                                     _bear(pos[p], pos[next_p]))),
                )
                if err_here <= MAX_BEARING_ERROR_DEG:
                    i += 1
                    continue
                err_skip = (
                    float(_angle_err(_bear(prev_p, next_p),
                                     _bear(pos[prev_p], pos[next_p])))
                    if pos[prev_p] != pos[next_p] else np.inf
                )
                if err_skip < err_here:
                    del pts[i]
                    use[p] -= 1
                    changed = True
                else:
                    i += 1
        if not changed:
            break

    # spike / overlap extra pass (``WrongAngleFixer.java:730-734``
    # extra remove in the obsolete-points walk — runs for every way,
    # not only bearing-bad ones; ``:996-1009`` extra move): an interior
    # point whose two neighbours round to the SAME Garmin position
    # forms a zero-width spike — remove it when unshared, else collapse
    # it onto the duplicated neighbour position unless that pair is a
    # bad-merge candidate. Collapses can expose new spikes: fixpoint.
    for _ in range(MAX_PASS):
        changed = False
        for li, pts in enumerate(lines):
            i = 1
            while i < len(pts) - 1:
                p = pts[i]
                prev_p, next_p = pts[i - 1], pts[i + 1]
                if pos[prev_p] != pos[next_p] or pos[p] == pos[prev_p]:
                    i += 1
                    continue
                if use.get(p, 0) <= 1 and p not in no_remove:
                    del pts[i]
                    use[p] -= 1
                    changed = True
                    continue
                if (
                    frozenset((p, prev_p)) not in bad_merge
                    and frozenset((p, next_p)) not in bad_merge
                    and p not in no_remove
                    and pos[prev_p] in _alt_positions(p, pos[p], shift_bits)
                ):
                    # the reference only moves the centre when the
                    # duplicated position is among its ALTERNATIVE rounded
                    # positions (``WrongAngleFixer.java:1000-1008`` →
                    # ``Coord.getAlternativePositions``): a long shared
                    # spike keeps its tip instead of being relocated
                    # arbitrarily far
                    pos[p] = pos[prev_p]
                    changed = True
                i += 1
        if not changed:
            break

    out = []
    for pts in lines:
        rla, rlo = [], []
        for p in pts:
            m = pos[p]
            if rla and (rla[-1], rlo[-1]) == m:
                continue  # consecutive duplicates after rounding/moving
            rla.append(m[0])
            rlo.append(m[1])
        out.append(
            (np.asarray(rla, np.int64), np.asarray(rlo, np.int64))
        )
    return out
