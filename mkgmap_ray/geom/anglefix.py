"""Rounding-artifact repair (``osmstyle/WrongAngleFixer.java`` subset).

Rounding high-precision coordinates to map units (<2 m grid) can turn an
almost-straight line into a zigzag when adjacent points round in
opposite directions; the reference fixes these by MOVING points to a
better rounded position or REMOVING them, coordinating through shared
``Coord`` identity so connected roads stay connected
(``WrongAngleFixer`` class doc; MAX_BEARING_ERROR = 15°).

Engine subset, group-local per tile:

- decisions are made PER COORDINATE (the hp (lat, lon) key is the
  engine's replacement for Coord object identity, SURVEY.md §7.3), so a
  move applies consistently to every line sharing the point;
- move: each coordinate's rounded position may shift to one of the four
  neighbor grid positions if that reduces the summed bearing error of
  all adjacent segments (across all lines through it);
- remove: an interior, unshared point whose rounded angle error exceeds
  the tolerance and whose removal keeps the line within tolerance is
  dropped.

Deliberately out of scope vs the reference: the iterative multi-pass
re-check and the special casing for roundabouts / overlap detection.
"""

from __future__ import annotations

import numpy as np

MAX_BEARING_ERROR_DEG = 15.0


def _bearings(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Planar segment bearings in degrees (n-1 values)."""
    return np.degrees(
        np.arctan2(np.diff(lon).astype(float), np.diff(lat).astype(float))
    )


def _angle_err(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    d = np.abs(a - b) % 360.0
    return np.minimum(d, 360.0 - d)


def fix_wrong_angles(lines_hp, shift_bits: int = 6):
    """``lines_hp``: list of (lat_hp, lon_hp) int arrays (hp = map units
    << shift_bits). Returns list of (lat_mu, lon_mu) ROUNDED map-unit
    lines with zigzag artifacts repaired. Shared coordinates move
    consistently across every line through them; only unshared interior
    points may be removed."""
    scale = 1 << shift_bits

    def rnd(v):
        return (np.asarray(v, np.int64) + scale // 2) >> shift_bits

    # coordinate usage across all lines
    use: dict[tuple[int, int], int] = {}
    for la, lo in lines_hp:
        for p in zip(map(int, la), map(int, lo)):
            use[p] = use.get(p, 0) + 1

    # candidate rounded position per unique hp coordinate: default plus
    # 4 neighbors; choose the one minimizing summed bearing error of all
    # adjacent hp segments (bearing target = true hp bearing)
    move: dict[tuple[int, int], tuple[int, int]] = {}
    adj: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for la, lo in lines_hp:
        pts = list(zip(map(int, la), map(int, lo)))
        for i, p in enumerate(pts):
            for q in ([pts[i - 1]] if i else []) + (
                [pts[i + 1]] if i + 1 < len(pts) else []
            ):
                adj.setdefault(p, []).append(q)

    for p, neighbors in adj.items():
        base = (int(rnd(np.asarray([p[0]]))[0]), int(rnd(np.asarray([p[1]]))[0]))
        best = base
        best_err = None
        for dy, dx in ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)):
            cand = (base[0] + dy, base[1] + dx)
            err = 0.0
            for q in neighbors:
                qr = (int(rnd(np.asarray([q[0]]))[0]),
                      int(rnd(np.asarray([q[1]]))[0]))
                true_b = np.degrees(
                    np.arctan2(q[1] - p[1], q[0] - p[0])
                )
                if (qr[0] - cand[0], qr[1] - cand[1]) == (0, 0):
                    err += MAX_BEARING_ERROR_DEG * 4  # collapse penalty
                    continue
                got_b = np.degrees(
                    np.arctan2(qr[1] - cand[1], qr[0] - cand[0])
                )
                err += float(_angle_err(np.asarray([true_b]),
                                        np.asarray([got_b]))[0])
            if best_err is None or err < best_err - 1e-9:
                best_err = err
                best = cand
        if best != base:
            move[p] = best

    out = []
    for la, lo in lines_hp:
        pts = list(zip(map(int, la), map(int, lo)))
        rla, rlo = [], []
        for p in pts:
            base = (int(rnd(np.asarray([p[0]]))[0]),
                    int(rnd(np.asarray([p[1]]))[0]))
            m = move.get(p, base)
            rla.append(m[0])
            rlo.append(m[1])
        # drop consecutive duplicates after rounding/moving
        keep = [0] + [
            i for i in range(1, len(rla))
            if (rla[i], rlo[i]) != (rla[i - 1], rlo[i - 1])
        ]
        rla = [rla[i] for i in keep]
        rlo = [rlo[i] for i in keep]
        kept_pts = [pts[i] for i in keep]
        # removal pass: unshared interior points whose rounded angle is
        # still badly wrong and whose removal keeps the line straight
        i = 1
        while i < len(rla) - 1:
            p = kept_pts[i]
            if use.get(p, 0) > 1:
                i += 1
                continue
            true_b = _bearings(
                np.asarray([kept_pts[i - 1][0], p[0], kept_pts[i + 1][0]]),
                np.asarray([kept_pts[i - 1][1], p[1], kept_pts[i + 1][1]]),
            )
            got_b = _bearings(
                np.asarray(rla[i - 1 : i + 2]),
                np.asarray(rlo[i - 1 : i + 2]),
            )
            err_here = float(_angle_err(true_b, got_b).max())
            if err_here <= MAX_BEARING_ERROR_DEG:
                i += 1
                continue
            # error without the point
            true_skip = np.degrees(np.arctan2(
                kept_pts[i + 1][1] - kept_pts[i - 1][1],
                kept_pts[i + 1][0] - kept_pts[i - 1][0],
            ))
            got_skip = np.degrees(np.arctan2(
                rlo[i + 1] - rlo[i - 1], rla[i + 1] - rla[i - 1]
            ))
            err_skip = float(_angle_err(
                np.asarray([true_skip]), np.asarray([got_skip])
            )[0])
            if err_skip < err_here:
                del rla[i], rlo[i], kept_pts[i]
            else:
                i += 1
        out.append(
            (np.asarray(rla, np.int64), np.asarray(rlo, np.int64))
        )
    return out
