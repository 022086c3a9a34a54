"""Split-tree tile grid: cell encoding + vectorized assignment.

Mirrors the reference's subdivision machinery:

- ``MapSplitter.splitMaxSize`` (``build/MapSplitter.java:222-252``): the root
  is cut into an ``nx × ny`` grid so no division exceeds
  ``MAX_DIVISION_SIZE`` shifted map units;
- ``MapArea.split`` + ``pickArea`` (``build/MapArea.java:223-338,770-800``):
  features land in the sub-area containing their *center*; for lines/shapes
  the center is the map-unit bbox midpoint (``MapLine.getLocation``,
  ``general/MapLine.java:140-142``), computed with Java truncating division;
  the sub-area index is ``(coord_hp - base_hp) / d_hp`` (truncating), using
  the first sub-area's extent as the divisor;
- ``Area.split`` alignment: interior cuts rounded to ``2**shift``
  (``imgfmt/app/Area.java:171-224``).

The tree is a small driver-side structure (one node per subdivision);
assignment of millions of features is a fully vectorized level-by-level
walk, suitable for ``map_batches`` with the tree broadcast once.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .geom.area import Area
from .geom.coords import DELTA_SHIFT


def java_idiv(a, b):
    """Java integer division: truncates toward zero (numpy ``//`` floors)."""
    a = np.asarray(a, dtype=np.int64)
    q = np.abs(a) // np.abs(b)
    return np.where((a < 0) != (b < 0), -q, q)


def feature_centers(kind, lat_min_mu, lat_max_mu, lon_min_mu, lon_max_mu):
    """Center (lat_hp, lon_hp) per feature.

    Points (kind 0) use their own location (min==max); lines/shapes use the
    map-unit bbox midpoint with Java truncating division then shift to hp
    (``MapLine.getLocation`` / ``pickArea``).
    """
    lat_mid = java_idiv(
        np.asarray(lat_min_mu, np.int64) + np.asarray(lat_max_mu, np.int64), 2
    )
    lon_mid = java_idiv(
        np.asarray(lon_min_mu, np.int64) + np.asarray(lon_max_mu, np.int64), 2
    )
    return lat_mid << DELTA_SHIFT, lon_mid << DELTA_SHIFT


@dataclass
class SplitTree:
    """Driver-side subdivision tree with numpy columns per node.

    Node 0 is the root. Internal nodes carry the grid parameters used by
    ``pickArea``; leaves have ``child_off == -1``. All geometry in hp units
    except ``bounds`` (map units, like the reference's ``Area``).
    """

    shift: int
    bounds: list[Area] = field(default_factory=list)  # per node, map units
    parent: list[int] = field(default_factory=list)
    # grid-split parameters (valid for internal nodes)
    nx: list[int] = field(default_factory=list)
    ny: list[int] = field(default_factory=list)
    xbase: list[int] = field(default_factory=list)  # hp
    ybase: list[int] = field(default_factory=list)  # hp
    dx: list[int] = field(default_factory=list)  # hp extent of first column
    dy: list[int] = field(default_factory=list)  # hp extent of first row
    child_off: list[int] = field(default_factory=list)  # -1 => leaf

    # --- construction -----------------------------------------------------
    @classmethod
    def root(cls, bounds: Area, shift: int) -> "SplitTree":
        t = cls(shift=shift)
        t._add_node(bounds, parent=-1)
        return t

    def _add_node(self, bounds: Area, parent: int) -> int:
        self.bounds.append(bounds)
        self.parent.append(parent)
        for lst in (self.nx, self.ny):
            lst.append(1)
        for lst in (self.xbase, self.ybase, self.dx, self.dy):
            lst.append(0)
        self.child_off.append(-1)
        return len(self.bounds) - 1

    def n_nodes(self) -> int:
        return len(self.bounds)

    def is_leaf(self, node: int) -> bool:
        return self.child_off[node] == -1

    def leaves(self) -> list[int]:
        return [i for i in range(self.n_nodes()) if self.child_off[i] == -1]

    def split_node(self, node: int, nx: int, ny: int) -> bool:
        """Split a leaf into an nx×ny grid (``MapArea.split`` semantics).
        Returns False when ``Area.split`` can't honour the split (rounding
        collapse), leaving the node a leaf."""
        assert self.is_leaf(node)
        areas = self.bounds[node].split(nx, ny, self.shift)
        if areas is None:
            return False
        # Area.split emits x-major, y-minor: index = x*ny + y (pickArea)
        off = self.n_nodes()
        for a in areas:
            self._add_node(a, parent=node)
        self.nx[node] = nx
        self.ny[node] = ny
        a0 = areas[0]
        self.xbase[node] = a0.min_lon << DELTA_SHIFT
        self.ybase[node] = a0.min_lat << DELTA_SHIFT
        self.dx[node] = a0.width << DELTA_SHIFT
        self.dy[node] = a0.height << DELTA_SHIFT
        self.child_off[node] = off
        return True

    def split_max_size_leaf(self, node: int,
                            max_division_size: int = 0x7FFF) -> None:
        """Grid-split one leaf so no division exceeds
        ``MAX_DIVISION_SIZE`` shifted units (``MapSplitter.splitMaxSize``
        applied to an arbitrary area — used per parent area when a finer
        zoom level continues a coarser tree)."""
        b = self.bounds[node]
        width = b.width >> self.shift
        height = b.height >> self.shift
        xsplit = width // max_division_size + 1 if width > max_division_size else 1
        ysplit = height // max_division_size + 1 if height > max_division_size else 1
        if xsplit > 1 or ysplit > 1:
            self.split_node(node, xsplit, ysplit)

    def split_max_size(self, max_division_size: int = 0x7FFF) -> None:
        """Initial root grid (``MapSplitter.splitMaxSize`` on the root)."""
        self.split_max_size_leaf(0, max_division_size)

    def copy_with_shift(self, shift: int) -> "SplitTree":
        """Structural deep copy adopting a (finer) alignment shift — the
        starting point for continuing refinement at the next zoom level
        (parent geometry is fixed; only future cuts use the new shift)."""
        out = SplitTree(shift=shift)
        out.bounds = list(self.bounds)
        out.parent = list(self.parent)
        out.nx = list(self.nx)
        out.ny = list(self.ny)
        out.xbase = list(self.xbase)
        out.ybase = list(self.ybase)
        out.dx = list(self.dx)
        out.dy = list(self.dy)
        out.child_off = list(self.child_off)
        return out

    def canonicalize(self, n_initial: int) -> "SplitTree":
        """Rebuild with the canonical node numbering the iterative
        ``refine`` loop produces: FIFO breadth-first — nodes processed in
        ascending id, a split node's children appended at processing time.
        ``n_initial`` = node count after root + ``split_max_size`` (those
        ids are construction-identical). Needed because tile ids are dense
        leaf ranks over node order; the round-based recursion allocates
        depth-first and must renumber to match the oracle."""
        out = SplitTree(shift=self.shift)
        out._add_node(self.bounds[0], parent=-1)
        if n_initial > 1:
            out.split_node(0, self.nx[0], self.ny[0])
        assert out.n_nodes() == n_initial
        old_of_new = list(range(n_initial))
        i = 0
        while i < out.n_nodes():
            o = old_of_new[i]
            # out.is_leaf guards the initial grid: root + its grid children
            # were already constructed above
            if self.child_off[o] != -1 and out.is_leaf(i):
                ok = out.split_node(i, self.nx[o], self.ny[o])
                assert ok
                off = self.child_off[o]
                old_of_new.extend(
                    off + k for k in range(self.nx[o] * self.ny[o])
                )
            i += 1
        return out

    # --- compact arrays for broadcast ------------------------------------
    def pack(self) -> dict[str, np.ndarray]:
        return {
            "nx": np.asarray(self.nx, np.int64),
            "ny": np.asarray(self.ny, np.int64),
            "xbase": np.asarray(self.xbase, np.int64),
            "ybase": np.asarray(self.ybase, np.int64),
            "dx": np.asarray(self.dx, np.int64),
            "dy": np.asarray(self.dy, np.int64),
            "child_off": np.asarray(self.child_off, np.int64),
        }


def assign_nodes(
    packed: dict[str, np.ndarray], lat_hp, lon_hp, start=None
) -> np.ndarray:
    """Vectorized tree walk: leaf node id per feature center.

    Each level: ``cell = clamp((x - xbase)/dx, 0, nx-1)`` (Java truncating
    division, ``MapArea.pickArea``), child id = ``child_off + xcell*ny +
    ycell``. Iterates to the tree depth; O(depth) vectorized passes.

    ``start``: optional previous assignment (node id per feature) to resume
    the walk from — features whose node is still a leaf cost nothing
    (incremental re-assignment during the refinement loop).
    """
    lat = np.asarray(lat_hp, dtype=np.int64)
    lon = np.asarray(lon_hp, dtype=np.int64)
    if start is not None:
        assign = np.asarray(start, dtype=np.int64).copy()
    else:
        assign = np.zeros(len(lat), dtype=np.int64)
    child_off = packed["child_off"]
    while True:
        off = child_off[assign]
        active = off >= 0
        if not active.any():
            return assign
        a = assign[active]
        la, lo = lat[active], lon[active]
        nx, ny = packed["nx"][a], packed["ny"][a]
        # plain floor-division is safe here despite pickArea's Java trunc
        # semantics: divisors are positive, and for a negative numerator both
        # floor and trunc quotients are < 0 and get clipped to 0 identically
        xcell = np.clip((lo - packed["xbase"][a]) // packed["dx"][a], 0, nx - 1)
        ycell = np.clip((la - packed["ybase"][a]) // packed["dy"][a], 0, ny - 1)
        assign[active] = off[active] + xcell * ny + ycell
