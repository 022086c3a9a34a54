"""Integer bounding-box ``Area`` with resolution-aligned splitting.

Mirrors the reference's ``imgfmt/app/Area.java``:

- bounds are inclusive integer map units ``(min_lat, min_lon, max_lat,
  max_lon)``;
- ``split(nx, ny, shift)`` cuts into a grid whose interior boundaries are
  rounded to multiples of ``2**shift`` (``Area.java:171-224`` and
  ``roundPof2``);
- ``contains`` uses hp coordinates and is boundary-inclusive
  (``Area.java:238-246``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .coords import DELTA_SHIFT


def round_pof2(val: int, shift: int) -> int:
    """Round ``val`` to the nearest multiple of ``2**shift``
    (``Area.roundPof2``)."""
    if shift <= 0:
        return val
    half = 1 << (shift - 1)
    return ((val + half) >> shift) << shift


@dataclass(frozen=True)
class Area:
    """Inclusive integer bbox in 24-bit map units (lat/lon order as in the
    reference: ``Area(minLat, minLong, maxLat, maxLong)``)."""

    min_lat: int
    min_lon: int
    max_lat: int
    max_lon: int

    @property
    def width(self) -> int:
        return self.max_lon - self.min_lon

    @property
    def height(self) -> int:
        return self.max_lat - self.min_lat

    @property
    def max_dimension(self) -> int:
        return max(self.width, self.height)

    def is_empty(self) -> bool:
        return self.width <= 0 or self.height <= 0

    def center(self) -> tuple[int, int]:
        return ((self.min_lat + self.max_lat) // 2, (self.min_lon + self.max_lon) // 2)

    def contains_mu(self, lat_mu: int, lon_mu: int) -> bool:
        return (
            self.min_lat <= lat_mu <= self.max_lat
            and self.min_lon <= lon_mu <= self.max_lon
        )

    def contains_hp(self, lat_hp, lon_hp):
        """Vectorized boundary-inclusive containment on hp coords
        (``Area.contains``, ``Area.java:238-246``)."""
        lat_hp = np.asarray(lat_hp, dtype=np.int64)
        lon_hp = np.asarray(lon_hp, dtype=np.int64)
        return (
            (lat_hp >= (self.min_lat << DELTA_SHIFT))
            & (lat_hp <= (self.max_lat << DELTA_SHIFT))
            & (lon_hp >= (self.min_lon << DELTA_SHIFT))
            & (lon_hp <= (self.max_lon << DELTA_SHIFT))
        )

    def hp_bounds(self) -> tuple[int, int, int, int]:
        return (
            self.min_lat << DELTA_SHIFT,
            self.min_lon << DELTA_SHIFT,
            self.max_lat << DELTA_SHIFT,
            self.max_lon << DELTA_SHIFT,
        )

    def intersects(self, other: "Area") -> bool:
        return not (
            other.min_lon > self.max_lon
            or other.max_lon < self.min_lon
            or other.min_lat > self.max_lat
            or other.max_lat < self.min_lat
        )

    def split(self, xsplit: int, ysplit: int, shift: int) -> list["Area"] | None:
        """Split into ``xsplit * ysplit`` sub-areas with interior cuts
        rounded to ``2**shift`` (``Area.java:171-224``).

        Returns ``None`` when rounding collapses a requested half-split (the
        caller then treats the area as unsplittable, like
        ``MapSplitter.addAreasToList``).
        """
        areas: list[Area] = []
        xstart = self.min_lon
        for x in range(xsplit):
            if x == xsplit - 1:
                xend = self.max_lon
            else:
                xend = round_pof2(
                    xstart + (self.max_lon - xstart) // (xsplit - x), shift
                )
            ystart = self.min_lat
            for y in range(ysplit):
                if y == ysplit - 1:
                    yend = self.max_lat
                else:
                    yend = round_pof2(
                        ystart + (self.max_lat - ystart) // (ysplit - y), shift
                    )
                if xstart < xend and ystart < yend:
                    areas.append(Area(ystart, xstart, yend, xend))
                ystart = yend
            xstart = xend
        if len(areas) == xsplit * ysplit:
            return areas
        if len(areas) <= 1:
            return None
        raise ValueError(f"Area split shift align problems: {self} {xsplit}x{ysplit}")
