"""Pure-numpy geometry kernel (no Ray imports).

Row-level parity with the reference's geometry operators; each module cites
the reference file whose semantics it mirrors.
"""

from .coords import (  # noqa: F401
    DELTA_SHIFT,
    HIGH_PREC_BITS,
    MAP_UNIT_BITS,
    deg_to_hp,
    deg_to_mu,
    hp_to_deg,
    hp_to_mu,
    mu_to_deg,
    mu_to_hp,
)
from .area import Area  # noqa: F401
from .clip import clip_polyline, clip_segment, sutherland_hodgman  # noqa: F401
from .simplify import douglas_peucker  # noqa: F401
from .polyfilters import (  # noqa: F401
    remove_obsolete_points,
    round_coords,
    signed_area2,
    split_long_line,
)
from .pip import point_in_polygon, points_in_polygon  # noqa: F401
